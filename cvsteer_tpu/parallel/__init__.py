"""Device meshes, sharding, and halo exchange for multi-chip execution.

The reference's only parallelism is a host thread pool over images
(cv::parallel_for_, example/steer.cpp:169). The TPU-native equivalents here
(SURVEY.md section 2.3):

- data parallelism: the image batch sharded over a ``data`` mesh axis;
- spatial/sequence parallelism: image rows sharded over a ``space`` mesh
  axis with ring halo exchange (jax.lax.ppermute over ICI) supplying the
  (2*width+1)-tap convolution overlap;
- collectives are emitted by shard_map/pjit — no hand-written transport.
"""

from cvsteer_tpu.parallel.mesh import make_mesh  # noqa: F401
from cvsteer_tpu.parallel.halo import halo_exchange_rows  # noqa: F401
from cvsteer_tpu.parallel.frontend_sharded import (  # noqa: F401
    shard_batch,
    sharded_filter_bank,
    sharded_g2_maps,
    sharded_g4_maps,
)
from cvsteer_tpu.parallel.features_sharded import (  # noqa: F401
    sharded_extract_features,
)
from cvsteer_tpu.parallel.ba_sharded import bundle_adjust_sharded  # noqa: F401
from cvsteer_tpu.parallel.posegraph_sharded import optimize_pose_graph_sharded  # noqa: F401
