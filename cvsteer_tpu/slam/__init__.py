"""SLAM/SfM superstructure: VO, windowed Schur-complement BA, pose graph.

BASELINE configs 4-5. No reference counterpart (the reference is a filter
library); this is the new TPU-native engine layer mandated by the north
star: dense-blocked masked observation grids, fixed-shape Gauss-Newton,
Schur elimination of landmarks, and (in cvsteer_tpu.parallel) landmark-
sharded distributed BA over a device mesh.
"""

from cvsteer_tpu.slam import se3, sim3  # noqa: F401
from cvsteer_tpu.slam.ba import BAProblem, BAState, bundle_adjust  # noqa: F401
from cvsteer_tpu.slam.posegraph import (  # noqa: F401
    PoseGraph,
    Poses,
    optimize_pose_graph,
)
from cvsteer_tpu.slam.posegraph_sim3 import (  # noqa: F401
    Sim3Graph,
    optimize_pose_graph_sim3,
)
from cvsteer_tpu.slam.vo import VOConfig, init_vo, process_frame, process_image  # noqa: F401
from cvsteer_tpu.slam.vo_device import (  # noqa: F401
    DeviceVO,
    DeviceVOFleet,
    DeviceVOServer,
)
from cvsteer_tpu.slam.vo_server import VOServer  # noqa: F401
