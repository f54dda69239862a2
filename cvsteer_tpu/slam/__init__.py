"""SLAM/SfM superstructure: VO, windowed Schur-complement BA, pose graph.

BASELINE configs 4-5. No reference counterpart (the reference is a filter
library); this is the new TPU-native engine layer mandated by the north
star: dense-blocked masked observation grids, fixed-shape Gauss-Newton,
Schur elimination of landmarks, and (in cvsteer_tpu.parallel) landmark-
sharded distributed BA over a device mesh.
"""

from cvsteer_tpu.slam import se3  # noqa: F401
from cvsteer_tpu.slam.ba import BAProblem, BAState, bundle_adjust  # noqa: F401
from cvsteer_tpu.slam.posegraph import PoseGraph, optimize_pose_graph  # noqa: F401
