"""Two-view epipolar geometry: essential matrix, RANSAC, pose, triangulation.

BASELINE config 3. No reference counterpart exists (the reference stops at
filter maps); everything here is TPU-native new code: fixed-iteration
vmapped RANSAC, masked fixed-size point sets, eigh-based minimal solvers —
no data-dependent shapes anywhere.
"""

from cvsteer_tpu.geometry.camera import Intrinsics, normalize_pixels, pixels_from_normalized  # noqa: F401
from cvsteer_tpu.geometry.epipolar import (  # noqa: F401
    eight_point_essential,
    ransac_essential,
    sampson_error,
)
from cvsteer_tpu.geometry.pose import (  # noqa: F401
    decompose_essential,
    recover_pose,
    triangulate,
)
