"""Keypoints, phase descriptors, and matching on the steerable front-end.

The reference stops at edge/line maps; BASELINE configs 2-3 extend the
orientation-strength and quadrature-phase maps into a feature pipeline:
NMS keypoints on the orientation-strength map, phase-based descriptors from
the steered quadrature pair, and batched MXU matching. All fixed-size,
masked, jit/vmap-composable.
"""

from cvsteer_tpu.features.descriptors import (  # noqa: F401
    phase_descriptors,
    phase_descriptors_g4,
)
from cvsteer_tpu.features.frontend import (  # noqa: F401
    Features,
    FrontendConfig,
    extract_features,
)
from cvsteer_tpu.features.keypoints import Keypoints, detect_keypoints  # noqa: F401
from cvsteer_tpu.features.matching import Matches, match_descriptors  # noqa: F401
