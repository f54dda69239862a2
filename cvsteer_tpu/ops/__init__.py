"""TPU compute primitives: separable bank convolution, pyramids, NMS."""

from cvsteer_tpu.ops.sepconv import (  # noqa: F401
    filter_bank_shifts,
    filter_bank_xla,
    reflect_pad_2d,
)
from cvsteer_tpu.ops.pyramid import gaussian_pyramid, pyr_down  # noqa: F401
from cvsteer_tpu.ops.interp import bilinear_sample  # noqa: F401
