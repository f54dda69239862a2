"""Image IO and dataset loading (native C++ codecs with Python fallbacks)."""

from cvsteer_tpu.io.imageio import (  # noqa: F401
    imdecode_gray_f32,
    imread_gray_f32,
    imwrite_u8,
)
from cvsteer_tpu.io.datasets import Sequence, open_sequence  # noqa: F401
