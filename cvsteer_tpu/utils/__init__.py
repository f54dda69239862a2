"""Utilities: image post-processing, config, logging, metrics, checkpoints."""

from cvsteer_tpu.utils.imageproc import (  # noqa: F401
    bgr_to_gray_f32,
    convert_scale_u8,
    normalize_minmax_u8,
)
