"""Image post-processing helpers matching the reference's output conventions.

The reference CLI/test convert float maps to 8-bit either with a fixed gain
(cv::Mat::convertTo, example/steer.cpp:95-99) or min-max normalization to
[0, 255] (cv::normalize NORM_MINMAX, example/steer.cpp:102-104,
test/test.cpp:92-95). Both use OpenCV's saturate_cast rounding =
round-half-to-even (rint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_minmax_u8(x: jax.Array, axes=None) -> jax.Array:
    """Min-max normalize to [0, 255] and round to uint8.

    ``axes``: axes over which min/max are taken (default: all — matching the
    per-image cv::normalize). For batched inputs pass the trailing image axes,
    e.g. ``axes=(-2, -1)``.
    """
    x = x.astype(jnp.float32)  # bf16 maps: normalize math stays fp32-exact
    if axes is None:
        lo = jnp.min(x)
        hi = jnp.max(x)
    else:
        lo = jnp.min(x, axis=axes, keepdims=True)
        hi = jnp.max(x, axis=axes, keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, jnp.finfo(x.dtype).tiny)
    y = (x - lo) * scale
    return jnp.clip(jnp.rint(y), 0, 255).astype(jnp.uint8)


def convert_scale_u8(x: jax.Array, gain: float) -> jax.Array:
    """Fixed-gain conversion to uint8 with saturation (cv::Mat::convertTo)."""
    return jnp.clip(jnp.rint(x.astype(jnp.float32) * gain), 0, 255).astype(jnp.uint8)


def bgr_to_gray_f32(image_u8: jax.Array) -> jax.Array:
    """BGR uint8 [..., H, W, 3] -> float32 grayscale [..., H, W] (0..255).

    Matches cv::cvtColor(COLOR_BGR2GRAY) coefficients (ITU-R BT.601):
    Y = 0.299 R + 0.587 G + 0.114 B, rounded to the nearest integer as
    OpenCV's fixed-point path does for 8-bit input (example/steer.cpp:79-82
    feeds the 8-bit gray image into Mat1f, so values are integral 0..255).
    """
    b = image_u8[..., 0].astype(jnp.float32)
    g = image_u8[..., 1].astype(jnp.float32)
    r = image_u8[..., 2].astype(jnp.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    return jnp.rint(y)
