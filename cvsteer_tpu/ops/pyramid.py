"""Gaussian image pyramids (batched, static-shaped per level).

The reference has no pyramid; BASELINE config 2 mandates a 5-level Gaussian
pyramid under the steerable front-end. Downsampling follows the classical
cv2.pyrDown recipe: 5-tap binomial blur [1,4,6,4,1]/16 separably with
REFLECT_101 borders, then decimation by 2 keeping even indices — so CPU
implementations agree with us pixel-for-pixel.

A pyramid is a tuple of arrays (one static shape per level); batched inputs
pyramid each image in lockstep. Level l has shape ceil(H / 2^l) x ceil(W / 2^l).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.ops.sepconv import filter_bank_xla

_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def blur5(image: jax.Array) -> jax.Array:
    """Separable 5-tap binomial blur with REFLECT_101 borders.

    On TPU this routes through the Pallas separable-bank kernel: XLA lowers
    the equivalent 1-D conv_general_dilated into a T(1,128)-layout
    convolution fusion measured at ~2 ms per 480x640 frame (~50x slower
    than the hand-written kernel), which made the pyramid the dominant cost
    of the whole feature front-end."""
    taps = _BINOMIAL5.reshape(1, -1)
    if jax.default_backend() == "tpu":
        from cvsteer_tpu.ops.pallas_frontend import filter_bank_pallas

        return filter_bank_pallas(image, taps, taps)[..., 0, :, :]
    return filter_bank_xla(image, taps, taps)[..., 0, :, :]


def pyr_down(image: jax.Array) -> jax.Array:
    """One pyramid-down step: blur then keep even rows/cols (cv2.pyrDown).

    On TPU, aligned shapes take the fused blur+decimate Pallas kernel
    (REFLECT_101 baked into stride-2 banded matmul matrices — no HBM
    reflect-pad, no strided-slice layout pass; ~6x less device time at
    480x640); other shapes keep the separable bank + strided slice.
    """
    if jax.default_backend() == "tpu":
        from cvsteer_tpu.ops.pallas_frontend import pyr_down_pallas

        out = pyr_down_pallas(image)
        if out is not None:
            return out
    return blur5(image)[..., ::2, ::2]


def gaussian_pyramid(image: jax.Array, levels: int = 5) -> Tuple[jax.Array, ...]:
    """``levels`` images, level 0 being the input: [..., H/2^l, W/2^l]."""
    out = [image]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return tuple(out)


def level_shapes(h: int, w: int, levels: int) -> Sequence[Tuple[int, int]]:
    """Static (H, W) per level, matching ``gaussian_pyramid`` (ceil halving)."""
    shapes = [(h, w)]
    for _ in range(levels - 1):
        h, w = -(-h // 2), -(-w // 2)
        shapes.append((h, w))
    return shapes
