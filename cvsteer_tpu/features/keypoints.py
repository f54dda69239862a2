"""Keypoint detection: NMS on the dominant-orientation strength map.

The reference computes a per-pixel orientation strength
(m_orientationStrength, cvsteer/SteerableFiltersG2.cpp:97-99) but never
extracts points from it. Here it becomes a detector (BASELINE config 2):
local-maximum NMS + threshold + fixed-size top-N selection, with subpixel
quadratic refinement — all static shapes, masked where fewer than N
keypoints exist.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class Keypoints(NamedTuple):
    """A fixed-capacity keypoint set (invalid slots masked).

    yx:     [N, 2] float32 subpixel (row, col) coordinates.
    score:  [N] detector response (orientation strength).
    theta:  [N] dominant orientation at the keypoint, (-pi/2, pi/2].
    valid:  [N] bool mask.
    """

    yx: jax.Array
    score: jax.Array
    theta: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.yx.shape[-2]


def _maxpool_same(x: jax.Array, k: int) -> jax.Array:
    """k x k max pool, stride 1, -inf padded, over trailing two axes."""
    r = k // 2
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)],
    )


def _subpixel_offset(s: jax.Array, ym: jax.Array, y0: jax.Array, yp: jax.Array):
    """1-D quadratic peak offset in [-0.5, 0.5] from neighbor samples."""
    denom = ym - 2.0 * y0 + yp
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym - yp) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


def detect_keypoints(
    strength: jax.Array,
    theta: jax.Array,
    *,
    max_keypoints: int = 512,
    nms_radius: int = 2,
    threshold: float = 0.0,
    border: Optional[int] = None,
) -> Keypoints:
    """Detect up to ``max_keypoints`` local maxima of ``strength [H, W]``.

    ``theta [H, W]`` supplies each keypoint's dominant orientation. Batched
    inputs: vmap this function. ``border`` (default: nms_radius + 1) masks a
    frame around the image where the filter support is incomplete.
    """
    H, W = strength.shape
    k = 2 * nms_radius + 1
    b = (nms_radius + 1) if border is None else border

    is_max = strength >= _maxpool_same(strength, k)
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (row >= b) & (row < H - b) & (col >= b) & (col < W - b)
    mask = is_max & in_border & (strength > threshold)

    score_masked = jnp.where(mask, strength, -jnp.inf)
    flat_scores, flat_idx = lax.top_k(score_masked.reshape(-1), max_keypoints)
    valid = jnp.isfinite(flat_scores)
    yi = flat_idx // W
    xi = flat_idx % W

    # Subpixel refinement: separable quadratic fit around the integer peak.
    yc = jnp.clip(yi, 1, H - 2)
    xc = jnp.clip(xi, 1, W - 2)
    s = strength
    s0 = s[yc, xc]
    dy = _subpixel_offset(s, s[yc - 1, xc], s0, s[yc + 1, xc])
    dx = _subpixel_offset(s, s[yc, xc - 1], s0, s[yc, xc + 1])

    yx = jnp.stack(
        [yi.astype(jnp.float32) + dy, xi.astype(jnp.float32) + dx], axis=-1
    )
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, flat_scores, 0.0),
        theta=jnp.where(valid, theta[yi, xi], 0.0),
        valid=valid,
    )
