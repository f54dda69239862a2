"""Pinhole camera intrinsics and pixel <-> normalized-ray conversions."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (no distortion model yet)."""

    fx: float
    fy: float
    cx: float
    cy: float

    @property
    def matrix(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )


def normalize_pixels(yx: jax.Array, K: Intrinsics) -> jax.Array:
    """Pixel (row, col) coordinates [..., 2] -> normalized (x, y) rays [..., 2].

    Note the axis swap: image points are stored (y, x) = (row, col) by the
    feature pipeline; camera coordinates are (x, y).
    """
    x = (yx[..., 1] - K.cx) / K.fx
    y = (yx[..., 0] - K.cy) / K.fy
    return jnp.stack([x, y], axis=-1)


def pixels_from_normalized(xy: jax.Array, K: Intrinsics) -> jax.Array:
    """Normalized (x, y) [..., 2] -> pixel (row, col) [..., 2]."""
    col = xy[..., 0] * K.fx + K.cx
    row = xy[..., 1] * K.fy + K.cy
    return jnp.stack([row, col], axis=-1)
