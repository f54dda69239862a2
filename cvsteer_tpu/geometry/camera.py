"""Camera intrinsics, Brown-Conrady distortion, pixel <-> ray conversions.

The reference has no camera model (it filters raw images); the SLAM
superstructure needs one for real data: TUM-RGBD and KITTI imagery carries
radial/tangential lens distortion, and feeding distorted pixels to the
epipolar/BA math biases every estimate. The model here matches OpenCV's
(k1, k2, p1, p2, k3) convention so calibrations transfer verbatim;
``cv2.undistortPoints`` is the test oracle.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NO_DIST: Tuple[float, float, float, float, float] = (0.0, 0.0, 0.0, 0.0, 0.0)


class Intrinsics(NamedTuple):
    """Pinhole intrinsics + optional Brown-Conrady distortion.

    ``dist`` = (k1, k2, p1, p2, k3), OpenCV ordering; all-zero (the
    default) short-circuits to the pure pinhole model at trace time.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    dist: Tuple[float, float, float, float, float] = _NO_DIST

    @property
    def matrix(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(float(d) != 0.0 for d in self.dist)


def distort_normalized(xy: jax.Array, dist) -> jax.Array:
    """Ideal normalized (x, y) [..., 2] -> distorted normalized coords.

    OpenCV forward model: xd = x*radial + tangential_x, with
    radial = 1 + k1 r^2 + k2 r^4 + k3 r^6.
    """
    k1, k2, p1, p2, k3 = (jnp.asarray(d, xy.dtype) for d in dist)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_d: jax.Array, dist, iterations: int = 8) -> jax.Array:
    """Distorted normalized coords [..., 2] -> ideal normalized (x, y).

    Fixed-point inversion of :func:`distort_normalized` (the same scheme
    cv2.undistortPoints uses): x <- (xd - tangential(x)) / radial(x).
    With zero coefficients every iterate equals the input exactly, so the
    call is a safe no-op for undistorted cameras. ``iterations`` is
    static (jit-compatible); 8 reaches float32 round-off for typical
    consumer-lens coefficients (|k1| < 0.5).
    """
    k1, k2, p1, p2, k3 = (jnp.asarray(d, xy_d.dtype) for d in dist)
    xd, yd = xy_d[..., 0], xy_d[..., 1]
    x, y = xd, yd
    for _ in range(iterations):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y], axis=-1)


def normalize_pixels(yx: jax.Array, K: Intrinsics) -> jax.Array:
    """Pixel (row, col) coordinates [..., 2] -> ideal normalized rays [..., 2].

    Note the axis swap: image points are stored (y, x) = (row, col) by the
    feature pipeline; camera coordinates are (x, y). Applies the inverse
    distortion model when ``K.dist`` is set (static branch: zero cost for
    pinhole cameras).
    """
    x = (yx[..., 1] - K.cx) / K.fx
    y = (yx[..., 0] - K.cy) / K.fy
    xy = jnp.stack([x, y], axis=-1)
    if K.has_distortion:
        xy = undistort_normalized(xy, K.dist)
    return xy


def pixels_from_normalized(xy: jax.Array, K: Intrinsics) -> jax.Array:
    """Ideal normalized (x, y) [..., 2] -> pixel (row, col) [..., 2].

    Applies the forward distortion model when ``K.dist`` is set (the
    inverse of :func:`normalize_pixels`)."""
    if K.has_distortion:
        xy = distort_normalized(xy, K.dist)
    col = xy[..., 0] * K.fx + K.cx
    row = xy[..., 1] * K.fy + K.cy
    return jnp.stack([row, col], axis=-1)


def undistort_normalized_np(xy_d, dist, iterations: int = 8):
    """NumPy twin of :func:`undistort_normalized` for host-side paths that
    must not touch the device (e.g. slam.vo._norm_pts, which exists to
    avoid a device round-trip per frame)."""
    import numpy as np

    k1, k2, p1, p2, k3 = (float(d) for d in dist)
    xd, yd = xy_d[..., 0], xy_d[..., 1]
    x, y = xd.copy(), yd.copy()
    for _ in range(iterations):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return np.stack([x, y], -1).astype(xy_d.dtype)
