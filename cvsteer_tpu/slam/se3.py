"""SO(3)/SE(3) Lie-group operations (batched, closed-form, jit-safe).

Rotations are [..., 3, 3] matrices; rigid transforms are (R, t) pairs acting
as x -> R x + t. Tangent vectors xi = (omega[3], v[3]) use the rotation-
first convention. All formulas use the numerically guarded closed forms
(Taylor fallbacks near theta = 0) so gradients stay finite.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def _abc_coefficients(w: jax.Array):
    """(a, b, c) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) with the
    double-where pattern so gradients are finite at t = 0."""
    th2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [..., 1, 1]
    small = th2 < 1e-8
    th2_safe = jnp.where(small, 1.0, th2)  # grads through sqrt stay finite
    theta = jnp.sqrt(th2_safe)
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / th2_safe)
    c = jnp.where(
        small, 1.0 / 6.0 - th2 / 120.0, (theta - jnp.sin(theta)) / (th2_safe * theta)
    )
    return a, b, c


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    W = hat(w)
    W2 = W @ W
    a, b, _ = _abc_coefficients(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] (angle in [0, pi]); finite gradients at 0."""
    w_vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )  # = 2 sin(theta) * axis
    cos = jnp.clip(0.5 * (jnp.trace(R, axis1=-2, axis2=-1) - 1.0), -1.0, 1.0)
    sin2 = 0.25 * jnp.sum(w_vee * w_vee, axis=-1)
    small_sin = sin2 < 1e-12
    sin = jnp.sqrt(jnp.where(small_sin, 1.0, sin2))
    sin = jnp.where(small_sin, 0.0, sin)
    theta = jnp.arctan2(sin, cos)

    # factor = theta / (2 sin theta); Taylor near 0.
    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small_sin, 1.0, 2.0 * sin),
    )
    w = factor[..., None] * w_vee

    # near pi, sin -> 0 but w_vee -> 0 too: recover axis from R + I diagonal.
    near_pi = cos < -1.0 + 1e-6
    axis_sq = jnp.clip((jnp.diagonal(R, axis1=-2, axis2=-1) + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    sgn = jnp.where(w_vee >= 0.0, 1.0, -1.0)
    w_pi = axis * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def exp_se3(xi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., 6] (omega, v) -> (R [..., 3, 3], t [..., 3])."""
    w, v = xi[..., :3], xi[..., 3:]
    W = hat(w)
    W2 = W @ W
    a, b, c = _abc_coefficients(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return R, t


def compose(Ra, ta, Rb, tb) -> Tuple[jax.Array, jax.Array]:
    """(Ra, ta) . (Rb, tb): apply b first, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def invert(R, t) -> Tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, X) -> jax.Array:
    """Apply to points X [..., 3]."""
    return (R @ X[..., None])[..., 0] + t


def rotation_geodesic(Ra, Rb) -> jax.Array:
    """Angle between rotations (radians)."""
    cos = jnp.clip(
        0.5 * (jnp.trace(jnp.swapaxes(Ra, -1, -2) @ Rb, axis1=-2, axis2=-1) - 1.0),
        -1.0,
        1.0,
    )
    return jnp.arccos(cos)
