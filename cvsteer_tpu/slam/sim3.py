"""Sim(3) group operations: similarity transforms (s, R, t).

Monocular SLAM drifts in scale as well as pose; loop closures therefore
constrain a 7-dof similarity, not a rigid motion (Strasdat et al.,
"Scale-drift aware large scale monocular SLAM"). A Sim(3) element acts as
x -> s * R x + t; composition and inverse follow the matrix form
[[sR, t], [0, 1]]. Tangent parametrization used here: (omega[3], v[3],
sigma) with R = exp(omega), s = exp(sigma), and the translation applied
directly (first-order V-matrix omitted: the pose-graph solver only needs a
consistent local chart, and Jacobians are taken by autodiff around 0).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import se3


class Sim3(NamedTuple):
    """s [..,], R [.., 3, 3], t [.., 3] acting as x -> s R x + t."""

    s: jax.Array
    R: jax.Array
    t: jax.Array


def identity(batch_shape=()) -> Sim3:
    return Sim3(
        s=jnp.ones(batch_shape),
        R=jnp.broadcast_to(jnp.eye(3), batch_shape + (3, 3)),
        t=jnp.zeros(batch_shape + (3,)),
    )


def compose(a: Sim3, b: Sim3) -> Sim3:
    """a o b (apply b first)."""
    return Sim3(
        s=a.s * b.s,
        R=a.R @ b.R,
        t=a.s[..., None] * (a.R @ b.t[..., None])[..., 0] + a.t,
    )


def invert(a: Sim3) -> Sim3:
    Rt = jnp.swapaxes(a.R, -1, -2)
    s_inv = 1.0 / a.s
    return Sim3(
        s=s_inv,
        R=Rt,
        t=-s_inv[..., None] * (Rt @ a.t[..., None])[..., 0],
    )


def transform(a: Sim3, X: jax.Array) -> jax.Array:
    return a.s[..., None] * (a.R @ X[..., None])[..., 0] + a.t


def exp(xi: jax.Array) -> Sim3:
    """Tangent [..., 7] = (omega, v, sigma) -> Sim3 (first-order chart)."""
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    return Sim3(s=jnp.exp(sigma), R=se3.exp_so3(w), t=v)


def log(a: Sim3) -> jax.Array:
    """Sim3 -> [..., 7]; inverse of :func:`exp` on its chart."""
    return jnp.concatenate(
        [se3.log_so3(a.R), a.t, jnp.log(a.s)[..., None]], axis=-1
    )


def from_se3(R: jax.Array, t: jax.Array, s=None) -> Sim3:
    if s is None:
        s = jnp.ones(R.shape[:-2])
    return Sim3(s=jnp.asarray(s), R=R, t=t)
