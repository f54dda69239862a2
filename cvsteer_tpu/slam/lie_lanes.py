"""Lane-layout (edge-minor) Lie-group math for the pose-graph solvers.

TPU layout contract (the same one cvsteer_tpu.slam.ba follows, see its
module docstring): arrays whose MINOR dimensions are tiny (3/6/7) get
(8, 128)-padded tiles and XLA lowers einsums over them into crawling VPU
broadcast-reduce fusions — measured ~15x slower than the equivalent
lane-parallel math for the BA normal equations. Here every per-edge
quantity therefore lives as nested Python lists over the tiny matrix
indices with the big edge axis E as the (minor) lane dimension:

- a rotation is a [3][3] list of [E] leaves;
- a translation is a [3] list of [E] leaves;
- a tangent is a [6] (or [7]) list of scalar or [E] leaves.

All functions are plain elementwise jnp ops on the leaves, so they are
jit/vmap/jvp-transparent — pose-graph Jacobians are taken by
jax.linearize through this module (cvsteer_tpu/slam/posegraph.py).

Numerics mirror cvsteer_tpu.slam.se3 exactly (same guarded closed forms,
same Taylor fallbacks) so the lane solvers agree with the stacked-layout
reference implementations to float rounding.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Mat = List[List[jax.Array]]
Vec = List[jax.Array]


# -- conversions ------------------------------------------------------------


def mat_lanes(M: jax.Array) -> Mat:
    """[E, 3, 3] -> [3][3] of [E]."""
    return [[M[:, a, b] for b in range(3)] for a in range(3)]


def vec_lanes(v: jax.Array) -> Vec:
    """[E, 3] -> [3] of [E]."""
    return [v[:, a] for a in range(3)]


def stack_mat(A: Mat) -> jax.Array:
    """[3][3] of [E] -> [E, 3, 3]."""
    return jnp.stack([jnp.stack(row, -1) for row in A], -2)


def stack_vec(v: Vec) -> jax.Array:
    return jnp.stack(v, -1)


# -- algebra ----------------------------------------------------------------


def matmul(A: Mat, B: Mat) -> Mat:
    return [
        [sum(A[a][k] * B[k][b] for k in range(3)) for b in range(3)]
        for a in range(3)
    ]


def matvec(A: Mat, v: Vec) -> Vec:
    return [sum(A[a][k] * v[k] for k in range(3)) for a in range(3)]


def transpose(A: Mat) -> Mat:
    return [[A[b][a] for b in range(3)] for a in range(3)]


def add(u: Vec, v: Vec) -> Vec:
    return [a + b for a, b in zip(u, v)]


def sub(u: Vec, v: Vec) -> Vec:
    return [a - b for a, b in zip(u, v)]


def neg(v: Vec) -> Vec:
    return [-a for a in v]


def scale(s: jax.Array, v: Vec) -> Vec:
    return [s * a for a in v]


# -- SO(3)/SE(3) ------------------------------------------------------------


def _abc(w: Sequence[jax.Array]):
    """(a, b, c) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), guarded as in
    se3._abc_coefficients (double-where so gradients stay finite at 0)."""
    th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = th2 < 1e-8
    th2_safe = jnp.where(small, 1.0, th2)
    theta = jnp.sqrt(th2_safe)
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / th2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0,
        (theta - jnp.sin(theta)) / (th2_safe * theta),
    )
    return a, b, c


def _hat(w: Sequence[jax.Array]) -> Mat:
    z = jnp.zeros_like(w[0])
    return [
        [z, -w[2], w[1]],
        [w[2], z, -w[0]],
        [-w[1], w[0], z],
    ]


def exp_so3(w: Sequence[jax.Array]) -> Mat:
    """Rodrigues on [3] leaves -> [3][3] leaves (se3.exp_so3 parity)."""
    W = _hat(w)
    W2 = matmul(W, W)
    a, b, _ = _abc(w)
    return [
        [(1.0 if i == j else 0.0) + a * W[i][j] + b * W2[i][j] for j in range(3)]
        for i in range(3)
    ]


def exp_se3(xi: Sequence[jax.Array]) -> Tuple[Mat, Vec]:
    """(omega, v) [6] leaves -> (R, t) (se3.exp_se3 parity)."""
    w, v = xi[:3], list(xi[3:])
    W = _hat(w)
    W2 = matmul(W, W)
    a, b, c = _abc(w)
    R = [
        [(1.0 if i == j else 0.0) + a * W[i][j] + b * W2[i][j] for j in range(3)]
        for i in range(3)
    ]
    V = [
        [(1.0 if i == j else 0.0) + b * W[i][j] + c * W2[i][j] for j in range(3)]
        for i in range(3)
    ]
    return R, matvec(V, v)


def log_so3(R: Mat) -> Vec:
    """[3][3] leaves -> [3] leaves (se3.log_so3 parity, incl. near-pi)."""
    wv = [
        R[2][1] - R[1][2],
        R[0][2] - R[2][0],
        R[1][0] - R[0][1],
    ]  # 2 sin(theta) * axis
    cos = jnp.clip(0.5 * (R[0][0] + R[1][1] + R[2][2] - 1.0), -1.0, 1.0)
    sin2 = 0.25 * (wv[0] * wv[0] + wv[1] * wv[1] + wv[2] * wv[2])
    small_sin = sin2 < 1e-12
    sin = jnp.sqrt(jnp.where(small_sin, 1.0, sin2))
    sin = jnp.where(small_sin, 0.0, sin)
    theta = jnp.arctan2(sin, cos)

    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small_sin, 1.0, 2.0 * sin),
    )
    w = [factor * wv[k] for k in range(3)]

    near_pi = cos < -1.0 + 1e-6
    out = []
    for k in range(3):
        axis_sq = jnp.clip((R[k][k] + 1.0) * 0.5, 0.0, 1.0)
        axis = jnp.sqrt(axis_sq)
        sgn = jnp.where(wv[k] >= 0.0, 1.0, -1.0)
        out.append(jnp.where(near_pi, axis * sgn * theta, w[k]))
    return out


# -- scatter/gather via one-hot MXU matmuls ---------------------------------


def onehot(idx: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
    """[E] int32 -> [E, num] one-hot (for MXU gather/scatter-add: a 1-D TPU
    scatter is a serial op, while accumulating through S^T x is one matmul;
    each one-hot row has exactly one nonzero so the gather direction is
    exact in any precision)."""
    return (idx[:, None] == jnp.arange(num, dtype=idx.dtype)[None, :]).astype(dtype)
