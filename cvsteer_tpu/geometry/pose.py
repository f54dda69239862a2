"""Pose recovery from an essential matrix + DLT triangulation.

Fixed-shape cheirality voting over the 4 (R, t) candidates; triangulation
is closed-form inhomogeneous DLT (3x3 normal equations via the adjugate),
masked for invalid correspondences.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from cvsteer_tpu.utils.precision import precise


@precise
def decompose_essential(E: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """E -> (R1, R2, t) with ||t|| = 1; candidates are (R1|R2) x (+-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = U[:, 2]
    del d
    return R1, R2, t


def _projection(R: jax.Array, t: jax.Array) -> jax.Array:
    """[3, 4] projection for normalized cameras: x = [R | t] X."""
    return jnp.concatenate([R, t[:, None]], axis=1)


@precise
def triangulate(
    P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """DLT triangulation: points [N, 3] (euclidean) from [N, 2] normalized
    image coordinates under projections P1/P2 [3, 4].

    Inhomogeneous DLT, solved in closed form: the 4 DLT rows give the
    least-squares system ``A[:, :3] X = -A[:, 3]`` (homogeneous w fixed
    to 1), whose 3x3 normal equations invert via the adjugate — pure VPU
    algebra. The earlier homogeneous form (smallest eigenvector of A^T A)
    lowered to a vmapped 4x4 eigh custom call that alone cost 10 ms/tick
    in the 16-stream VO fleet (traced 2026-08-18). Points near infinity
    (true w ~ 0) come out with huge |X| and are culled by the callers'
    bounds/cheirality gates, exactly as the eigh form's w-division was.
    """
    # DLT rows [N, 4, 4]: two per view.
    rows = jnp.stack(
        [
            x1[..., 0:1] * P1[2] - P1[0],
            x1[..., 1:2] * P1[2] - P1[1],
            x2[..., 0:1] * P2[2] - P2[0],
            x2[..., 1:2] * P2[2] - P2[1],
        ],
        axis=-2,
    )
    B = rows[..., :3]  # [N, 4, 3]
    c = rows[..., 3]  # [N, 4]
    # HIGHEST precision: the TPU default routes these contractions through
    # the MXU as bf16, which visibly degrades triangulated points (fleet
    # ATE 0.06 -> 0.21 measured when left at default)
    hp = jax.lax.Precision.HIGHEST
    M = jnp.einsum("...ij,...ik->...jk", B, B, precision=hp)  # [N, 3, 3]
    r = -jnp.einsum("...ij,...i->...j", B, c, precision=hp)  # [N, 3]
    a, b_, cc = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    e, f = M[..., 1, 1], M[..., 1, 2]
    i = M[..., 2, 2]
    A_ = e * i - f * f
    Bc = cc * f - b_ * i
    Cc = b_ * f - cc * e
    E_ = a * i - cc * cc
    F_ = cc * b_ - a * f
    I_ = a * e - b_ * b_
    det = a * A_ + b_ * Bc + cc * Cc
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    x = (A_ * r[..., 0] + Bc * r[..., 1] + Cc * r[..., 2]) * inv_det
    y = (Bc * r[..., 0] + E_ * r[..., 1] + F_ * r[..., 2]) * inv_det
    z = (Cc * r[..., 0] + F_ * r[..., 1] + I_ * r[..., 2]) * inv_det
    return jnp.stack([x, y, z], axis=-1)


class TwoViewPose(NamedTuple):
    R: jax.Array  # [3, 3] rotation camera1 -> camera2
    t: jax.Array  # [3] unit translation
    points: jax.Array  # [N, 3] triangulated points in camera-1 frame
    cheirality: jax.Array  # [N] bool: point in front of both cameras
    num_good: jax.Array


@precise
def recover_pose(
    E: jax.Array, x1: jax.Array, x2: jax.Array, valid: jax.Array
) -> TwoViewPose:
    """Select the (R, t) candidate with the best cheirality vote.

    x1/x2 [N, 2] normalized coords, valid [N] mask (e.g. RANSAC inliers).
    """
    R1, R2, t = decompose_essential(E)
    P1 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], 1)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    def score(Rt):
        R, tt = Rt
        X = triangulate(P1, _projection(R, tt), x1, x2)  # camera-1 frame
        z1 = X[:, 2]
        z2 = (X @ R.T + tt)[:, 2]
        good = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(good), X, good

    scores, Xs, goods = [], [], []
    for c in cands:
        s, X, g = score(c)
        scores.append(s)
        Xs.append(X)
        goods.append(g)
    scores = jnp.stack(scores)
    best = jnp.argmax(scores)

    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    Xs = jnp.stack(Xs)
    goods = jnp.stack(goods)
    return TwoViewPose(
        R=Rs[best],
        t=ts[best],
        points=Xs[best],
        cheirality=goods[best],
        num_good=scores[best],
    )
