"""Pose recovery from an essential matrix + DLT triangulation.

Fixed-shape cheirality voting over the 4 (R, t) candidates; triangulation is
a vmapped 4x4 eigh (smallest eigenvector of A^T A), masked for invalid
correspondences.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


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


def triangulate(
    P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """DLT triangulation: points [N, 3] (euclidean) from [N, 2] normalized
    image coordinates under projections P1/P2 [3, 4]."""

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )  # [4, 4]
        _, v = jnp.linalg.eigh(A.T @ A)
        X = v[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    return jax.vmap(one)(x1, x2)


class TwoViewPose(NamedTuple):
    R: jax.Array  # [3, 3] rotation camera1 -> camera2
    t: jax.Array  # [3] unit translation
    points: jax.Array  # [N, 3] triangulated points in camera-1 frame
    cheirality: jax.Array  # [N] bool: point in front of both cameras
    num_good: jax.Array


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
