"""Sim(3) pose-graph optimization: scale-drift-aware monocular closures.

The SE(3) pose graph (slam.posegraph) cannot absorb the scale drift that
monocular VO accumulates — a loop closure whose two ends disagree in scale
gets smeared into rotation/translation error. Here each pose carries a
7th degree of freedom (its local map scale) and edges measure relative
similarities; after optimization the per-pose scales rescale the local
maps (Strasdat-style). Solver structure mirrors slam.posegraph: vmapped
autodiff edge Jacobians around the identity chart, dense assembly +
Cholesky (small P) with LM damping.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.slam import se3, sim3
from cvsteer_tpu.slam.sim3 import Sim3


class Sim3Graph(NamedTuple):
    """Masked fixed-size Sim(3) pose graph.

    i, j:    [E] edge endpoints; measurement Z_ij ~ T_j o T_i^{-1}.
    s_z:     [E] relative scales; R_z [E,3,3]; t_z [E,3].
    weight:  [E] edge weights (0 = padding).
    fixed:   [P] poses held constant (gauge: anchor pose AND scale).
    """

    i: jax.Array
    j: jax.Array
    s_z: jax.Array
    R_z: jax.Array
    t_z: jax.Array
    weight: jax.Array
    fixed: jax.Array


def _edge_residual(Ti: Sim3, Tj: Sim3, Z: Sim3) -> jax.Array:
    rel = sim3.compose(Tj, sim3.invert(Ti))
    err = sim3.compose(sim3.invert(Z), rel)
    return sim3.log(err)  # [7]


def edge_residuals(poses: Sim3, graph: Sim3Graph) -> jax.Array:
    def one(si, Ri, ti, sj, Rj, tj, sz, Rz, tz):
        return _edge_residual(Sim3(si, Ri, ti), Sim3(sj, Rj, tj), Sim3(sz, Rz, tz))

    return jax.vmap(one)(
        poses.s[graph.i], poses.R[graph.i], poses.t[graph.i],
        poses.s[graph.j], poses.R[graph.j], poses.t[graph.j],
        graph.s_z, graph.R_z, graph.t_z,
    )


def cost(poses: Sim3, graph: Sim3Graph) -> jax.Array:
    r = edge_residuals(poses, graph)
    return 0.5 * jnp.sum(graph.weight[:, None] * r * r)


def _edge_jacobians(poses: Sim3, graph: Sim3Graph):
    zeros = jnp.zeros(7, jnp.float32)

    def res_perturbed(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, sz, Rz, tz):
        Ti = sim3.compose(sim3.exp(xi_i), Sim3(si, Ri, ti))
        Tj = sim3.compose(sim3.exp(xi_j), Sim3(sj, Rj, tj))
        return _edge_residual(Ti, Tj, Sim3(sz, Rz, tz))

    def one(si, Ri, ti, sj, Rj, tj, sz, Rz, tz):
        f = lambda a, b: res_perturbed(a, b, si, Ri, ti, sj, Rj, tj, sz, Rz, tz)
        Ji = jax.jacfwd(f, argnums=0)(zeros, zeros)
        Jj = jax.jacfwd(f, argnums=1)(zeros, zeros)
        return Ji, Jj, f(zeros, zeros)

    return jax.vmap(one)(
        poses.s[graph.i], poses.R[graph.i], poses.t[graph.i],
        poses.s[graph.j], poses.R[graph.j], poses.t[graph.j],
        graph.s_z, graph.R_z, graph.t_z,
    )


class Sim3Stats(NamedTuple):
    cost: jax.Array
    initial_cost: jax.Array
    lambda_final: jax.Array


def optimize_pose_graph_sim3(
    poses: Sim3,
    graph: Sim3Graph,
    *,
    iterations: int = 20,
    lam0: float = 1e-6,
) -> Tuple[Sim3, Sim3Stats]:
    """LM optimization of the 7-dof pose graph (dense solve, small P)."""
    P = graph.fixed.shape[0]
    c0 = cost(poses, graph)
    free = (~graph.fixed).astype(jnp.float32)

    def build(ps, lam):
        Ji, Jj, r = _edge_jacobians(ps, graph)
        w = graph.weight
        H = jnp.zeros((P, 7, P, 7), jnp.float32)
        H = H.at[graph.i, :, graph.i, :].add(jnp.einsum("eai,eaj,e->eij", Ji, Ji, w, precision=lax.Precision.HIGHEST))
        H = H.at[graph.j, :, graph.j, :].add(jnp.einsum("eai,eaj,e->eij", Jj, Jj, w, precision=lax.Precision.HIGHEST))
        Hij = jnp.einsum("eai,eaj,e->eij", Ji, Jj, w, precision=lax.Precision.HIGHEST)
        H = H.at[graph.i, :, graph.j, :].add(Hij)
        H = H.at[graph.j, :, graph.i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((P, 7), jnp.float32)
        b = b.at[graph.i].add(-jnp.einsum("eai,ea,e->ei", Ji, r, w, precision=lax.Precision.HIGHEST))
        b = b.at[graph.j].add(-jnp.einsum("eai,ea,e->ei", Jj, r, w, precision=lax.Precision.HIGHEST))
        eye7 = jnp.eye(7, dtype=jnp.float32)
        H = H + jnp.einsum("pq,ij->piqj", jnp.eye(P, dtype=jnp.float32), lam * eye7, precision=lax.Precision.HIGHEST)
        H = H * free[:, None, None, None] * free[None, None, :, None]
        H = H + jnp.einsum(
            "pq,ij,p->piqj", jnp.eye(P, dtype=jnp.float32), eye7, 1.0 - free
        , precision=lax.Precision.HIGHEST)
        return H, b * free[:, None]

    def body(_, carry):
        ps, cur, lam = carry
        H, b = build(ps, lam)
        A = H.reshape(P * 7, P * 7) + 1e-10 * jnp.eye(P * 7, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b.reshape(-1), lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False).reshape(P, 7)
        dx = dx * free[:, None]
        cand = sim3.compose(sim3.exp(dx), ps)
        cand_cost = cost(cand, graph)
        accept = cand_cost < cur
        ps = jax.tree.map(lambda a, b2: jnp.where(accept, a, b2), cand, ps)
        cur = jnp.where(accept, cand_cost, cur)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 10.0), 1e-9, 1e6)
        return ps, cur, lam

    ps, cf, lam = lax.fori_loop(0, iterations, body, (poses, c0, jnp.float32(lam0)))
    return ps, Sim3Stats(cost=cf, initial_cost=c0, lambda_final=lam)


def apply_scale_correction(
    X: jax.Array, anchor_pose_old: Sim3, anchor_pose_new: Sim3
) -> jax.Array:
    """Move landmarks rigidly+scaled with their anchor's Sim3 correction:
    X' = T_new^{-1} (T_old X) — camera-frame coordinates are invariant."""
    return sim3.transform(
        sim3.compose(sim3.invert(anchor_pose_new), anchor_pose_old), X
    )
