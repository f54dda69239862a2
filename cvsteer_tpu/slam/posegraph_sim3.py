"""Sim(3) pose-graph optimization: scale-drift-aware monocular closures.

The SE(3) pose graph (slam.posegraph) cannot absorb the scale drift that
monocular VO accumulates — a loop closure whose two ends disagree in scale
gets smeared into rotation/translation error. Here each pose carries a
7th degree of freedom (its local map scale) and edges measure relative
similarities; after optimization the per-pose scales rescale the local
maps (Strasdat-style).

Solver structure mirrors slam.posegraph's lane-array design: per-edge
quantities live as lists of [E] lane arrays (slam.lie_lanes layout
contract — stacked [E, 7, 7] Jacobians and einsums over them compile to
(8, 128)-padded VPU fusions), Jacobians come from one jax.linearize of
the lane residual on the 14 tangent basis vectors, and the dense normal
matrix is assembled as one [7E, 7P] x [7E, 7P] MXU matmul (dof-major
one-hot-expanded columns) + Cholesky with LM damping. Small-P solver
(closure-time keyframe graphs).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.slam import lie_lanes as ll
from cvsteer_tpu.slam import sim3
from cvsteer_tpu.slam.sim3 import Sim3
from cvsteer_tpu.utils.precision import precise

_HP = lax.Precision.HIGHEST


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


def _residual_fn(poses: Sim3, graph: Sim3Graph):
    """Lane residual closure res(xi_i, xi_j) -> [7] list of [E] leaves.

    Tangent chart matches sim3.exp: (omega[3], v[3], sigma), left
    perturbation T <- exp(xi) o T. xi_i / xi_j are [7] lists of scalar
    leaves (shared basis direction — each edge's residual depends only on
    its own endpoints, so the shared-direction derivative IS the per-edge
    Jacobian column; see slam.posegraph._residual_fn).
    """
    P = poses.R.shape[0]
    table = jnp.concatenate(
        [poses.R.reshape(P, 9), poses.t, poses.s[:, None]], axis=1
    )  # [P, 13] — one packed row gather per endpoint
    rows_i = table[graph.i]
    rows_j = table[graph.j]
    unpack = lambda rows: (
        [[rows[:, 3 * a + b] for b in range(3)] for a in range(3)],
        [rows[:, 9 + a] for a in range(3)],
        rows[:, 12],
    )
    Ri, ti, si = unpack(rows_i)
    Rj, tj, sj = unpack(rows_j)
    Rz = ll.mat_lanes(graph.R_z)
    tz = ll.vec_lanes(graph.t_z)
    sz = graph.s_z
    # Z^{-1}: s = 1/sz, R = Rz^T, t = -(1/sz) Rz^T tz
    szi = 1.0 / sz
    Rzi = ll.transpose(Rz)
    tzi = ll.scale(-szi, ll.matvec(Rzi, tz))

    def res(xi_i, xi_j):
        # exp chart: s = e^sigma, R = exp_so3(omega), t = v (sim3.exp)
        dRi = ll.exp_so3(xi_i[:3])
        dRj = ll.exp_so3(xi_j[:3])
        dsi = jnp.exp(xi_i[6])
        dsj = jnp.exp(xi_j[6])
        # T_i' = dT o T_i: s = ds*s, R = dR R, t = ds * dR t + dv
        si_n = dsi * si
        Ri_n = ll.matmul(dRi, Ri)
        ti_n = [dsi * a + b for a, b in zip(ll.matvec(dRi, ti), xi_i[3:6])]
        sj_n = dsj * sj
        Rj_n = ll.matmul(dRj, Rj)
        tj_n = [dsj * a + b for a, b in zip(ll.matvec(dRj, tj), xi_j[3:6])]
        # T_i'^{-1}
        si_inv = 1.0 / si_n
        Ri_inv = ll.transpose(Ri_n)
        ti_inv = ll.scale(-si_inv, ll.matvec(Ri_inv, ti_n))
        # rel = T_j' o T_i'^{-1}
        s_rel = sj_n * si_inv
        R_rel = ll.matmul(Rj_n, Ri_inv)
        t_rel = ll.add(ll.scale(sj_n, ll.matvec(Rj_n, ti_inv)), tj_n)
        # err = Z^{-1} o rel
        s_e = szi * s_rel
        R_e = ll.matmul(Rzi, R_rel)
        t_e = ll.add(ll.scale(szi, ll.matvec(Rzi, t_rel)), tzi)
        # log chart: (log_so3(R), t, log(s))
        return ll.log_so3(R_e) + t_e + [jnp.log(s_e)]

    return res


def _zeros7():
    return [jnp.zeros((), jnp.float32) for _ in range(7)]


def _edge_jacobians_lanes(poses: Sim3, graph: Sim3Graph):
    """(Ji [7][7], Jj [7][7], r [7]) — all leaves [E].

    One linearize + ONE vmapped evaluation over the 14 tangent basis
    directions (see posegraph._edge_jacobians_lanes)."""
    res = _residual_fn(poses, graph)
    r, fjvp = jax.linearize(res, _zeros7(), _zeros7())
    rng14 = jnp.arange(14)
    tans_i = [(rng14 == k).astype(jnp.float32) for k in range(7)]
    tans_j = [(rng14 == 7 + k).astype(jnp.float32) for k in range(7)]
    cols = jax.vmap(fjvp)(tans_i, tans_j)  # [7 residual rows] of [14, E]
    E = graph.i.shape[0]
    bc = lambda x: jnp.broadcast_to(x, (E,))
    Ji = [[bc(cols[a][k]) for k in range(7)] for a in range(7)]
    Jj = [[bc(cols[a][7 + k]) for k in range(7)] for a in range(7)]
    return Ji, Jj, [bc(x) for x in r]


def edge_residuals(poses: Sim3, graph: Sim3Graph) -> jax.Array:
    """[E, 7] residuals."""
    res = _residual_fn(poses, graph)
    return jnp.stack(res(_zeros7(), _zeros7()), -1)


def cost(
    poses: Sim3,
    graph: Sim3Graph,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Total (optionally robustified) edge cost (see posegraph.cost)."""
    res = _residual_fn(poses, graph)
    r = res(_zeros7(), _zeros7())
    sq = sum(x * x for x in r)
    if huber_delta > 0:
        rn = jnp.sqrt(sq + 1e-20)
        if robust_kernel == "tukey":
            c = jnp.float32(3.0 * huber_delta)
            u = jnp.clip(1.0 - (rn / c) ** 2, 0.0, 1.0)
            rho = (c * c / 6.0) * (1.0 - u ** 3)
        else:
            d = jnp.float32(huber_delta)
            rho = jnp.where(rn <= d, 0.5 * sq, d * (rn - 0.5 * d))
        return jnp.sum(graph.weight * rho)
    return 0.5 * jnp.sum(graph.weight * sq)


class Sim3Stats(NamedTuple):
    cost: jax.Array
    initial_cost: jax.Array
    lambda_final: jax.Array


def _solve_dense_lanes(
    poses: Sim3,
    graph: Sim3Graph,
    lam: jax.Array,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Damped GN update dx [P, 7] (see posegraph._solve_dense_lanes)."""
    from cvsteer_tpu.slam.posegraph import _robust_weight

    P = graph.fixed.shape[0]
    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    sw = jnp.sqrt(_robust_weight(r, graph.weight, huber_delta, robust_kernel))
    Si = ll.onehot(graph.i, P)
    Sj = ll.onehot(graph.j, P)

    blocks = []
    for a in range(7):
        row = [
            Si * (Ji[a][c] * sw)[:, None] + Sj * (Jj[a][c] * sw)[:, None]
            for c in range(7)
        ]
        blocks.append(jnp.concatenate(row, axis=1))  # [E, 7P]
    G = jnp.concatenate(blocks, axis=0)  # [7E, 7P]
    rw = jnp.concatenate([r[a] * sw for a in range(7)])

    H = lax.dot_general(G, G, (((0,), (0,)), ((), ())), precision=_HP)
    b = -jnp.matmul(rw, G, precision=_HP)

    free = jnp.tile((~graph.fixed).astype(jnp.float32), 7)  # [7P], c-major
    eye = jnp.eye(7 * P, dtype=jnp.float32)
    H = H + lam * eye
    H = H * free[None, :] * free[:, None]
    H = H + jnp.diag(1.0 - free) + 1e-10 * eye
    b = b * free

    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return dx.reshape(7, P).T  # (c, p) -> [P, 7]


def _gn_step_matfree_sim3(
    poses: Sim3,
    graph: Sim3Graph,
    lam: jax.Array,
    cg_iterations: int,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Damped GN update dx [P, 7] via matrix-free Jacobi-PCG.

    The 7-dof instantiation of posegraph._pcg_core: the dense
    [7P, 7P] Cholesky path walls out at campaign pose counts (measured
    6-11 s per closure event at P~512 padded on the v5e, with a
    cubic wall beyond), while each CG iteration here is O(E * 49) work
    through one-hot MXU accumulations — the closure event stays
    subsecond at P in the thousands."""
    from cvsteer_tpu.slam.posegraph import _pcg_core, _robust_weight

    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    w = _robust_weight(r, graph.weight, huber_delta, robust_kernel)
    return _pcg_core(
        Ji, Jj, r, w, graph.i, graph.j, graph.fixed, lam, cg_iterations,
        None, dof=7,
    )


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "lam0", "huber_delta", "robust_kernel", "solver",
        "cg_iterations",
    ),
)
@precise
def optimize_pose_graph_sim3(
    poses: Sim3,
    graph: Sim3Graph,
    *,
    iterations: int = 20,
    lam0: float = 1e-6,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
    solver: str = "dense",
    cg_iterations: int = 50,
) -> Tuple[Sim3, Sim3Stats]:
    """LM optimization of the 7-dof pose graph.

    solver='dense': exact Cholesky of the [7P, 7P] system (small P);
    solver='pcg': matrix-free Jacobi-PCG (large P — see
    _gn_step_matfree_sim3). Jitted at definition — see
    posegraph.optimize_pose_graph."""
    c0 = cost(poses, graph, huber_delta, robust_kernel)
    free = (~graph.fixed).astype(jnp.float32)

    def body(_, carry):
        ps, cur, lam = carry
        if solver == "pcg":
            dx = _gn_step_matfree_sim3(
                ps, graph, lam, cg_iterations, huber_delta, robust_kernel
            ) * free[:, None]
        else:
            dx = _solve_dense_lanes(
                ps, graph, lam, huber_delta, robust_kernel
            ) * free[:, None]
        cand = sim3.compose(sim3.exp(dx), ps)
        cand_cost = cost(cand, graph, huber_delta, robust_kernel)
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
