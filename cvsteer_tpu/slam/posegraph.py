"""Pose-graph optimization: Gauss-Newton over SE(3) with relative-pose edges.

BASELINE config 5 (single-host core; the landmark/edge-sharded multi-host
version lives in cvsteer_tpu.parallel.posegraph_sharded). Fixed-size masked
edge list, LM damping in a fori_loop, dense Cholesky (small P) or
matrix-free Jacobi-PCG (large P / edge-sharded) solvers.

TPU layout (the lane-array contract of slam.ba and slam.lie_lanes): every
per-edge quantity is a nested Python list of [E] lane arrays — the
stacked [E, 6, 6] Jacobian blocks of the first design carry (8, 128)-
padded layouts whose einsums compile to crawling VPU fusions. Edge
Jacobians come from ONE jax.linearize of the lane residual evaluated on
the 12 tangent basis vectors (shared primal, elementwise tangents);
pose reads are one packed [P, 12]-table row gather per endpoint.
Measured v5e LM-iteration wall (25 CG iters): 1028 -> 865 us at P=128 /
E=512, 5412 -> 3707 us at P=1024, 21468 -> 15625 us at P=4096 vs the
einsum design; small graphs remain kernel-launch-bound (BENCH_NOTES.md).

Pose convention matches slam.ba: T_i = (R_i, t_i), world -> camera-i.
An edge (i, j) measures Z_ij ~ T_j o T_i^{-1} (camera-i frame to camera-j).
Residual: log( Z_ij^{-1} o (T_j o T_i^{-1}) ) as a 6-vector (omega, v).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.slam import lie_lanes as ll
from cvsteer_tpu.slam import se3
from cvsteer_tpu.utils.precision import precise

_HP = lax.Precision.HIGHEST

# One-hot MXU accumulation is used while 2E*P stays below this entry count
# (~64 MB of fp32 one-hot traffic per product); larger graphs switch to the
# sorted prefix-sum segment reduction. Module-level so tests can force the
# large-graph path on small inputs.
_ONEHOT_MAX_ENTRIES = 1 << 24


class PoseGraph(NamedTuple):
    """Masked fixed-size pose graph.

    i, j:   [E] int32 edge endpoints.
    R_z:    [E, 3, 3] measured relative rotations.
    t_z:    [E, 3] measured relative translations.
    weight: [E] edge weights (0 masks a padding edge).
    fixed:  [P] bool — poses held constant (gauge anchor).
    """

    i: jax.Array
    j: jax.Array
    R_z: jax.Array
    t_z: jax.Array
    weight: jax.Array
    fixed: jax.Array


class Poses(NamedTuple):
    R: jax.Array  # [P, 3, 3]
    t: jax.Array  # [P, 3]


def relative_pose(poses: Poses, i, j) -> Tuple[jax.Array, jax.Array]:
    """T_j o T_i^{-1} for index arrays i, j."""
    Ri_inv, ti_inv = se3.invert(poses.R[i], poses.t[i])
    return se3.compose(poses.R[j], poses.t[j], Ri_inv, ti_inv)


def _residual_fn(poses: Poses, graph: PoseGraph):
    """Lane residual closure res(xi_i, xi_j) -> [6] list of [E] leaves.

    xi_i / xi_j are [6] lists of SCALAR leaves: the same left-perturbation
    basis direction applied to every edge's endpoint — since edge e's
    residual depends only on its own endpoints' perturbations, the
    derivative in a shared direction equals the per-edge Jacobian column.
    """
    # ONE row gather per endpoint from a packed [P, 12] pose table: 24
    # separate 1-lane gathers fragmented the computation into ~27 fusions
    # (~280 us/eval at E=512); packed rows + lane slices fuse into a few.
    P = poses.R.shape[0]
    table = jnp.concatenate([poses.R.reshape(P, 9), poses.t], axis=1)
    rows_i = table[graph.i]  # [E, 12]
    rows_j = table[graph.j]
    Ri = [[rows_i[:, 3 * a + b] for b in range(3)] for a in range(3)]
    ti = [rows_i[:, 9 + a] for a in range(3)]
    Rj = [[rows_j[:, 3 * a + b] for b in range(3)] for a in range(3)]
    tj = [rows_j[:, 9 + a] for a in range(3)]
    Rz = ll.mat_lanes(graph.R_z)
    tz = ll.vec_lanes(graph.t_z)
    Rzi = ll.transpose(Rz)
    tzi = ll.neg(ll.matvec(Rzi, tz))

    def res(xi_i, xi_j):
        dRi, dti = ll.exp_se3(xi_i)
        dRj, dtj = ll.exp_se3(xi_j)
        Ri_n = ll.matmul(dRi, Ri)
        ti_n = ll.add(ll.matvec(dRi, ti), dti)
        Rj_n = ll.matmul(dRj, Rj)
        tj_n = ll.add(ll.matvec(dRj, tj), dtj)
        # T_j o T_i^{-1}
        Rrel = ll.matmul(Rj_n, ll.transpose(Ri_n))
        trel = ll.sub(tj_n, ll.matvec(Rrel, ti_n))
        # Z^{-1} o T_rel
        Re = ll.matmul(Rzi, Rrel)
        te = ll.add(ll.matvec(Rzi, trel), tzi)
        return ll.log_so3(Re) + te  # [6] of [E]

    return res


def _zeros6():
    return [jnp.zeros((), jnp.float32) for _ in range(6)]


def _edge_jacobians_lanes(poses: Poses, graph: PoseGraph):
    """(Ji [6][6], Jj [6][6], r [6]) — all leaves [E].

    Ji[a][k] = d r_a / d xi_i[k]. One jax.linearize shares the primal
    pass, and the 12 tangent basis directions go through ONE vmapped
    evaluation of the linearized function ([12]-leaf tangents -> [12, E]
    outputs): 12 separate fjvp calls traced a 12x bigger jaxpr and
    compiled to 12x the kernels for the same math.
    """
    res = _residual_fn(poses, graph)
    r, fjvp = jax.linearize(res, _zeros6(), _zeros6())
    rng12 = jnp.arange(12)
    tans_i = [(rng12 == k).astype(jnp.float32) for k in range(6)]
    tans_j = [(rng12 == 6 + k).astype(jnp.float32) for k in range(6)]
    cols = jax.vmap(fjvp)(tans_i, tans_j)  # [6 residual rows] of [12, E]
    E = graph.i.shape[0]
    bc = lambda x: jnp.broadcast_to(x, (E,))
    Ji = [[bc(cols[a][k]) for k in range(6)] for a in range(6)]
    Jj = [[bc(cols[a][6 + k]) for k in range(6)] for a in range(6)]
    return Ji, Jj, [bc(x) for x in r]


def edge_residuals(poses: Poses, graph: PoseGraph) -> jax.Array:
    """[E, 6] residuals."""
    res = _residual_fn(poses, graph)
    return jnp.stack(res(_zeros6(), _zeros6()), -1)


def cost(
    poses: Poses,
    graph: PoseGraph,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Total (optionally robustified) edge cost.

    ``huber_delta`` > 0 bounds each edge's influence; the kernel is the
    solver-level defense against residual outliers (false closures) that
    complements loopclosure's post-hoc consistency rejection.
    ``robust_kernel``: 'huber' (convex: quadratic inside the width, linear
    outside — bounded but never zero influence) or 'tukey' (redescending
    biweight with cutoff c = 3*delta: gross outliers get exactly ZERO
    influence, the standard cure for confident-but-wrong closure edges a
    convex kernel still partially satisfies)."""
    res = _residual_fn(poses, graph)
    r = res(_zeros6(), _zeros6())
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


def _robust_weight(r, weight, huber_delta: float, robust_kernel: str = "huber"):
    """IRLS edge weights for the configured kernel (static no-op branch
    when huber_delta == 0). huber: min(1, delta/||r||); tukey:
    (1 - (||r||/c)^2)^2 inside the cutoff c = 3*delta, exactly 0 outside."""
    if huber_delta <= 0:
        return weight
    rn = jnp.sqrt(sum(x * x for x in r) + 1e-20)
    if robust_kernel == "tukey":
        c = jnp.float32(3.0 * huber_delta)
        u = jnp.clip(1.0 - (rn / c) ** 2, 0.0, 1.0)
        return weight * u * u
    return weight * jnp.minimum(1.0, jnp.float32(huber_delta) / rn)


def _apply(poses: Poses, dx: jax.Array, fixed: jax.Array) -> Poses:
    free = (~fixed).astype(dx.dtype)[:, None]
    dR, dt = se3.exp_se3(dx * free)
    R_new, t_new = se3.compose(dR, dt, poses.R, poses.t)
    return Poses(R=R_new, t=t_new)


class PGOStats(NamedTuple):
    cost: jax.Array
    initial_cost: jax.Array
    lambda_final: jax.Array


def _num_poses(graph: PoseGraph) -> int:
    return graph.fixed.shape[0]


def _solve_dense_lanes(
    poses: Poses,
    graph: PoseGraph,
    lam: jax.Array,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Damped GN update dx [P, 6] by dense Cholesky.

    The full normal matrix is assembled as H = G^T diag(w) G with ONE MXU
    matmul: G [6E, 6P] stacks the 6 residual rows' lane Jacobians into
    one-hot-expanded columns (column order c*P + p, i.e. dof-major), so no
    [E, 6, 6] layout ever exists. Small-P path (window closures); memory
    is O(E P) for G — use solver='pcg' for large graphs.
    """
    P = _num_poses(graph)
    E = graph.i.shape[0]
    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    sw = jnp.sqrt(_robust_weight(r, graph.weight, huber_delta, robust_kernel))
    Si = ll.onehot(graph.i, P)  # [E, P]
    Sj = ll.onehot(graph.j, P)

    # G rows: (a, e); columns: c * P + p.
    blocks = []
    for a in range(6):
        row = [
            Si * (Ji[a][c] * sw)[:, None] + Sj * (Jj[a][c] * sw)[:, None]
            for c in range(6)
        ]
        blocks.append(jnp.concatenate(row, axis=1))  # [E, 6P]
    G = jnp.concatenate(blocks, axis=0)  # [6E, 6P]
    rw = jnp.concatenate([r[a] * sw for a in range(6)])  # [6E]

    H = lax.dot_general(G, G, (((0,), (0,)), ((), ())), precision=_HP)
    b = -jnp.matmul(rw, G, precision=_HP)  # [6P]

    free = jnp.tile((~graph.fixed).astype(jnp.float32), 6)  # [6P], c-major
    eye = jnp.eye(6 * P, dtype=jnp.float32)
    H = H + lam * eye
    H = H * free[None, :] * free[:, None]
    H = H + jnp.diag(1.0 - free) + 1e-10 * eye
    b = b * free

    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return dx.reshape(6, P).T  # (c, p) -> [P, 6]


def _gn_step_matfree(
    poses: Poses,
    graph: PoseGraph,
    lam: jax.Array,
    cg_iterations: int,
    axis_name: Optional[str],
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> jax.Array:
    """Damped GN update dx [P, 6] via matrix-free Jacobi-preconditioned CG.

    The normal matrix is never materialized: each Hv product applies the
    lane Jacobian leaves and accumulates back through one-hot MXU matmuls
    (S [2E, P] stacks both endpoints; a 1-D TPU scatter would serialize).
    With edges sharded over ``axis_name``, one psum of a [6][P] pytree per
    CG iteration is the only communication (plus the preconditioner psum).
    CG vectors live as [6] lists of [P] leaves — row gathers/slices only.
    """
    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    w = _robust_weight(r, graph.weight, huber_delta, robust_kernel)
    return _pcg_core(
        Ji, Jj, r, w, graph.i, graph.j, graph.fixed, lam, cg_iterations,
        axis_name, dof=6,
    )


def _pcg_core(
    Ji, Jj, r, w, g_i, g_j, fixed, lam, cg_iterations, axis_name, *, dof
):
    """Dof-generic matrix-free Jacobi-PCG GN step (see _gn_step_matfree).

    ``Ji/Jj [dof(a)][dof(c)] of [E]``: residual-row lane Jacobians per
    edge endpoint; ``r [dof] of [E]`` residual rows; ``w [E]`` robust
    weights. The SE(3) solver calls with dof=6; the Sim(3) solver
    (slam.posegraph_sim3) with dof=7 — the dense [dof*P]^2 Cholesky walls
    out at campaign pose counts (measured 6-11 s per closure event at
    P~512 padded, projected minutes at P=2048), while this path is
    O(E dof^2) per CG iteration with no materialized normal matrix.
    """
    P = fixed.shape[0]
    E = g_i.shape[0]
    freeP = (~fixed).astype(jnp.float32)  # [P]
    idx2 = jnp.concatenate([g_i, g_j])  # [2E]

    # Accumulation strategy: the one-hot [2E, P] matrix turns scatter-add
    # into one MXU matmul — a TPU scatter serializes over rows — but its
    # HBM traffic is 2E*P floats per product, so past ~16M entries the
    # matmul loses (measured 2.2x slower than scatter at P=4096, E=16384).
    # Large graphs factorize the one-hot instead: with p = p1*P2 + p2,
    # out[p1, p2] = sum_e A[e, p1] * (B[e, p2] * y[e]) is one MXU matmul
    # per component over two E x sqrt(P)-sized one-hots — O(E sqrt(P))
    # memory, and exact (each product has a single nonzero pair).
    use_onehot = 2 * E * P <= _ONEHOT_MAX_ENTRIES
    if use_onehot:
        S = jnp.concatenate(
            [ll.onehot(g_i, P), ll.onehot(g_j, P)], axis=0
        )  # [2E, P]; S^T is the gather both endpoints share
        segsum = None
    else:
        P2 = 1 << ((max(P - 1, 1).bit_length() + 1) // 2)
        P1 = -(-P // P2)
        A1 = ll.onehot(idx2 // P2, P1)  # [2E, P1]
        B2 = ll.onehot(idx2 % P2, P2)  # [2E, P2]

        def segsum(vals):
            """[2E, C] -> [P, C] segment sums over idx2 (factorized)."""
            outs = []
            for c in range(vals.shape[1]):
                M = B2 * vals[:, c : c + 1]  # [2E, P2]
                Z = jnp.matmul(A1.T, M, precision=_HP)  # [P1, P2]
                outs.append(Z.reshape(P1 * P2)[:P])
            return jnp.stack(outs, -1)

    def scatter6(Yi, Yj):
        """[6] lists of [E] per endpoint -> [6, P] accumulation."""
        if use_onehot:
            Y = jnp.concatenate(
                [jnp.stack(Yi, 0), jnp.stack(Yj, 0)], axis=1
            )  # [dof, 2E]
            return jnp.matmul(Y, S, precision=_HP)  # [dof, P]
        vals = jnp.concatenate(
            [jnp.stack(Yi, -1), jnp.stack(Yj, -1)]
        )  # [2E, dof]
        return segsum(vals).T

    # rhs b and Jacobi blocks D
    b2 = scatter6(
        [-(sum(Ji[a][c] * r[a] for a in range(dof))) * w for c in range(dof)],
        [-(sum(Jj[a][c] * r[a] for a in range(dof))) * w for c in range(dof)],
    )
    d_rows_i, d_rows_j = [], []
    for ci in range(dof):
        for cj in range(dof):
            if cj < ci:
                d_rows_i.append(d_rows_i[cj * dof + ci])
                d_rows_j.append(d_rows_j[cj * dof + ci])
            else:
                d_rows_i.append(sum(Ji[a][ci] * Ji[a][cj] for a in range(dof)) * w)
                d_rows_j.append(sum(Jj[a][ci] * Jj[a][cj] for a in range(dof)) * w)
    if use_onehot:
        Dm = jnp.matmul(
            jnp.concatenate(
                [jnp.stack(d_rows_i, 0), jnp.stack(d_rows_j, 0)], axis=1
            ),
            S,
            precision=_HP,
        )  # [dof*dof, P]
    else:
        dvals = jnp.concatenate(
            [jnp.stack(d_rows_i, -1), jnp.stack(d_rows_j, -1)]
        )  # [2E, dof*dof]
        Dm = segsum(dvals).T
    if axis_name is not None:
        b2 = lax.psum(b2, axis_name)
        Dm = lax.psum(Dm, axis_name)
    b = [b2[c] * freeP for c in range(dof)]
    D = jnp.transpose(Dm).reshape(P, dof, dof) + (lam + 1e-8) * jnp.eye(
        dof, dtype=jnp.float32
    )
    D_inv = jnp.linalg.inv(D)
    Dl = [[D_inv[:, a, c] for c in range(dof)] for a in range(dof)]

    # CG runs on STACKED lane arrays ([6, P] state, [6(a), 6(c), E]
    # Jacobian stacks — minor dim stays the big axis, so no layout
    # disease): the per-component list form compiled to ~50 kernels per CG
    # iteration, all launch overhead at these sizes.
    Jist = jnp.stack([jnp.stack(Ji[a], 0) for a in range(dof)])  # [6, 6, E]
    Jjst = jnp.stack([jnp.stack(Jj[a], 0) for a in range(dof)])
    Dst = jnp.stack(
        [jnp.stack([Dl[a][c] for c in range(dof)], 0) for a in range(dof)]
    )  # [6, 6, P]
    bst = jnp.stack(b, 0)  # [dof, P]

    def precond(V):  # [dof, P] -> [6, P]
        return (Dst * V[None, :, :]).sum(1) * freeP[None, :]

    def hv(V):
        Vm = V * freeP[None, :]
        rows = Vm.T[idx2]  # [2E, dof] packed gather of both endpoints
        vi, vj = rows[:E].T, rows[E:].T  # [dof, E]
        u = (
            (Jist * vi[None, :, :]).sum(1) + (Jjst * vj[None, :, :]).sum(1)
        ) * w[None, :]
        Yi = (Jist * u[:, None, :]).sum(0)  # [dof(c), E]
        Yj = (Jjst * u[:, None, :]).sum(0)
        if use_onehot:
            out = jnp.matmul(
                jnp.concatenate([Yi, Yj], axis=1), S, precision=_HP
            )
        else:
            out = segsum(jnp.concatenate([Yi.T, Yj.T], axis=0)).T
        if axis_name is not None:
            out = lax.psum(out, axis_name)
        return (out + lam * Vm) * freeP[None, :]

    def dot(u, v):
        return jnp.sum(u * v)

    x = jnp.zeros((dof, P), jnp.float32)
    res = bst
    z = precond(res)
    p = z
    rz = dot(res, z)

    def cg_body(_, carry):
        x, res, p, rz = carry
        hp = hv(p)
        alpha = rz / jnp.maximum(dot(p, hp), 1e-20)
        x = x + alpha * p
        res = res - alpha * hp
        z = precond(res)
        rz_new = dot(res, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return x, res, p, rz_new

    x, _, _, _ = lax.fori_loop(0, cg_iterations, cg_body, (x, res, p, rz))
    return x.T  # [P, dof]


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "lam0", "solver", "cg_iterations", "axis_name",
        "huber_delta", "robust_kernel",
    ),
)
@precise
def optimize_pose_graph(
    poses: Poses,
    graph: PoseGraph,
    *,
    iterations: int = 20,
    lam0: float = 1e-6,
    solver: str = "dense",
    cg_iterations: int = 50,
    axis_name: Optional[str] = None,
    huber_delta: float = 0.0,
    robust_kernel: str = "huber",
) -> Tuple[Poses, PGOStats]:
    """LM pose-graph optimization, fixed iteration count (jit-compatible).

    Jitted at definition (inlined when already under an outer jit /
    shard_map): eager call sites like slam.loopclosure's closure loop
    would otherwise re-trace the linearize-based Jacobians op-by-op on
    every call (~9 s per eager call on CPU at P=24).

    solver='dense': exact Cholesky of the assembled [6P, 6P] system (single
    device, small P). solver='pcg': matrix-free Jacobi-PCG — required when
    edges are sharded over ``axis_name`` (see
    cvsteer_tpu.parallel.posegraph_sharded) and preferred for large P.
    """
    c0 = cost(poses, graph, huber_delta, robust_kernel)
    if axis_name is not None:
        c0 = lax.psum(c0, axis_name)
        solver = "pcg"

    def body(_, carry):
        ps, cur, lam = carry
        if solver == "pcg":
            dx = _gn_step_matfree(
                ps, graph, lam, cg_iterations, axis_name, huber_delta,
                robust_kernel,
            )
        else:
            dx = _solve_dense_lanes(ps, graph, lam, huber_delta, robust_kernel)
        cand = _apply(ps, dx, graph.fixed)
        cand_cost = cost(cand, graph, huber_delta, robust_kernel)
        if axis_name is not None:
            cand_cost = lax.psum(cand_cost, axis_name)
        accept = cand_cost < cur
        ps = jax.tree.map(lambda a, b2: jnp.where(accept, a, b2), cand, ps)
        cur = jnp.where(accept, cand_cost, cur)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 10.0), 1e-9, 1e6)
        return ps, cur, lam

    ps, cf, lam = lax.fori_loop(0, iterations, body, (poses, c0, jnp.float32(lam0)))
    return ps, PGOStats(cost=cf, initial_cost=c0, lambda_final=lam)
