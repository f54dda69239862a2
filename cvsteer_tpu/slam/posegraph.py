"""Pose-graph optimization: Gauss-Newton over SE(3) with relative-pose edges.

BASELINE config 5 (single-host core; the landmark/edge-sharded multi-host
version lives in cvsteer_tpu.parallel.posegraph_sharded). Fixed-size masked
edge list, per-edge Jacobians by vmapped forward-mode autodiff on the
6-dof tangent perturbations, dense block assembly via scatter-add, Cholesky
solve with gauge fixing, LM damping in a fori_loop.

Pose convention matches slam.ba: T_i = (R_i, t_i), world -> camera-i.
An edge (i, j) measures Z_ij ~ T_j o T_i^{-1} (camera-i frame to camera-j).
Residual: log( Z_ij^{-1} o (T_j o T_i^{-1}) ) as a 6-vector (omega, v).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.slam import se3


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


def _edge_residual(Ri, ti, Rj, tj, Rz, tz) -> jax.Array:
    """6-vector residual of one edge."""
    Rrel, trel = se3.compose(Rj, tj, *se3.invert(Ri, ti))
    Rz_inv, tz_inv = se3.invert(Rz, tz)
    Re, te = se3.compose(Rz_inv, tz_inv, Rrel, trel)
    return jnp.concatenate([se3.log_so3(Re), te], axis=-1)


def edge_residuals(poses: Poses, graph: PoseGraph) -> jax.Array:
    """[E, 6] residuals."""
    return jax.vmap(_edge_residual)(
        poses.R[graph.i], poses.t[graph.i],
        poses.R[graph.j], poses.t[graph.j],
        graph.R_z, graph.t_z,
    )


def cost(poses: Poses, graph: PoseGraph) -> jax.Array:
    r = edge_residuals(poses, graph)
    return 0.5 * jnp.sum(graph.weight[:, None] * r * r)


def _edge_jacobians(poses: Poses, graph: PoseGraph):
    """Per-edge Jacobians wrt left-perturbations of poses i and j.

    Returns (J_i [E, 6, 6], J_j [E, 6, 6], r [E, 6]).
    """

    def res_of_perturb(xi_i, xi_j, Ri, ti, Rj, tj, Rz, tz):
        dRi, dti = se3.exp_se3(xi_i)
        dRj, dtj = se3.exp_se3(xi_j)
        Ri_n, ti_n = se3.compose(dRi, dti, Ri, ti)
        Rj_n, tj_n = se3.compose(dRj, dtj, Rj, tj)
        return _edge_residual(Ri_n, ti_n, Rj_n, tj_n, Rz, tz)

    zeros = jnp.zeros(6, jnp.float32)

    def one(Ri, ti, Rj, tj, Rz, tz):
        f = lambda a, b: res_of_perturb(a, b, Ri, ti, Rj, tj, Rz, tz)
        Ji = jax.jacfwd(f, argnums=0)(zeros, zeros)
        Jj = jax.jacfwd(f, argnums=1)(zeros, zeros)
        r = f(zeros, zeros)
        return Ji, Jj, r

    return jax.vmap(one)(
        poses.R[graph.i], poses.t[graph.i],
        poses.R[graph.j], poses.t[graph.j],
        graph.R_z, graph.t_z,
    )


def _build_system(poses: Poses, graph: PoseGraph, lam: jax.Array):
    """Dense damped normal equations (H [P,6,P,6], b [P,6])."""
    P = poses.R.shape[0]
    Ji, Jj, r = _edge_jacobians(poses, graph)
    w = graph.weight

    Hii = jnp.einsum("eai,eaj,e->eij", Ji, Ji, w, precision=lax.Precision.HIGHEST)
    Hjj = jnp.einsum("eai,eaj,e->eij", Jj, Jj, w, precision=lax.Precision.HIGHEST)
    Hij = jnp.einsum("eai,eaj,e->eij", Ji, Jj, w, precision=lax.Precision.HIGHEST)
    bi = -jnp.einsum("eai,ea,e->ei", Ji, r, w, precision=lax.Precision.HIGHEST)
    bj = -jnp.einsum("eai,ea,e->ei", Jj, r, w, precision=lax.Precision.HIGHEST)

    H = jnp.zeros((P, 6, P, 6), jnp.float32)
    H = H.at[graph.i, :, graph.i, :].add(Hii)
    H = H.at[graph.j, :, graph.j, :].add(Hjj)
    H = H.at[graph.i, :, graph.j, :].add(Hij)
    H = H.at[graph.j, :, graph.i, :].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((P, 6), jnp.float32)
    b = b.at[graph.i].add(bi)
    b = b.at[graph.j].add(bj)

    # damping + gauge
    eye6 = jnp.eye(6, dtype=jnp.float32)
    H = H + jnp.einsum("pq,ij->piqj", jnp.eye(P, dtype=jnp.float32), lam * eye6, precision=lax.Precision.HIGHEST)
    free = (~graph.fixed).astype(jnp.float32)
    H = H * free[:, None, None, None] * free[None, None, :, None]
    H = H + jnp.einsum("pq,ij,p->piqj", jnp.eye(P, dtype=jnp.float32), eye6, 1.0 - free, precision=lax.Precision.HIGHEST)
    b = b * free[:, None]
    return H, b


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


def _gn_step_matfree(
    poses: Poses,
    graph: PoseGraph,
    lam: jax.Array,
    cg_iterations: int,
    axis_name: Optional[str],
) -> jax.Array:
    """Damped GN update dx [P, 6] via matrix-free Jacobi-preconditioned CG.

    The normal matrix is never materialized: each Hv product applies the
    per-edge Jacobians and scatter-adds back — with edges sharded over
    ``axis_name``, one psum of a [P, 6] vector per CG iteration is the only
    communication (plus one [P, 6, 6] psum for the preconditioner). This is
    the multi-device path; the dense Cholesky path below is exact for small
    P on one device.
    """
    P = _num_poses(graph)
    Ji, Jj, r = _edge_jacobians(poses, graph)
    w = graph.weight
    free = (~graph.fixed).astype(jnp.float32)[:, None]

    b = jnp.zeros((P, 6), jnp.float32)
    b = b.at[graph.i].add(-jnp.einsum("eai,ea,e->ei", Ji, r, w, precision=lax.Precision.HIGHEST))
    b = b.at[graph.j].add(-jnp.einsum("eai,ea,e->ei", Jj, r, w, precision=lax.Precision.HIGHEST))
    # Jacobi preconditioner blocks
    D = jnp.zeros((P, 6, 6), jnp.float32)
    D = D.at[graph.i].add(jnp.einsum("eai,eaj,e->eij", Ji, Ji, w, precision=lax.Precision.HIGHEST))
    D = D.at[graph.j].add(jnp.einsum("eai,eaj,e->eij", Jj, Jj, w, precision=lax.Precision.HIGHEST))
    if axis_name is not None:
        b = lax.psum(b, axis_name)
        D = lax.psum(D, axis_name)
    b = b * free
    D = D + (lam + 1e-8) * jnp.eye(6, dtype=jnp.float32)
    D_inv = jnp.linalg.inv(D)

    def hv(v):
        v = v * free
        u = (
            jnp.einsum("eab,eb->ea", Ji, v[graph.i], precision=lax.Precision.HIGHEST)
            + jnp.einsum("eab,eb->ea", Jj, v[graph.j], precision=lax.Precision.HIGHEST)
        ) * w[:, None]
        out = jnp.zeros((P, 6), jnp.float32)
        out = out.at[graph.i].add(jnp.einsum("eab,ea->eb", Ji, u, precision=lax.Precision.HIGHEST))
        out = out.at[graph.j].add(jnp.einsum("eab,ea->eb", Jj, u, precision=lax.Precision.HIGHEST))
        if axis_name is not None:
            out = lax.psum(out, axis_name)
        return (out + lam * v) * free

    def precond(v):
        return jnp.einsum("pij,pj->pi", D_inv, v, precision=lax.Precision.HIGHEST) * free

    x = jnp.zeros((P, 6), jnp.float32)
    res = b
    z = precond(res)
    p = z
    rz = jnp.sum(res * z)

    def cg_body(_, carry):
        x, res, p, rz = carry
        hp = hv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-20)
        x = x + alpha * p
        res = res - alpha * hp
        z = precond(res)
        rz_new = jnp.sum(res * z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return x, res, p, rz_new

    x, _, _, _ = lax.fori_loop(0, cg_iterations, cg_body, (x, res, p, rz))
    return x


def optimize_pose_graph(
    poses: Poses,
    graph: PoseGraph,
    *,
    iterations: int = 20,
    lam0: float = 1e-6,
    solver: str = "dense",
    cg_iterations: int = 50,
    axis_name: Optional[str] = None,
) -> Tuple[Poses, PGOStats]:
    """LM pose-graph optimization, fixed iteration count (jit-compatible).

    solver='dense': exact Cholesky of the assembled [6P, 6P] system (single
    device, small P). solver='pcg': matrix-free Jacobi-PCG — required when
    edges are sharded over ``axis_name`` (see
    cvsteer_tpu.parallel.posegraph_sharded) and preferred for large P.
    """
    c0 = cost(poses, graph)
    if axis_name is not None:
        c0 = lax.psum(c0, axis_name)
        solver = "pcg"
    P = _num_poses(graph)

    def solve_dense(ps, lam):
        H, b = _build_system(ps, graph, lam)
        A = H.reshape(P * 6, P * 6) + 1e-10 * jnp.eye(P * 6, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b.reshape(-1), lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False).reshape(P, 6)

    def body(_, carry):
        ps, cur, lam = carry
        if solver == "pcg":
            dx = _gn_step_matfree(ps, graph, lam, cg_iterations, axis_name)
        else:
            dx = solve_dense(ps, lam)
        cand = _apply(ps, dx, graph.fixed)
        cand_cost = cost(cand, graph)
        if axis_name is not None:
            cand_cost = lax.psum(cand_cost, axis_name)
        accept = cand_cost < cur
        ps = jax.tree.map(lambda a, b2: jnp.where(accept, a, b2), cand, ps)
        cur = jnp.where(accept, cand_cost, cur)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 10.0), 1e-9, 1e6)
        return ps, cur, lam

    ps, cf, lam = lax.fori_loop(0, iterations, body, (poses, c0, jnp.float32(lam0)))
    return ps, PGOStats(cost=cf, initial_cost=c0, lambda_final=lam)
