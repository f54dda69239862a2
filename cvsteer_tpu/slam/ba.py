"""Windowed bundle adjustment: dense-blocked Schur-complement Gauss-Newton.

BASELINE config 4. TPU-shaped design (SURVEY.md section 7): the observation
structure is a dense masked grid ``[C cameras, L landmarks]`` — no sparse
indexing anywhere — so every contraction below is a batched matmul/reduction
XLA maps straight onto the MXU/VPU:

- analytic Jacobians J_c [C, L, 2, 6], J_l [C, L, 2, 3];
- landmark blocks H_ll [L, 3, 3] inverted in closed batched form;
- the reduced camera system S [C, 6, C, 6] assembled by one einsum over
  landmarks (the contraction that becomes a reduce_scatter/psum over a
  landmark-sharded mesh in cvsteer_tpu.parallel.ba_sharded);
- dense Cholesky solve of the (6C x 6C) reduced system (C is the window
  size, typically <= 16), then batched landmark back-substitution;
- Levenberg-Marquardt damping with accept/reject carried through a
  lax.fori_loop — fixed iteration count, no data-dependent control flow.

Projection model: normalized pinhole u = (x/z, y/z) — pixels are converted
via geometry.camera.normalize_pixels. Gauge freedom is removed by masking
update rows of ``fixed_cameras`` (typically the first window camera, plus
the second's translation scale via a prior if desired).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.slam import se3


class BAProblem(NamedTuple):
    """Dense masked observation grid.

    uv:    [C, L, 2] observed normalized image coordinates.
    mask:  [C, L] observation validity.
    fixed_cameras: [C] bool — cameras whose pose is held (gauge).
    huber_delta: scalar robust-kernel width in normalized units
        (<= 0 disables robustification).
    """

    uv: jax.Array
    mask: jax.Array
    fixed_cameras: jax.Array
    huber_delta: float = 0.0


class BAState(NamedTuple):
    """R [C, 3, 3], t [C, 3] (world->camera: p = R X + t), X [L, 3]."""

    R: jax.Array
    t: jax.Array
    X: jax.Array


class BAStats(NamedTuple):
    cost: jax.Array  # final robust cost
    initial_cost: jax.Array
    iterations: jax.Array
    lambda_final: jax.Array


def _project(R, t, X):
    """p = R X + t (camera frame) and u = (x/z, y/z); [C, L, ...]."""
    p = jnp.einsum("cij,lj->cli", R, X, precision=lax.Precision.HIGHEST) + t[:, None, :]
    z = p[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = p[..., :2] / z_safe[..., None]
    return p, u, z_safe


def residuals(state: BAState, problem: BAProblem) -> Tuple[jax.Array, jax.Array]:
    """(r [C, L, 2], weight [C, L]) with Huber IRLS weights folded in."""
    _, u, z = _project(state.R, state.t, state.X)
    r = u - problem.uv
    w = problem.mask.astype(r.dtype)
    # points behind a camera contribute nothing (and a huge residual would
    # destabilize the quadratic model)
    w = w * (z > 1e-6)
    w = w * _huber_weight(r, problem.huber_delta)
    return r, w


def _huber_weight(r: jax.Array, delta) -> jax.Array:
    """IRLS Huber weight; trace-safe (delta may be a traced scalar, <=0 = off)."""
    delta = jnp.asarray(delta, r.dtype)
    rn = jnp.linalg.norm(r, axis=-1)
    w = jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-12))
    return jnp.where(delta > 0, w, 1.0)


def cost(
    state: BAState, problem: BAProblem, axis_name: Optional[str] = None
) -> jax.Array:
    r, w = residuals(state, problem)
    c = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))
    return lax.psum(c, axis_name) if axis_name is not None else c


def _jacobians(state: BAState, problem: BAProblem):
    """J_c [C, L, 2, 6] (omega, v blocks), J_l [C, L, 2, 3], r, w."""
    p, u, z = _project(state.R, state.t, state.X)
    r = u - problem.uv
    w = problem.mask.astype(r.dtype) * (z > 1e-6)
    w = w * _huber_weight(r, problem.huber_delta)

    inv_z = 1.0 / z
    x_z, y_z = u[..., 0], u[..., 1]
    # du/dp [C, L, 2, 3]
    zeros = jnp.zeros_like(inv_z)
    dudp = jnp.stack(
        [
            jnp.stack([inv_z, zeros, -x_z * inv_z], -1),
            jnp.stack([zeros, inv_z, -y_z * inv_z], -1),
        ],
        -2,
    )
    # dp/domega = -hat(R X) = -(hat(p - t)); dp/dv = I.
    q = p - state.t[:, None, :]
    dpdw = -se3.hat(q)  # [C, L, 3, 3]
    Jw = dudp @ dpdw  # [C, L, 2, 3]
    Jv = dudp  # [C, L, 2, 3] (dp/dv = I)
    Jc = jnp.concatenate([Jw, Jv], axis=-1)  # [C, L, 2, 6]
    Jl = jnp.einsum("clij,cjk->clik", dudp, state.R, precision=lax.Precision.HIGHEST)  # dp/dX = R
    return Jc, Jl, r, w


def _inv3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


class NormalEquations(NamedTuple):
    """All blocks of the (damped) BA normal equations for one linearization."""

    H_cc: jax.Array  # [C, 6, 6]
    H_ll: jax.Array  # [L, 3, 3]
    W: jax.Array  # [C, L, 6, 3]
    b_c: jax.Array  # [C, 6]
    b_l: jax.Array  # [L, 3]


def build_normal_equations(state: BAState, problem: BAProblem) -> NormalEquations:
    Jc, Jl, r, w = _jacobians(state, problem)
    H_cc = jnp.einsum("clai,claj,cl->cij", Jc, Jc, w, precision=lax.Precision.HIGHEST)
    H_ll = jnp.einsum("clai,claj,cl->lij", Jl, Jl, w, precision=lax.Precision.HIGHEST)
    W = jnp.einsum("clai,claj,cl->clij", Jc, Jl, w, precision=lax.Precision.HIGHEST)
    b_c = -jnp.einsum("clai,cla,cl->ci", Jc, r, w, precision=lax.Precision.HIGHEST)
    b_l = -jnp.einsum("clai,cla,cl->li", Jl, r, w, precision=lax.Precision.HIGHEST)
    return NormalEquations(H_cc, H_ll, W, b_c, b_l)


def reduced_system(
    eqs: NormalEquations,
    lam: jax.Array,
    fixed: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Schur complement: (S [C, 6, C, 6], b_s [C, 6], Hll_inv [L, 3, 3]).

    With ``axis_name`` set (inside shard_map with landmarks sharded over that
    mesh axis), the camera-side contractions are psum'd across shards — this
    is the reduce of the reduced-camera-system assembly, compiled to ICI
    collectives. The returned S/b_s are replicated; Hll_inv stays per-shard.
    """
    C = eqs.H_cc.shape[0]
    eye3 = jnp.eye(3, dtype=eqs.H_ll.dtype)
    eye6 = jnp.eye(6, dtype=eqs.H_cc.dtype)
    Hll = eqs.H_ll + lam * eye3  # LM damping on landmark blocks
    Hll_inv = _inv3(Hll)

    # S = blockdiag(H_cc + lam I) - sum_l W[:, l] Hll_inv[l] W[:, l]^T
    WHinv = jnp.einsum("clij,ljk->clik", eqs.W, Hll_inv, precision=lax.Precision.HIGHEST)  # [C, L, 6, 3]
    S_off = -jnp.einsum("alik,bljk->aibj", WHinv, eqs.W, precision=lax.Precision.HIGHEST)  # [C, 6, C, 6]
    bs_lm = jnp.einsum("clik,lk->ci", WHinv, eqs.b_l, precision=lax.Precision.HIGHEST)
    H_cc, b_c = eqs.H_cc, eqs.b_c
    if axis_name is not None:
        S_off = lax.psum(S_off, axis_name)
        bs_lm = lax.psum(bs_lm, axis_name)
        H_cc = lax.psum(H_cc, axis_name)
        b_c = lax.psum(b_c, axis_name)
    S = S_off + jnp.einsum(
        "ab,aij->aibj", jnp.eye(C, dtype=eqs.H_cc.dtype), H_cc + lam * eye6
    , precision=lax.Precision.HIGHEST)
    b_s = b_c - bs_lm

    # Gauge: fixed cameras get identity rows/cols and zero rhs.
    free = (~fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S + jnp.einsum("ab,ij,a->aibj", jnp.eye(C, dtype=S.dtype), eye6, 1.0 - free, precision=lax.Precision.HIGHEST)
    b_s = b_s * free[:, None]
    return S, b_s, Hll_inv


def solve_reduced_dense(S: jax.Array, b_s: jax.Array) -> jax.Array:
    """Cholesky solve of the reduced camera system; [C, 6]."""
    C = S.shape[0]
    A = S.reshape(C * 6, C * 6)
    b = b_s.reshape(C * 6)
    # tiny diagonal lift for numerical safety
    A = A + 1e-10 * jnp.eye(C * 6, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x.reshape(C, 6)


def back_substitute(
    eqs: NormalEquations, Hll_inv: jax.Array, dx_c: jax.Array
) -> jax.Array:
    """Landmark updates dX [L, 3] given camera updates."""
    Wt_dx = jnp.einsum("clij,ci->lj", eqs.W, dx_c, precision=lax.Precision.HIGHEST)
    return jnp.einsum("lij,lj->li", Hll_inv, eqs.b_l - Wt_dx, precision=lax.Precision.HIGHEST)


def apply_updates(
    state: BAState, dx_c: jax.Array, dX: jax.Array, fixed: jax.Array
) -> BAState:
    free = (~fixed).astype(dx_c.dtype)[:, None]
    dw = dx_c[:, :3] * free
    dv = dx_c[:, 3:] * free
    R_new = se3.exp_so3(dw) @ state.R
    t_new = state.t + dv
    return BAState(R=R_new, t=t_new, X=state.X + dX)


def ba_step(
    state: BAState,
    problem: BAProblem,
    lam: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[BAState, jax.Array]:
    """One damped GN step: returns (candidate state, predicted new cost).

    ``axis_name``: landmark-shard mesh axis when called inside shard_map —
    the reduced system is psum-assembled and solved replicated; landmark
    back-substitution stays local to each shard.
    """
    eqs = build_normal_equations(state, problem)
    S, b_s, Hll_inv = reduced_system(eqs, lam, problem.fixed_cameras, axis_name)
    dx_c = solve_reduced_dense(S, b_s)
    dX = back_substitute(eqs, Hll_inv, dx_c)
    new_state = apply_updates(state, dx_c, dX, problem.fixed_cameras)
    return new_state, cost(new_state, problem, axis_name)


def refine_pose(
    X: jax.Array,
    uv: jax.Array,
    mask: jax.Array,
    R0: jax.Array,
    t0: jax.Array,
    *,
    iterations: int = 10,
    huber_delta: float = 0.0,
    lam0: float = 1e-4,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Motion-only BA (the PnP refinement step of VO): optimize one camera
    pose against fixed landmarks.

    X [M, 3] world points, uv [M, 2] normalized observations, mask [M].
    Returns (R, t, inlier_mask) — inliers judged at 3x the Huber width
    (or all masked points when huber_delta <= 0).
    """
    problem = BAProblem(
        uv=uv[None],
        mask=mask[None] if mask.dtype == jnp.bool_ else (mask > 0)[None],
        fixed_cameras=jnp.zeros((1,), bool),
        huber_delta=huber_delta,
    )

    def body(_, carry):
        R, t, cur, lam = carry
        st = BAState(R=R[None], t=t[None], X=X)
        Jc, _, r, w = _jacobians(st, problem)
        H = jnp.einsum("clai,claj,cl->ij", Jc, Jc, w, precision=lax.Precision.HIGHEST) + lam * jnp.eye(6)
        b = -jnp.einsum("clai,cla,cl->i", Jc, r, w, precision=lax.Precision.HIGHEST)
        dx = jnp.linalg.solve(H, b)
        R_new = se3.exp_so3(dx[:3]) @ R
        t_new = t + dx[3:]
        new_cost = cost(BAState(R_new[None], t_new[None], X), problem)
        accept = new_cost < cur
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        cur = jnp.where(accept, new_cost, cur)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 10.0), 1e-9, 1e6)
        return R, t, cur, lam

    c0 = cost(BAState(R0[None], t0[None], X), problem)
    R, t, _, _ = lax.fori_loop(0, iterations, body, (R0, t0, c0, jnp.float32(lam0)))

    r, _ = residuals(BAState(R[None], t[None], X), problem)
    rn = jnp.linalg.norm(r[0], axis=-1)
    thresh = jnp.where(huber_delta > 0, 3.0 * huber_delta, jnp.inf)
    inliers = (rn < thresh) & (mask > 0 if mask.dtype != jnp.bool_ else mask)
    return R, t, inliers


def bundle_adjust(
    state: BAState,
    problem: BAProblem,
    *,
    iterations: int = 20,
    lam0: float = 1e-4,
    axis_name: Optional[str] = None,
) -> Tuple[BAState, BAStats]:
    """Levenberg-Marquardt BA with fixed iteration count (jit-compatible).

    Rejected steps raise lambda x10 and keep the old state; accepted steps
    lower it x(1/3). ``axis_name`` enables the landmark-sharded distributed
    mode (see cvsteer_tpu.parallel.ba_sharded).
    """
    c0 = cost(state, problem, axis_name)

    def body(i, carry):
        st, cur_cost, lam = carry
        cand, cand_cost = ba_step(st, problem, lam, axis_name)
        accept = cand_cost < cur_cost
        st = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, st
        )
        cur_cost = jnp.where(accept, cand_cost, cur_cost)
        lam = jnp.where(accept, lam / 3.0, lam * 10.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return st, cur_cost, lam

    st, c_final, lam = lax.fori_loop(
        0, iterations, body, (state, c0, jnp.asarray(lam0, jnp.float32))
    )
    return st, BAStats(
        cost=c_final,
        initial_cost=c0,
        iterations=jnp.asarray(iterations),
        lambda_final=lam,
    )
