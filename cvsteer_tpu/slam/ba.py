"""Windowed bundle adjustment: dense-blocked Schur-complement Gauss-Newton.

BASELINE config 4. TPU-shaped design (SURVEY.md section 7): the observation
structure is a dense masked grid ``[C cameras, L landmarks]`` — no sparse
indexing anywhere. Internally every per-observation quantity lives as a
plain [C, L] lane array (nested Python lists over the tiny 2/3/6 index
dims, unrolled at trace time): arrays with 3/6-sized minor dimensions get
(8, 128)-padded TPU layouts and XLA lowers einsums over them into VPU
fusions that measured ~520 us per LM iteration; the list form runs the
same iteration in ~35 us on a v5e (C=8, L=1024):

- analytic Jacobians as [2][6] / [2][3] lists of [C, L] leaves;
- landmark blocks H_ll as [3][3] lists of [L], inverted in closed form;
- the reduced camera system S [C, 6, C, 6] assembled by ONE
  [C*6, 3L] x [3L, C*6] MXU matmul over stacked leaves (the contraction
  that becomes a psum over a landmark-sharded mesh in
  cvsteer_tpu.parallel.ba_sharded);
- dense Cholesky solve of the (6C x 6C) reduced system (C is the window
  size, typically <= 16), then lane-parallel landmark back-substitution;
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
from cvsteer_tpu.utils.precision import precise


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


# ---------------------------------------------------------------------------
# L-minor ("_T") internal layout.
#
# Public arrays carry the textbook layout (X [L, 3], J_c [C, L, 2, 6], ...)
# whose minor dimensions are 3 or 6 — on TPU every such array is tiled to
# (8, 128) with 20-40x padding waste, and XLA lowers the normal-equation
# einsums into crawling VPU fusions (~440 of 520 us per BA iteration
# measured on v5e). Internally the landmark axis L is therefore kept as the
# MINOR (lane) dimension: all per-observation math becomes dense [.., L]
# lane-parallel vector ops, and the Schur contraction becomes one clean
# [C*6, 3L] x [3L, C*6] MXU matmul.
# ---------------------------------------------------------------------------


def _project_T(R, t, X_T):
    """p [C, 3, L], u [C, 2, L], z [C, L] from X_T [3, L]."""
    p = jnp.einsum(
        "cij,jl->cil", R, X_T, precision=lax.Precision.HIGHEST
    ) + t[:, :, None]
    z = p[:, 2, :]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = p[:, :2, :] / z_safe[:, None, :]
    return p, u, z_safe


def _weights_T(r_T, z, problem):
    w = problem.mask.astype(r_T.dtype)
    w = w * (z > 1e-6)
    delta = jnp.asarray(problem.huber_delta, r_T.dtype)
    rn = jnp.sqrt(r_T[:, 0, :] ** 2 + r_T[:, 1, :] ** 2)
    hw = jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-12))
    return w * jnp.where(delta > 0, hw, 1.0)


def residuals(state: BAState, problem: BAProblem) -> Tuple[jax.Array, jax.Array]:
    """(r [C, L, 2], weight [C, L]) with Huber IRLS weights folded in."""
    _, u, z = _project_T(state.R, state.t, state.X.T)
    r_T = u - _uv_T(problem)
    w = _weights_T(r_T, z, problem)
    return jnp.moveaxis(r_T, 1, 2), w


def _uv_T(problem: BAProblem):
    return jnp.moveaxis(problem.uv, 2, 1)  # [C, 2, L]



def cost(
    state: BAState, problem: BAProblem, axis_name: Optional[str] = None
) -> jax.Array:
    _, u, z = _project_T(state.R, state.t, state.X.T)
    r_T = u - _uv_T(problem)
    w = _weights_T(r_T, z, problem)
    c = 0.5 * jnp.sum(w * (r_T[:, 0, :] ** 2 + r_T[:, 1, :] ** 2))
    return lax.psum(c, axis_name) if axis_name is not None else c


def _jacobians_lists(state: BAState, problem: BAProblem):
    """Jacobian blocks as nested LISTS of [C, L] lane arrays.

    Returns (Jc [2][6], Jl [2][3], r [2], w) where every leaf is a [C, L]
    array. Stacked [.., 3, 6, ..] forms are deliberately never built: any
    array whose minor dims are 3/6 gets a (8, 128)-padded TPU layout and
    XLA re-canonicalizes einsums over it into crawling VPU fusions — with
    plain [C, L] leaves every product is a perfectly tiled vector op, and
    only the final Schur contraction stacks operands (for one MXU dot).
    """
    p, u, z = _project_T(state.R, state.t, state.X.T)
    r_T = u - _uv_T(problem)
    w = _weights_T(r_T, z, problem)

    inv_z = 1.0 / z  # [C, L]
    x_z, y_z = u[:, 0, :], u[:, 1, :]
    zero = jnp.zeros_like(inv_z)
    # du/dp rows: [ [1/z, 0, -x/z^2*z], [0, 1/z, -y/z^2*z] ] (already /z)
    dudp = [
        [inv_z, zero, -x_z * inv_z],
        [zero, inv_z, -y_z * inv_z],
    ]
    # dp/domega = -hat(p - t); dp/dv = I.
    qx = p[:, 0, :] - state.t[:, 0, None]
    qy = p[:, 1, :] - state.t[:, 1, None]
    qz = p[:, 2, :] - state.t[:, 2, None]
    dpdw = [
        [zero, qz, -qy],
        [-qz, zero, qx],
        [qy, -qx, zero],
    ]  # [m][k] = -hat(q)[m][k]
    Jc = [[None] * 6 for _ in range(2)]
    Jl = [[None] * 3 for _ in range(2)]
    for a in range(2):
        for k in range(3):
            acc = None
            for m in range(3):
                d = dudp[a][m]
                h = dpdw[m][k]
                if d is zero or h is zero:
                    continue
                term = d * h
                acc = term if acc is None else acc + term
            Jc[a][k] = acc if acc is not None else zero
            Jc[a][3 + k] = dudp[a][k]  # dp/dv = I
            # dp/dX = R: Jl[a][k] = sum_m dudp[a][m] * R[:, m, k]
            accl = None
            for m in range(3):
                d = dudp[a][m]
                if d is zero:
                    continue
                term = d * state.R[:, m, k][:, None]
                accl = term if accl is None else accl + term
            Jl[a][k] = accl if accl is not None else zero
    r = [r_T[:, 0, :], r_T[:, 1, :]]
    return Jc, Jl, r, w



class NormalEquations(NamedTuple):
    """All blocks of the (damped) BA normal equations for one linearization."""

    H_cc: jax.Array  # [C, 6, 6]
    H_ll: jax.Array  # [L, 3, 3]
    W: jax.Array  # [C, L, 6, 3]
    b_c: jax.Array  # [C, 6]
    b_l: jax.Array  # [L, 3]



def _normal_eq_lists(state: BAState, problem: BAProblem):
    """Normal-equation blocks over [C, L] lane arrays.

    Returns (H_cc [C, 6, 6], Hll [3][3] of [L], W [6][3] of [C, L],
    b_c [C, 6], b_l [3] of [L]). The Huber weight is split as sqrt(w) onto
    both operands; camera-side Gram entries are lane reductions of [C, L]
    products (36 + 6 reduces), landmark-side ones additionally sum over
    the C sublanes.
    """
    Jc, Jl, r, w = _jacobians_lists(state, problem)
    sw = jnp.sqrt(w)
    Jcw = [[Jc[a][i] * sw for i in range(6)] for a in range(2)]
    Jlw = [[Jl[a][k] * sw for k in range(3)] for a in range(2)]
    rw = [r[0] * sw, r[1] * sw]

    # H_cc [C, 6, 6]: symmetric; 21 unique entries, lane-reduced.
    ent = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i, 6):
            s = sum((Jcw[a][i] * Jcw[a][j]).sum(-1) for a in range(2))
            ent[i][j] = s
            ent[j][i] = s
    H_cc = jnp.stack([jnp.stack(row, -1) for row in ent], -2)  # [C, 6, 6]

    # b_c [C, 6]
    b_c = -jnp.stack(
        [sum((Jcw[a][i] * rw[a]).sum(-1) for a in range(2)) for i in range(6)],
        -1,
    )

    # H_ll [3][3] of [L] (sum over cameras and both residual rows)
    Hll = [[None] * 3 for _ in range(3)]
    for k in range(3):
        for m in range(k, 3):
            s = sum((Jlw[a][k] * Jlw[a][m]).sum(0) for a in range(2))
            Hll[k][m] = s
            Hll[m][k] = s

    # W [6][3] of [C, L]
    W = [
        [sum(Jcw[a][i] * Jlw[a][k] for a in range(2)) for k in range(3)]
        for i in range(6)
    ]

    # b_l [3] of [L]
    b_l = [
        -sum((Jlw[a][k] * rw[a]).sum(0) for a in range(2)) for k in range(3)
    ]
    return H_cc, Hll, W, b_c, b_l


def build_normal_equations(state: BAState, problem: BAProblem) -> NormalEquations:
    """Public textbook-layout view of :func:`_normal_eq_lists`."""
    H_cc, Hll, W, b_c, b_l = _normal_eq_lists(state, problem)
    # stack order: leaves are [L] -> rows [L, 3(m)] -> [L, 3(k), 3(m)]
    H_ll = jnp.stack([jnp.stack(row, -1) for row in Hll], -2)
    W_arr = jnp.stack(
        [jnp.stack(row, -1) for row in W], -2
    )  # [C, L, 6, 3]
    b_l_arr = jnp.stack(b_l, -1)  # [L, 3]
    return NormalEquations(H_cc, H_ll, W_arr, b_c, b_l_arr)


def _inv3_lists(M, lam):
    """Closed-form inverse of the damped 3x3 blocks; M = [3][3] of [L]."""
    a, b, c = M[0][0] + lam, M[0][1], M[0][2]
    d, e, f = M[1][0], M[1][1] + lam, M[1][2]
    g, h, i = M[2][0], M[2][1], M[2][2] + lam
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    inv = 1.0 / det
    return [
        [A * inv, B * inv, Cc * inv],
        [D * inv, E * inv, F * inv],
        [G * inv, H * inv, I * inv],
    ]


def _schur_lists(
    H_cc, Hll, W, b_c, b_l, lam, fixed, axis_name=None
):
    """Schur complement over list blocks.

    Returns (S [C, 6, C, 6], b_s [C, 6], Hll_inv [3][3] of [L]). The only
    stacked tensors are the two [C*6, 3L] operands of the single MXU
    matmul that performs the L-contraction; everything else is [C, L] /
    [L] lane math. With ``axis_name`` (landmark-sharded shard_map) the
    camera-side pieces are psum'd — the reduce of the reduced-camera-system
    assembly, compiled to ICI collectives.
    """
    C = H_cc.shape[0]
    hp = lax.Precision.HIGHEST
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    Hinv = _inv3_lists(Hll, lam)

    # WHinv[i][k] = sum_j W[i][j] * Hinv[j][k]  ([C, L] leaves)
    WHinv = [
        [
            sum(W[i][j] * Hinv[j][k][None, :] for j in range(3))
            for k in range(3)
        ]
        for i in range(6)
    ]
    # S_off = -sum_l WHinv W^T as ONE [C*6, 3L] x [3L, C*6] MXU matmul.
    L = Hll[0][0].shape[-1]
    A = jnp.stack(
        [jnp.stack([WHinv[i][k] for k in range(3)], 1) for i in range(6)], 1
    )  # [C, 6, 3, L]
    B = jnp.stack(
        [jnp.stack([W[i][k] for k in range(3)], 1) for i in range(6)], 1
    )
    A2 = A.reshape(C * 6, 3 * L)
    B2 = B.reshape(C * 6, 3 * L)
    S_off = -lax.dot_general(
        A2, B2, (((1,), (1,)), ((), ())), precision=hp
    ).reshape(C, 6, C, 6)
    blv = jnp.concatenate([b_l[0], b_l[1], b_l[2]])  # hstack? see ordering
    # A2 rows are (c, i); its columns are ordered (k, l): build b_l in the
    # same (k, l) order.
    bs_lm = jnp.matmul(A2, blv, precision=hp).reshape(C, 6)
    if axis_name is not None:
        S_off = lax.psum(S_off, axis_name)
        bs_lm = lax.psum(bs_lm, axis_name)
        H_cc = lax.psum(H_cc, axis_name)
        b_c = lax.psum(b_c, axis_name)
    idx = jnp.arange(C)
    S = S_off.at[idx, :, idx, :].add(H_cc + lam * eye6)
    b_s = b_c - bs_lm

    # Gauge: fixed cameras get identity rows/cols and zero rhs.
    free = (~fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S.at[idx, :, idx, :].add(eye6 * (1.0 - free)[:, None, None])
    b_s = b_s * free[:, None]
    return S, b_s, Hinv


def reduced_system(
    eqs: NormalEquations,
    lam: jax.Array,
    fixed: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Textbook-layout wrapper of :func:`_schur_lists`."""
    Hll = [[eqs.H_ll[:, k, m] for m in range(3)] for k in range(3)]
    W = [[eqs.W[:, :, i, k] for k in range(3)] for i in range(6)]
    b_l = [eqs.b_l[:, k] for k in range(3)]
    S, b_s, Hinv = _schur_lists(
        eqs.H_cc, Hll, W, eqs.b_c, b_l, lam, fixed, axis_name
    )
    Hll_inv = jnp.stack(
        [jnp.stack(row, -1) for row in Hinv], -2
    )  # [L, 3, 3]
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


def _backsub_lists(W, Hinv, b_l, dx_c):
    """Landmark updates dX [L, 3] from list blocks and camera updates."""
    rhs = []
    for k in range(3):
        wt = sum(
            (W[i][k] * dx_c[:, i, None]).sum(0) for i in range(6)
        )  # [L]
        rhs.append(b_l[k] - wt)
    dX = [
        sum(Hinv[k][j] * rhs[j] for j in range(3)) for k in range(3)
    ]
    return jnp.stack(dX, -1)  # [L, 3]


def back_substitute(
    eqs: NormalEquations, Hll_inv: jax.Array, dx_c: jax.Array
) -> jax.Array:
    """Landmark updates dX [L, 3] given camera updates (textbook layout)."""
    W = [[eqs.W[:, :, i, k] for k in range(3)] for i in range(6)]
    b_l = [eqs.b_l[:, k] for k in range(3)]
    Hinv = [[Hll_inv[:, k, m] for m in range(3)] for k in range(3)]
    return _backsub_lists(W, Hinv, b_l, dx_c)


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
    H_cc, Hll, W, b_c, b_l = _normal_eq_lists(state, problem)
    S, b_s, Hinv = _schur_lists(
        H_cc, Hll, W, b_c, b_l, lam, problem.fixed_cameras, axis_name
    )
    dx_c = solve_reduced_dense(S, b_s)
    dX = _backsub_lists(W, Hinv, b_l, dx_c)
    new_state = apply_updates(state, dx_c, dX, problem.fixed_cameras)
    return new_state, cost(new_state, problem, axis_name)


@precise
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
        Jc, _, r, w = _jacobians_lists(st, problem)  # leaves [1, L]
        sw = jnp.sqrt(w)
        Jcw = [[Jc[a][i] * sw for i in range(6)] for a in range(2)]
        rw = [r[0] * sw, r[1] * sw]
        ent = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                s = sum((Jcw[a][i] * Jcw[a][j]).sum() for a in range(2))
                ent[i][j] = s
                ent[j][i] = s
        H = jnp.stack(
            [jnp.stack(row) for row in ent]
        ) + lam * jnp.eye(6)
        b = -jnp.stack(
            [sum((Jcw[a][i] * rw[a]).sum() for a in range(2)) for i in range(6)]
        )
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


@precise
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
