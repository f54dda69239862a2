"""Essential-matrix estimation: normalized 8-point + fixed-iteration RANSAC.

TPU-shaped design (SURVEY.md section 7 "hard parts"): RANSAC is a vmap over
a static number of hypotheses; minimal-set sampling uses a masked random
top-k (no rejection loops); the solver is an eigh of the 9x9 normal matrix
(no per-hypothesis SVD of a tall A). Everything is masked, fixed-size, and
jit-compatible.

Point conventions: inputs are *normalized camera coordinates* (x, y)
[N, 2] — convert pixels via cvsteer_tpu.geometry.camera.normalize_pixels.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from cvsteer_tpu.utils.precision import precise


def _homogeneous(xy: jax.Array) -> jax.Array:
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def _epipolar_rows(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Rows a_i with a_i . vec(E) = x2_i^T E x1_i = 0; [N, 9].

    vec(E) ordering is row-major: E = [[e0,e1,e2],[e3,e4,e5],[e6,e7,e8]].
    """
    p1 = _homogeneous(x1)  # [N, 3]
    p2 = _homogeneous(x2)
    return (p2[:, :, None] * p1[:, None, :]).reshape(p1.shape[0], 9)


def _smallest_eigvec_9(AtA: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of a symmetric 9x9."""
    w, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0]


def _project_to_essential(E: jax.Array) -> jax.Array:
    """Nearest essential matrix: singular values -> (s, s, 0), s = mean."""
    U, S, Vt = jnp.linalg.svd(E)
    s = 0.5 * (S[..., 0] + S[..., 1])
    S_new = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return (U * S_new[..., None, :]) @ Vt


@precise
def eight_point_essential(
    x1: jax.Array, x2: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted 8-point essential matrix from normalized correspondences.

    x1, x2: [N, 2]; weights: [N] (0 excludes a row). Returns E [3, 3] with
    ||E||_F = sqrt(2) scaling (unit singular values).

    Minimal-set solver (8 active rows): eigh of the 9x9 normal matrix —
    the null space of an exactly-rank-8 system is clean, and the batched
    9x9 eigh is what makes 512 vmapped hypotheses cheap. For LARGE
    well-fitting row sets use :func:`eight_point_essential_svd`: squaring
    to AtA squares the condition number, and on TPU the fp32 eigh cannot
    resolve the near-null eigenpair (measured: the bootstrap refit on 187
    inliers returned an E with 7x the Sampson error of the CPU solution —
    the round-3 fleet-tail root cause, with bf16 matmul defaults).
    """
    rows = _epipolar_rows(x1, x2)  # [N, 9]
    wrows = rows * weights[:, None]
    AtA = wrows.T @ rows  # [9, 9] — weights applied once (W^1; LS uses W^2, equivalent up to scaling for 0/1 masks)
    e = _smallest_eigvec_9(AtA)
    E = e.reshape(3, 3)
    return _project_to_essential(E)


@precise
def eight_point_essential_svd(
    x1: jax.Array, x2: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted 8-point via SVD of the row matrix (cond(A) = sqrt(cond(AtA))).

    Numerically robust form for over-determined refits; see
    :func:`eight_point_essential` for when each applies.
    """
    rows = _epipolar_rows(x1, x2)  # [N, 9]
    wrows = rows * weights[:, None]
    _, _, Vt = jnp.linalg.svd(wrows, full_matrices=False)
    E = Vt[..., -1, :].reshape(3, 3)
    return _project_to_essential(E)


@precise
def sampson_error(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) error of x2^T E x1 = 0; [N]."""
    p1 = _homogeneous(x1)
    p2 = _homogeneous(x2)
    Ep1 = p1 @ E.T  # == (E @ p1^T)^T, [N, 3]
    Etp2 = p2 @ E  # [N, 3]
    num = jnp.sum(p2 * Ep1, axis=-1) ** 2
    den = Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2 + Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


class RansacResult(NamedTuple):
    E: jax.Array  # [3, 3] best essential matrix (refit on inliers)
    inliers: jax.Array  # [N] bool
    num_inliers: jax.Array  # scalar int32
    best_error: jax.Array  # mean Sampson error over inliers


def _sample_minimal_sets(
    key: jax.Array, valid: jax.Array, num_sets: int, set_size: int
) -> jax.Array:
    """[num_sets, set_size] random distinct indices drawn from valid slots.

    Random-key top-k: invalid slots get +inf keys and are never selected
    (provided >= set_size valid points exist — caller's contract).
    """
    n = valid.shape[0]
    u = jax.random.uniform(key, (num_sets, n))
    u = jnp.where(valid[None, :], u, jnp.inf)
    _, idx = lax.top_k(-u, set_size)
    return idx


def _sampson_residual(e: jax.Array, p1: jax.Array, p2: jax.Array, w: jax.Array):
    """Signed, weighted Sampson residual of vec(E) = e; [N]."""
    E = e.reshape(3, 3)
    Ep1 = p1 @ E.T
    Etp2 = p2 @ E
    num = jnp.sum(p2 * Ep1, axis=-1)
    den = jnp.sqrt(
        Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2 + Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2
        + 1e-18
    )
    return w * num / den


@precise
def polish_essential(
    E: jax.Array, x1: jax.Array, x2: jax.Array, weights: jax.Array,
    *, iterations: int = 6,
) -> jax.Array:
    """Local Gauss-Newton refinement of E on weighted correspondences
    (the LO in LO-RANSAC): minimize the summed squared Sampson residual
    over vec(E), reprojecting onto the essential manifold each step and
    accepting only cost-decreasing steps. Deterministic descent makes the
    final model insensitive to which near-optimal RANSAC seed won (CPU vs
    TPU fp32 threshold flips), and strictly improves the fit everywhere.
    """
    p1 = _homogeneous(x1)
    p2 = _homogeneous(x2)
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, E.dtype))

    def norm_e(e):
        return e * (sqrt2 / jnp.maximum(jnp.linalg.norm(e), 1e-12))

    def cost(e):
        r = _sampson_residual(e, p1, p2, weights)
        return jnp.sum(r * r)

    def step(carry, _):
        e, c_e = carry  # carry the accepted cost: one residual eval/step
        r = _sampson_residual(e, p1, p2, weights)
        J = jax.jacfwd(lambda ee: _sampson_residual(ee, p1, p2, weights))(e)
        H = J.T @ J + 1e-10 * jnp.eye(9, dtype=e.dtype)
        g = J.T @ r
        e_new = e - jnp.linalg.solve(H, g)
        e_new = norm_e(
            _project_to_essential(e_new.reshape(3, 3)).reshape(9)
        )
        c_new = cost(e_new)
        better = c_new < c_e
        return (
            jnp.where(better, e_new, e), jnp.where(better, c_new, c_e)
        ), None

    e0 = norm_e(E.reshape(9))
    (e, _), _ = lax.scan(step, (e0, cost(e0)), None, length=iterations)
    return e.reshape(3, 3)


@precise
def ransac_essential(
    x1: jax.Array,
    x2: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    num_hypotheses: int = 512,
    inlier_threshold: float = 1e-5,
    refit_rounds: int = 3,
) -> RansacResult:
    """Fixed-iteration RANSAC for E from masked correspondences.

    x1, x2: [N, 2] normalized coords; valid: [N] mask.
    ``inlier_threshold`` is on the Sampson error in normalized coordinates —
    approximately (pixel distance to the epipolar line / focal)^2, so 1e-5
    is ~1.6 px at f=500. Too loose a bound admits near-epipolar outliers
    that visibly bend the refit translation.

    All ``num_hypotheses`` minimal problems are solved in one vmapped batch
    (9x9 eigh each) — the TPU replacement for the sequential
    hypothesize-and-verify loop.
    """
    valid_f = valid.astype(x1.dtype)

    idx = _sample_minimal_sets(key, valid, num_hypotheses, 8)  # [S, 8]

    def solve_one(sample_idx):
        w = jnp.zeros_like(valid_f).at[sample_idx].set(1.0)
        return eight_point_essential(x1, x2, w)

    Es = jax.vmap(solve_one)(idx)  # [S, 3, 3]

    errs = jax.vmap(lambda E: sampson_error(E, x1, x2))(Es)  # [S, N]
    inl = (errs < inlier_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    # Inlier count with a continuous MSAC tie-break, followed by a local
    # Gauss-Newton polish (LO-RANSAC) below. Counts are small integers with
    # frequent ties; on near-degenerate bootstrap geometry the plain argmax
    # tie-break picks platform-dependent hypotheses (fp32 reduction order
    # flips single threshold crossings), which round 3 measured as
    # 0.02-vs-0.14 ATE CPU/TPU divergences. The tie term is normalized to
    # (0, 1) so it only orders within a count tie (pure MSAC and
    # margin-constrained MSAC were both tried: they prefer marginal models
    # on heavily contaminated match sets); seed flips that survive the
    # tie-break are then absorbed by the polish, which descends both
    # platforms into the same local optimum.
    msac = jnp.sum(
        jnp.where(valid[None, :], jnp.minimum(errs, inlier_threshold), 0.0),
        axis=1,
    )
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    tie = msac / (inlier_threshold * n_valid.astype(msac.dtype) + 1e-30)
    best = jnp.argmax(counts.astype(msac.dtype) - tie)
    E = Es[best]
    inliers = inl[best]

    # Iterative refit on inliers: SVD-of-rows form — the eigh-of-AtA form
    # is numerically inadequate for large well-fitting sets on TPU (see
    # eight_point_essential docstring).
    def refit(_, carry):
        E, inliers = carry
        w = inliers.astype(x1.dtype)
        E = eight_point_essential_svd(x1, x2, w)
        err = sampson_error(E, x1, x2)
        inliers = (err < inlier_threshold) & valid
        return E, inliers

    E, inliers = lax.fori_loop(0, refit_rounds, refit, (E, inliers))

    # LO-RANSAC polish on the final inlier set; keep the better model.
    E_lo = polish_essential(E, x1, x2, inliers.astype(x1.dtype))
    err_lo = sampson_error(E_lo, x1, x2)
    inl_lo = (err_lo < inlier_threshold) & valid
    better = jnp.sum(inl_lo) >= jnp.sum(inliers)
    E = jnp.where(better, E_lo, E)
    inliers = jnp.where(better, inl_lo, inliers)

    err = sampson_error(E, x1, x2)
    num = jnp.sum(inliers)
    mean_err = jnp.sum(jnp.where(inliers, err, 0.0)) / jnp.maximum(num, 1)
    return RansacResult(E=E, inliers=inliers, num_inliers=num, best_error=mean_err)
