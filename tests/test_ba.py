"""Windowed Schur-complement bundle adjustment on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.ba import (
    BAProblem,
    BAState,
    bundle_adjust,
    build_normal_equations,
    cost,
    residuals,
)


def _synthetic_ba(C=6, L=64, noise=0.0, pose_err=0.0, point_err=0.0, seed=0,
                  drop=0.0, huber=0.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-3, -3, 6], [3, 3, 14], (L, 3))

    Rs, ts = [], []
    for c in range(C):
        w = rng.normal(0, 0.05, 3)
        Rs.append(np.asarray(se3.exp_so3(jnp.asarray(w, jnp.float32))))
        ts.append(np.array([0.4 * c - 0.2 * C, 0.02 * c, 0.01 * c]))
    R = np.stack(Rs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)

    p = np.einsum("cij,lj->cli", R, X) + t[:, None, :]
    uv = p[..., :2] / p[..., 2:3]
    mask = p[..., 2] > 0.5
    if drop:
        mask &= rng.uniform(size=mask.shape) > drop
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)

    # perturb initial estimate
    R0 = R.copy()
    t0 = t.copy()
    X0 = X + rng.normal(0, point_err, X.shape) if point_err else X.copy()
    if pose_err:
        for c in range(1, C):  # camera 0 fixed (gauge)
            dw = rng.normal(0, pose_err, 3)
            R0[c] = np.asarray(se3.exp_so3(jnp.asarray(dw, jnp.float32))) @ R0[c]
            t0[c] = t0[c] + rng.normal(0, pose_err, 3)

    fixed = np.zeros(C, bool)
    fixed[0] = True
    problem = BAProblem(
        uv=jnp.asarray(uv, jnp.float32),
        mask=jnp.asarray(mask),
        fixed_cameras=jnp.asarray(fixed),
        huber_delta=huber,
    )
    gt = BAState(jnp.asarray(R), jnp.asarray(t), jnp.asarray(X, jnp.float32))
    init = BAState(jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0, jnp.float32))
    return problem, gt, init


def test_cost_zero_at_ground_truth():
    problem, gt, _ = _synthetic_ba()
    assert float(cost(gt, problem)) < 1e-10


def test_jacobians_match_finite_differences():
    problem, gt, _ = _synthetic_ba(C=3, L=8)

    def cost_of_params(flat):
        w = flat[: 3 * 3].reshape(3, 3)
        dt = flat[9 : 9 + 9].reshape(3, 3)
        dX = flat[18:].reshape(8, 3)
        st = BAState(
            R=se3.exp_so3(w) @ gt.R, t=gt.t + dt, X=gt.X + dX
        )
        return cost(st, problem)

    flat0 = jnp.zeros(3 * 3 + 3 * 3 + 8 * 3)
    g_auto = jax.grad(cost_of_params)(flat0)

    # our analytic blocks: b = -J^T r evaluated at a perturbed state
    problem2, gt2, init2 = _synthetic_ba(C=3, L=8, pose_err=0.02, point_err=0.05)
    eqs = build_normal_equations(init2, problem2)

    def cost2(flat):
        w = flat[:9].reshape(3, 3)
        dt = flat[9:18].reshape(3, 3)
        dX = flat[18:].reshape(8, 3)
        st = BAState(R=se3.exp_so3(w) @ init2.R, t=init2.t + dt, X=init2.X + dX)
        return cost(st, problem2)

    g = jax.grad(cost2)(jnp.zeros(42))
    np.testing.assert_allclose(np.asarray(g[:9]).reshape(3, 3), -np.asarray(eqs.b_c[:, :3]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[9:18]).reshape(3, 3), -np.asarray(eqs.b_c[:, 3:]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[18:]).reshape(8, 3), -np.asarray(eqs.b_l), rtol=1e-3, atol=1e-5)


def test_ba_converges_from_perturbed_init():
    problem, gt, init = _synthetic_ba(C=6, L=64, pose_err=0.03, point_err=0.1, drop=0.3)
    c0 = float(cost(init, problem))
    final, stats = jax.jit(lambda s, p: bundle_adjust(s, p, iterations=25))(init, problem)
    cf = float(stats.cost)
    assert cf < 1e-9 * max(c0, 1.0) or cf < 1e-10, f"cost {c0} -> {cf}"
    # rotations recovered (gauge anchored at camera 0)
    ang = np.asarray(se3.rotation_geodesic(final.R, gt.R))
    assert ang.max() < 1e-3


def test_ba_with_noise_reaches_noise_floor():
    noise = 1e-3
    problem, gt, init = _synthetic_ba(
        C=6, L=96, noise=noise, pose_err=0.02, point_err=0.05, seed=3
    )
    final, stats = bundle_adjust(init, problem, iterations=25)
    n_obs = float(jnp.sum(problem.mask))
    rms = np.sqrt(2 * float(stats.cost) / (2 * n_obs))
    assert rms < 1.5 * noise, f"residual rms {rms} vs noise {noise}"
    ang = np.asarray(se3.rotation_geodesic(final.R, gt.R))
    assert ang.max() < 5e-3


def test_ba_huber_handles_outliers():
    problem, gt, init = _synthetic_ba(
        C=5, L=64, noise=5e-4, pose_err=0.02, point_err=0.05, seed=4
    )
    # corrupt 10% of observations hugely
    rng = np.random.default_rng(7)
    uv = np.asarray(problem.uv).copy()
    m = np.asarray(problem.mask)
    out_mask = (rng.uniform(size=m.shape) < 0.1) & m
    uv[out_mask] += rng.uniform(0.2, 0.5, (out_mask.sum(), 2))
    prob_out = problem._replace(uv=jnp.asarray(uv), huber_delta=3e-3)

    final, stats = bundle_adjust(init, prob_out, iterations=30)
    ang = np.asarray(se3.rotation_geodesic(final.R, gt.R))
    assert ang.max() < 2e-2, f"rotation error {ang.max()}"


def test_fixed_camera_untouched():
    problem, gt, init = _synthetic_ba(C=4, L=48, pose_err=0.05, point_err=0.1)
    final, _ = bundle_adjust(init, problem, iterations=10)
    np.testing.assert_array_equal(np.asarray(final.R[0]), np.asarray(init.R[0]))
    np.testing.assert_array_equal(np.asarray(final.t[0]), np.asarray(init.t[0]))
