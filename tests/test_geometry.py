"""Two-view geometry: 8-point, Sampson, RANSAC, pose recovery, triangulation.

Synthetic-scene tests: random 3D points, known (R, t), projections with and
without outliers — estimated geometry must recover ground truth (up to the
scale/sign ambiguities inherent to E).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvsteer_tpu.geometry import (
    eight_point_essential,
    ransac_essential,
    recover_pose,
    sampson_error,
    triangulate,
)
from cvsteer_tpu.geometry.pose import decompose_essential


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _synthetic_scene(n=64, outliers=0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))  # points in cam-1 frame
    R = _rotmat([0.2, 1.0, 0.1], 0.15)
    t = np.array([0.5, 0.05, 0.02])
    t = t / np.linalg.norm(t)

    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]

    if noise:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        x2[idx] += rng.uniform(0.05, 0.3, (outliers, 2)) * rng.choice([-1, 1], (outliers, 2))
    # ground-truth E = [t]_x R
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return (
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        R,
        t,
        E / np.linalg.norm(E) * np.sqrt(2),
    )


def _e_dist(E1, E2):
    """Distance up to sign: min over +-."""
    E1 = np.asarray(E1) / np.linalg.norm(E1)
    E2 = np.asarray(E2) / np.linalg.norm(E2)
    return min(np.linalg.norm(E1 - E2), np.linalg.norm(E1 + E2))


def test_eight_point_exact():
    x1, x2, R, t, E_gt = _synthetic_scene(n=32)
    E = eight_point_essential(x1, x2, jnp.ones(32))
    assert _e_dist(E, E_gt) < 1e-4
    err = np.asarray(sampson_error(E, x1, x2))
    assert err.max() < 1e-8


def test_sampson_error_separates_outliers():
    x1, x2, _, _, E_gt = _synthetic_scene(n=64, outliers=16, seed=1)
    err = np.asarray(sampson_error(jnp.asarray(E_gt, jnp.float32), x1, x2))
    order = np.argsort(err)
    # the 48 smallest errors are the inliers
    assert err[order[47]] < 1e-8 and err[order[48]] > 1e-6


def test_ransac_rejects_outliers():
    n, n_out = 128, 40
    x1, x2, R, t, E_gt = _synthetic_scene(n=n, outliers=n_out, noise=1e-4, seed=2)
    res = jax.jit(
        lambda a, b, v, k: ransac_essential(a, b, v, k, num_hypotheses=256)
    )(x1, x2, jnp.ones(n, bool), jax.random.key(0))
    assert int(res.num_inliers) >= n - n_out - 5
    assert _e_dist(res.E, E_gt) < 5e-3
    inl = np.asarray(res.inliers)
    assert inl.sum() == int(res.num_inliers)


def test_ransac_respects_valid_mask():
    n = 64
    x1, x2, *_ = _synthetic_scene(n=n, seed=3)
    valid = jnp.arange(n) < 32
    # corrupt the masked-out half completely
    x2 = x2.at[32:].add(10.0)
    res = ransac_essential(x1, x2, valid, jax.random.key(1), num_hypotheses=128)
    assert not bool(np.asarray(res.inliers)[32:].any())
    assert int(res.num_inliers) >= 28


def test_decompose_and_recover_pose():
    n = 64
    x1, x2, R_gt, t_gt, E_gt = _synthetic_scene(n=n, seed=4)
    E = jnp.asarray(E_gt, jnp.float32)
    pose = recover_pose(E, x1, x2, jnp.ones(n, bool))
    assert int(pose.num_good) >= n - 2
    np.testing.assert_allclose(np.asarray(pose.R), R_gt, atol=1e-3)
    # translation up to scale (E fixes it to unit norm) and sign resolved by cheirality
    np.testing.assert_allclose(np.asarray(pose.t), t_gt, atol=1e-3)


def test_triangulation_accuracy():
    rng = np.random.default_rng(5)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (32, 3))
    R = _rotmat([0, 1, 0], 0.1)
    t = np.array([1.0, 0.0, 0.0])
    x1 = jnp.asarray(X[:, :2] / X[:, 2:3], jnp.float32)
    X2 = X @ R.T + t
    x2 = jnp.asarray(X2[:, :2] / X2[:, 2:3], jnp.float32)
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    P2 = jnp.asarray(np.concatenate([R, t[:, None]], 1), jnp.float32)
    Xhat = np.asarray(triangulate(P1, P2, x1, x2))
    np.testing.assert_allclose(Xhat, X, atol=1e-2)


def test_full_two_view_pipeline_scale_resolved():
    """RANSAC E -> recover pose: rotation exact, translation direction exact."""
    n = 96
    x1, x2, R_gt, t_gt, _ = _synthetic_scene(n=n, outliers=20, noise=2e-4, seed=6)
    res = ransac_essential(x1, x2, jnp.ones(n, bool), jax.random.key(2))
    pose = recover_pose(res.E, x1, x2, res.inliers)
    np.testing.assert_allclose(np.asarray(pose.R), R_gt, atol=2e-2)
    cos = abs(float(np.dot(np.asarray(pose.t), t_gt)))
    assert cos > 0.995


def test_undistort_matches_cv2_oracle():
    """normalize_pixels with Brown-Conrady coefficients must match
    cv2.undistortPoints (the calibration-transfer contract)."""
    import cv2
    import numpy as np

    from cvsteer_tpu.geometry.camera import (
        Intrinsics,
        normalize_pixels,
        undistort_normalized_np,
    )

    rng = np.random.default_rng(0)
    dist = (-0.28, 0.07, 0.0002, -0.0003, 0.02)  # TUM-fr1-like radial
    K = Intrinsics(517.3, 516.5, 318.6, 255.3, dist=dist)
    pix = np.stack(
        [rng.uniform(20, 460, 200), rng.uniform(20, 620, 200)], -1
    ).astype(np.float32)  # (row, col)

    ours = np.asarray(normalize_pixels(jnp.asarray(pix), K))

    Kmat = np.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1]])
    cvpts = pix[:, ::-1].reshape(-1, 1, 2).astype(np.float64)  # (x=col, y=row)
    ref = cv2.undistortPoints(cvpts, Kmat, np.array(dist)).reshape(-1, 2)
    # tolerance bounded by cv2's OWN convergence: its fixed 5-iteration
    # inversion leaves ~8e-5 forward-model residual at the image corners,
    # while ours converges to ~6e-8 (verified by re-distorting both)
    np.testing.assert_allclose(ours, ref, atol=3e-4)

    from cvsteer_tpu.geometry.camera import distort_normalized

    fwd = np.asarray(distort_normalized(jnp.asarray(ours), dist))
    xd = (pix[:, 1] - K.cx) / K.fx
    yd = (pix[:, 0] - K.cy) / K.fy
    np.testing.assert_allclose(fwd, np.stack([xd, yd], -1), atol=5e-6)

    # numpy twin used by the host-side VO path agrees with the jax version
    xd = (pix[:, 1] - K.cx) / K.fx
    yd = (pix[:, 0] - K.cy) / K.fy
    ours_np = undistort_normalized_np(np.stack([xd, yd], -1), dist)
    np.testing.assert_allclose(ours_np, ours, atol=1e-6)


def test_distort_undistort_roundtrip_and_pinhole_noop():
    import numpy as np

    from cvsteer_tpu.geometry.camera import (
        Intrinsics,
        distort_normalized,
        normalize_pixels,
        pixels_from_normalized,
        undistort_normalized,
    )

    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, (300, 2)).astype(np.float32))
    dist = (-0.2, 0.05, 0.001, -0.001, 0.0)
    rt = undistort_normalized(distort_normalized(xy, dist), dist)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(xy), atol=1e-6)

    # zero coefficients: exact identity, and pixel round-trip preserved
    K0 = Intrinsics(500.0, 500.0, 320.0, 240.0)
    assert not K0.has_distortion
    pix = pixels_from_normalized(xy, K0)
    np.testing.assert_allclose(
        np.asarray(normalize_pixels(pix, K0)), np.asarray(xy), atol=1e-5
    )
    Kd = Intrinsics(500.0, 500.0, 320.0, 240.0, dist=dist)
    pixd = pixels_from_normalized(xy, Kd)
    np.testing.assert_allclose(
        np.asarray(normalize_pixels(pixd, Kd)), np.asarray(xy), atol=1e-5
    )
