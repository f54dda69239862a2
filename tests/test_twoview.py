"""Two-view reconstruction from rendered images (BASELINE config 3 e2e)."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.features.frontend import FrontendConfig
from cvsteer_tpu.geometry.camera import Intrinsics
from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.twoview import two_view_pose

H, W = 160, 240
FX = FY = 160.0
CX, CY = W / 2.0, H / 2.0
K = Intrinsics(FX, FY, CX, CY)


def _render(X, attrs, R, t):
    p = X @ R.T + t
    z = p[:, 2]
    u = FX * p[:, 0] / z + CX
    v = FY * p[:, 1] / z + CY
    img = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for k in range(len(X)):
        if z[k] < 0.5 or not (-10 < u[k] < W + 10 and -10 < v[k] < H + 10):
            continue
        amp, ang, s1, s2 = attrs[k]
        ca, sa = np.cos(ang), np.sin(ang)
        dx, dy = xs - u[k], ys - v[k]
        a = ca * dx + sa * dy
        b = -sa * dx + ca * dy
        img += amp * np.exp(-(a * a / (2 * s1 * s1) + b * b / (2 * s2 * s2)))
    return (img / max(img.max(), 1e-6) * 220.0 + 16.0).astype(np.float32)


def test_two_view_pose_from_images():
    rng = np.random.default_rng(5)
    n_pts = 120
    X = rng.uniform([-3, -2, 3], [3, 2, 9], (n_pts, 3)).astype(np.float32)
    attrs = np.stack(
        [
            rng.uniform(0.5, 1.0, n_pts),
            rng.uniform(0, np.pi, n_pts),
            rng.uniform(2.0, 3.2, n_pts),
            rng.uniform(0.8, 1.2, n_pts),
        ],
        1,
    )

    Ra = np.eye(3, dtype=np.float32)
    ta = np.zeros(3, np.float32)
    Rb_wc = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.06, 0.0], jnp.float32)))
    cb = np.array([0.8, 0.05, 0.1], np.float32)
    Rb = Rb_wc.T.astype(np.float32)
    tb = (-Rb @ cb).astype(np.float32)

    img_a = _render(X, attrs, Ra, ta)
    img_b = _render(X, attrs, Rb, tb)

    cfg = FrontendConfig(levels=2, keypoints_per_level=192, threshold=0.5)
    res = two_view_pose(jnp.asarray(img_a), jnp.asarray(img_b), K, cfg=cfg)

    assert int(res.num_inliers) >= 15
    # ground-truth relative pose a->b equals (Rb, tb) since a is identity
    ang = float(se3.rotation_geodesic(res.R, jnp.asarray(Rb)))
    assert ang < 0.02, f"rotation error {ang}"
    t_dir = np.asarray(res.t)
    gt_dir = tb / np.linalg.norm(tb)
    assert abs(float(np.dot(t_dir, gt_dir))) > 0.99
    # triangulated inliers sit inside the generating volume (scale = ||tb||)
    pts = np.asarray(res.points)[np.asarray(res.point_valid)]
    scale = np.linalg.norm(tb)
    pts_metric = pts * scale
    inside = (
        (pts_metric[:, 2] > 1.0) & (pts_metric[:, 2] < 15.0)
        & (np.abs(pts_metric[:, 0]) < 5) & (np.abs(pts_metric[:, 1]) < 4)
    )
    assert inside.mean() > 0.85
