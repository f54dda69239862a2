"""City-loop sequence generator (io.synth) + short full-stack VO sanity.

The KITTI-00-scale SLAM evidence (scripts/slam_scale_run.py ->
SLAM_r04.json) drives thousands of frames; these tests pin the pieces at
suite-friendly size: renderer determinism/geometry, and a short
image-in -> trajectory-out VO run with the tuned forward-motion config
(upright descriptors + ray-angle triangulation gate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvsteer_tpu.io.synth import CityLoop


def test_cityloop_deterministic_and_geometry():
    seq = CityLoop(n_frames=200, laps=1.0)
    a = seq.render(17)
    b = seq.render(17)
    assert a.dtype == np.uint8 and a.shape == (240, 320)
    assert (a == b).all()  # reproducible from (seed, params)
    assert a.std() > 30  # feature-rich, not flat

    # poses are valid world->camera transforms on a closed circuit
    R0, t0 = seq.pose(0)
    assert np.allclose(R0 @ R0.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R0) - 1.0) < 1e-5
    # exactly one lap returns to the start (same arc-length phase)
    per_frames = seq._perimeter / seq._step
    k2 = int(round(per_frames))
    R2, t2 = seq.pose(k2)
    c0 = -R0.T @ t0
    c2 = -R2.T @ t2
    assert np.linalg.norm(c0 - c2) < 0.5  # sub-frame phase offset
    # camera stays inside the street corridor (between the wall squares)
    for k in range(0, 200, 25):
        R, t = seq.pose(k)
        c = -R.T @ t
        assert abs(c[1] + seq._cam_h) < 1e-6  # constant height
        r_inf = max(abs(c[0]), abs(c[2]))
        assert seq._L / 2 - 4.0 - 2.5 < r_inf < seq._L / 2 + 2.5


def test_cityloop_vo_short():
    """60 frames of forward driving: the tuned config must track with a
    healthy inlier count and cm-to-dm accuracy (the full-scale artifact is
    scripts/slam_scale_run.py; this pins the pipeline at suite size)."""
    from cvsteer_tpu.features.frontend import FrontendConfig
    from cvsteer_tpu.geometry.camera import Intrinsics
    from cvsteer_tpu.slam import vo as hostvo
    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.vo import VOConfig
    from cvsteer_tpu.slam.vo_device import DeviceVO

    N = 60
    seq = CityLoop(n_frames=N, laps=0.02)
    cfg = VOConfig(
        intrinsics=Intrinsics(*seq.intrinsics4),
        frontend=FrontendConfig(upright_desc=True),
        kf_max_gap=3, window=8, track_min_landmarks=40,
        min_parallax=0.03, match_ratio=0.80, ba_iterations=25,
        tri_min_ray_angle_deg=0.35, max_landmarks=16384,
    )
    vo = DeviceVO(cfg)
    trk = []
    for k in range(N):
        feats = hostvo._extract_features_jit(
            jnp.asarray(seq.render(k), jnp.float32), cfg.frontend
        )
        if vo.map is None:
            vo.process_frame(feats)
        else:
            out = jax.device_get(vo.issue(feats))
            vo.complete(feats, out)
            trk.append(int(out.n_tracked))
    st = vo.finalize()
    assert st.initialized and len(st.keyframes) >= 8
    assert np.mean(trk) > 60, f"mean inliers {np.mean(trk):.1f}"
    gt_R, gt_t = seq.gt_arrays()
    ids = [f for f, _, _ in st.trajectory]
    Rs, ts = st.poses()
    ate = float(ate_rmse(Rs, ts, gt_R[ids], gt_t[ids], align_scale=True))
    path = N * seq._step
    assert ate < 0.05 * path, f"ATE {ate:.3f} m over {path:.1f} m"
