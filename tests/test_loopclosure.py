"""Loop-closure detection + pose-graph correction (synthetic feature world)."""

import numpy as np
import jax.numpy as jnp
import pytest

import sys

sys.path.insert(0, "tests")
from test_vo import DESC_DIM, K, N_CAP, _make_world, _render_features

from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.loopclosure import (
    build_keyframe_graph,
    close_loops,
    find_loop_closures,
    keyframe_signature,
)
from cvsteer_tpu.slam.vo import Keyframe, VOConfig, VOState, init_vo


def _lookat_pose(c, target=np.zeros(3)):
    """World->camera pose for a camera at ``c`` looking at ``target``."""
    z = target - c
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Rwc = np.stack([x, y, z], axis=1)  # columns = camera axes in world
    R = Rwc.T.astype(np.float32)
    return R, (-R @ c).astype(np.float32)


def _state_with_keyframes(poses, X, desc, rng, drift=None):
    cfg = VOConfig(intrinsics=K)
    state = init_vo(cfg)
    for n, (R, t) in enumerate(poses):
        feats = _render_features(X, desc, R, t, rng, pix_noise=0.1)
        Rs, ts = (R, t) if drift is None else drift[n]
        state.keyframes.append(
            Keyframe(
                index=n,
                features=feats,
                R=np.asarray(Rs, np.float32),
                t=np.asarray(ts, np.float32),
                landmark_ids=np.full(N_CAP, -1, np.int64),
            )
        )
    state.initialized = True
    state.frame_count = len(poses)
    return state


@pytest.fixture(scope="module")
def loop_world():
    rng = np.random.default_rng(9)
    X = rng.uniform([-2, -1.5, -2], [2, 1.5, 2], (300, 3)).astype(np.float32)
    desc = rng.normal(size=(300, DESC_DIM)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return X, desc


def _circle_poses(n, radius=7.0):
    out = []
    for k in range(n):
        a = 2 * np.pi * k / n
        c = np.array([radius * np.sin(a), 0.0, -radius * np.cos(a)])
        out.append(_lookat_pose(c))
    return out


def test_signature_similarity(loop_world):
    """Views of the same scene score far above views of a different scene."""
    X, desc = loop_world
    rng = np.random.default_rng(1)
    R0, t0 = _circle_poses(12)[0]
    R1, t1 = _circle_poses(12)[1]
    f_a = _render_features(X, desc, R0, t0, rng, pix_noise=0.1)
    f_b = _render_features(X, desc, R1, t1, rng, pix_noise=0.1)

    rng2 = np.random.default_rng(99)
    desc2 = rng2.normal(size=desc.shape).astype(np.float32)
    desc2 /= np.linalg.norm(desc2, axis=1, keepdims=True)
    f_other = _render_features(X, desc2, R0, t0, rng, pix_noise=0.1)

    s_same = float(np.dot(keyframe_signature(f_a), keyframe_signature(f_b)))
    s_other = float(np.dot(keyframe_signature(f_a), keyframe_signature(f_other)))
    assert s_same > 0.8
    assert s_same > s_other + 0.3


def test_find_loop_closures_on_revisit(loop_world):
    """A trajectory that returns to its start must close 0 <-> last."""
    X, desc = loop_world
    rng = np.random.default_rng(2)
    poses = _circle_poses(12)
    poses.append(poses[0])  # revisit the start
    state = _state_with_keyframes(poses, X, desc, rng)

    closures = find_loop_closures(state, min_gap=6, min_inliers=20)
    assert closures, "no closure found on exact revisit"
    # every accepted closure's relative pose must match ground truth
    for c in closures:
        Ri, ti = poses[c.i]
        Rj, tj = poses[c.j]
        R_gt = Rj @ Ri.T
        t_gt = tj - R_gt @ ti
        assert float(se3.rotation_geodesic(jnp.asarray(c.R), jnp.asarray(R_gt))) < 0.05
        nb = np.linalg.norm(t_gt)
        if nb > 0.3:  # direction check only meaningful with real baseline
            cos = np.dot(c.t / np.linalg.norm(c.t), t_gt / nb)
            assert cos > 0.98
        else:
            assert np.linalg.norm(c.t) < 0.2  # rescaled to ~zero baseline


def test_close_loops_corrects_drift(loop_world):
    X, desc = loop_world
    rng = np.random.default_rng(3)
    poses = _circle_poses(12)
    poses.append(poses[0])

    # accumulate synthetic drift: each pose perturbed progressively
    drifted = []
    for n, (R, t) in enumerate(poses):
        s = n / len(poses)
        dR, dt = se3.exp_se3(
            jnp.asarray(
                np.concatenate([0.06 * s * np.ones(3) * [1, -1, 0.5], 0.4 * s * np.array([1, 0.3, -0.5])]),
                jnp.float32,
            )
        )
        Rn, tn = se3.compose(dR, dt, jnp.asarray(R), jnp.asarray(t))
        drifted.append((np.asarray(Rn), np.asarray(tn)))
    state = _state_with_keyframes(poses, X, desc, rng, drift=drifted)

    gt_R, gt_t = poses[-1]
    err_before = float(
        se3.rotation_geodesic(jnp.asarray(state.keyframes[-1].R), jnp.asarray(gt_R))
    )
    t_err_before = float(np.linalg.norm(state.keyframes[-1].t - gt_t))

    n_closed = close_loops(state, min_gap=6, min_inliers=20)
    assert n_closed >= 1
    # second round: re-detected closures rescale against corrected baselines
    close_loops(state, min_gap=6, min_inliers=20)

    err_after = float(
        se3.rotation_geodesic(jnp.asarray(state.keyframes[-1].R), jnp.asarray(gt_R))
    )
    t_err_after = float(np.linalg.norm(state.keyframes[-1].t - gt_t))
    assert err_after < 0.5 * err_before, f"rot {err_before:.3f} -> {err_after:.3f}"
    # monocular closures carry no translation magnitude and this state has
    # no landmark map (baseline-rescale fallback): expect a modest gain
    assert t_err_after < 0.85 * t_err_before, f"t {t_err_before:.3f} -> {t_err_after:.3f}"
    # anchor unchanged
    np.testing.assert_allclose(state.keyframes[0].R, drifted[0][0])


def test_false_closure_rejected(loop_world, monkeypatch):
    """A fabricated inconsistent closure must be rejected by the post-
    optimization residual check, leaving the state untouched."""
    import cvsteer_tpu.slam.loopclosure as lc

    X, desc = loop_world
    rng = np.random.default_rng(4)
    poses = _circle_poses(10)
    state = _state_with_keyframes(poses, X, desc, rng)
    R_before = [kf.R.copy() for kf in state.keyframes]

    bogus = lc.LoopClosure(
        i=0,
        j=9,
        R=np.asarray(se3.exp_so3(jnp.asarray([1.5, 0.0, 0.0], jnp.float32))),
        t=np.array([5.0, 5.0, 5.0], np.float32),
        num_inliers=100,
    )
    monkeypatch.setattr(lc, "find_loop_closures", lambda *a, **k: [bogus])
    n = lc.close_loops(state)
    assert n == 0
    for kf, R0 in zip(state.keyframes, R_before):
        np.testing.assert_array_equal(kf.R, R0)


def _inject_scale_drift(state, rate):
    """Apply progressive monocular scale drift to a real VO state.

    Emulates how drift manifests: keyframe k's local neighborhood stays
    internally consistent while the relative translation of each odometry
    step is scaled by (1+rate)^k, and every landmark follows the similarity
    of its anchoring (first-observer) keyframe — so the closure's depth-
    ratio scale measurement sees the genuine per-side map scales."""
    kfs = state.keyframes
    P = len(kfs)
    centers = [(-kf.R.T @ kf.t).astype(np.float64) for kf in kfs]
    s = [(1.0 + rate) ** k for k in range(P)]
    c_new = [centers[0]]
    for k in range(1, P):
        c_new.append(c_new[-1] + s[k - 1] * (centers[k] - centers[k - 1]))
    # landmarks move with their anchor keyframe's similarity
    anchor = {}
    for k, kf in enumerate(kfs):
        for lid in kf.landmark_ids[kf.landmark_ids >= 0]:
            anchor.setdefault(int(lid), k)
    for lid, k in anchor.items():
        X = state.landmarks[lid].astype(np.float64)
        state.landmarks[lid] = (c_new[k] + s[k] * (X - centers[k])).astype(
            np.float32
        )
    for k, kf in enumerate(kfs):
        kf.t = (-kf.R @ c_new[k]).astype(np.float32)
    # the TRAJECTORY drifts too (real drift lives in every tracked pose,
    # not only keyframes): each non-keyframe entry follows its reference
    # keyframe's similarity, and its stored relative anchor
    # (VOState.traj_ref) scales with the local map scale exactly as
    # tracking in the drifted world would have recorded it
    kf_by_frame = {kf.index: k for k, kf in enumerate(kfs)}
    for i, (f, R, t) in enumerate(state.trajectory):
        if f in kf_by_frame:
            k = kf_by_frame[f]
            state.trajectory[i] = (f, R, (-R @ c_new[k]).astype(np.float32))
        elif i < len(state.traj_ref) and state.traj_ref[i] is not None:
            ref, R_rel, t_rel, pidx, b_old = state.traj_ref[i]
            k = kf_by_frame.get(ref)
            if k is None:
                continue
            c = (-R.T @ t).astype(np.float64)
            c2 = c_new[k] + s[k] * (c - centers[k])
            state.trajectory[i] = (f, R, (-R @ c2).astype(np.float32))
            state.traj_ref[i] = (
                ref, R_rel, (s[k] * t_rel).astype(np.float32), pidx,
                b_old * (s[k - 1] if k >= 1 else s[k]),
            )
    return s[-1]


def _run_loop_vo(loop_world, n_frames=48):
    """Full VO (process_frame) around a circle that revisits its start."""
    from cvsteer_tpu.slam.vo import process_frame

    X, desc = loop_world
    rng = np.random.default_rng(11)
    cfg = VOConfig(
        intrinsics=K, kf_max_gap=4, window=6, track_min_landmarks=40,
        min_parallax=0.01,
    )
    state = init_vo(cfg)
    gt = []
    for k in range(n_frames):
        a = 2 * np.pi * (k / (n_frames - 1))
        c = np.array([7.0 * np.sin(a), 0.0, -7.0 * np.cos(a)])
        R, t = _lookat_pose(c)
        gt.append((R, t))
        state = process_frame(state, _render_features(X, desc, R, t, rng, pix_noise=0.1))
    return state, gt


def test_sim3_closure_end_to_end_scale_drift(loop_world):
    """Full VO around a loop + injected scale drift: close_loops_sim3 must
    detect the revisit, measure the relative map scale from landmark depth
    ratios, and correct the trajectory — strictly better than the SE(3)
    closure on the same drifted state (VERDICT r1 item 4)."""
    import copy

    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.loopclosure import close_loops_sim3

    state, gt = _run_loop_vo(loop_world)
    assert state.initialized and len(state.keyframes) >= 10

    drift_total = _inject_scale_drift(state, rate=0.06)
    assert drift_total > 1.8  # a real, large accumulated scale error

    def kf_ate(st):
        Rs = np.stack([kf.R for kf in st.keyframes])
        ts = np.stack([kf.t for kf in st.keyframes])
        gtR = np.stack([gt[kf.index][0] for kf in st.keyframes])
        gtt = np.stack([gt[kf.index][1] for kf in st.keyframes])
        return ate_rmse(Rs, ts, gtR, gtt)

    ate_before = kf_ate(state)
    state_se3 = copy.deepcopy(state)

    n = close_loops_sim3(state, min_gap=6, min_inliers=20)
    assert n >= 1, "no Sim(3) closure accepted on the revisit"
    ate_sim3 = kf_ate(state)
    assert ate_sim3 < 0.5 * ate_before, f"ATE {ate_before:.3f} -> {ate_sim3:.3f}"

    n_se3 = close_loops(state_se3, min_gap=6, min_inliers=20)
    ate_se3 = kf_ate(state_se3) if n_se3 else ate_before
    assert ate_sim3 < ate_se3, (
        f"Sim(3) {ate_sim3:.3f} not better than SE(3) {ate_se3:.3f} on scale drift"
    )


def test_device_vo_sim3_closure_end_to_end_scale_drift(loop_world):
    """Strict device-engine port of test_sim3_closure_end_to_end_scale_drift
    (VERDICT r2 item 4): drive DeviceVO around the loop, inject real scale
    drift into the synced state, re-upload it, and let the ENGINE's closure
    event path (sync -> host close_loops_sim3 -> re-upload) fire during
    continued tracking. Asserts the ATE halves, beats SE(3) on the same
    drifted state, and that slot generations survive the re-upload (the
    engine keeps tracking frames after the closure)."""
    import copy

    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.loopclosure import close_loops
    from cvsteer_tpu.slam.vo_device import DeviceVO

    X, desc = loop_world
    rng = np.random.default_rng(11)
    n_frames = 48

    def pose(k):
        a = 2 * np.pi * (k / (n_frames - 1))
        c = np.array([7.0 * np.sin(a), 0.0, -7.0 * np.cos(a)])
        return _lookat_pose(c)

    gt = [pose(k) for k in range(n_frames)]
    frames = [
        _render_features(X, desc, R, t, rng, pix_noise=0.1) for R, t in gt
    ]

    # Phase 1: device engine tracks most of the loop, NO closure.
    cfg = VOConfig(
        intrinsics=K, kf_max_gap=4, window=6, track_min_landmarks=40,
        min_parallax=0.01,
    )
    vo = DeviceVO(cfg)
    n_pre = 40
    for k in range(n_pre):
        vo.process_frame(frames[k])
    st = vo.sync_host()
    assert st.initialized and len(st.keyframes) >= 10

    # Phase 2: inject accumulated scale drift into the synced device state.
    drift_total = _inject_scale_drift(st, rate=0.07)
    assert drift_total > 1.8

    def kf_ate(s):
        Rs = np.stack([kf.R for kf in s.keyframes])
        ts = np.stack([kf.t for kf in s.keyframes])
        gtR = np.stack([gt[min(kf.index, n_frames - 1)][0] for kf in s.keyframes])
        gtt = np.stack([gt[min(kf.index, n_frames - 1)][1] for kf in s.keyframes])
        return ate_rmse(Rs, ts, gtR, gtt)

    ate_before = kf_ate(st)
    st_se3 = copy.deepcopy(st)

    # Phase 3: the DRIFTED state goes back into a closure-enabled device
    # engine (checkpoint-adopt path) and tracking continues across the
    # loop's revisit — the engine's own event path must fire the Sim(3)
    # closure (sync -> close_loops_sim3 -> re-upload).
    cfg2 = cfg._replace(
        loop_closure=True, loop_closure_sim3=True,
        loop_min_gap=6, loop_min_inliers=20,
    )
    st.config = cfg2
    vo2 = DeviceVO(cfg2)
    vo2.adopt(st)
    for k in range(n_pre, n_frames):
        vo2.process_frame(frames[k])
    final = vo2.sync_host()
    ate_sim3 = kf_ate(final)
    assert ate_sim3 < 0.5 * ate_before, (
        f"device closure did not halve ATE: {ate_before:.3f} -> {ate_sim3:.3f}"
    )

    # SE(3) closure on the same drifted state cannot fix the scale.
    n_se3 = close_loops(st_se3, min_gap=6, min_inliers=20)
    ate_se3 = kf_ate(st_se3) if n_se3 else ate_before
    assert ate_sim3 < ate_se3, (
        f"Sim(3) {ate_sim3:.3f} not better than SE(3) {ate_se3:.3f}"
    )

    # Phase 4: slot generations survived the closure re-upload — the
    # engine still tracks new frames afterwards (fresh ring trajectory
    # entries, finite poses, live landmarks).
    extra = 6
    traj_before_extra = len(final.trajectory)
    for k in range(extra):
        a = 2 * np.pi * ((n_frames - 1 + k + 1) / (n_frames - 1))
        c = np.array([7.0 * np.sin(a), 0.0, -7.0 * np.cos(a)])
        R, t = _lookat_pose(c)
        vo2.process_frame(_render_features(X, desc, R, t, rng, pix_noise=0.1))
    post = vo2.finalize()
    assert len(post.trajectory) == traj_before_extra + extra
    assert all(np.isfinite(kf.t).all() for kf in post.keyframes)
    assert post.num_landmarks > 0
    # the last extra frames were tracked (not lost): their trajectory
    # entries exist and carry finite poses
    for fidx, R, t in post.trajectory[-extra:]:
        assert np.isfinite(R).all() and np.isfinite(t).all()


def test_device_vo_runs_with_sim3_closure_enabled(loop_world):
    """The device-resident engine takes its closure event path (gather the
    device row, run close_loops_sim3 host-side, re-upload) without
    breaking the run — same loop as the host wiring test below."""
    from cvsteer_tpu.slam.vo_device import DeviceVO

    X, desc = loop_world
    rng = np.random.default_rng(12)
    cfg = VOConfig(
        intrinsics=K, kf_max_gap=4, window=6, track_min_landmarks=40,
        min_parallax=0.01, loop_closure=True, loop_closure_sim3=True,
        loop_min_gap=6, loop_min_inliers=20,
    )
    vo = DeviceVO(cfg)
    n_frames = 40
    for k in range(n_frames):
        a = 2 * np.pi * (k / (n_frames - 1))
        c = np.array([7.0 * np.sin(a), 0.0, -7.0 * np.cos(a)])
        R, t = _lookat_pose(c)
        vo.process_frame(_render_features(X, desc, R, t, rng, pix_noise=0.1))
    state = vo.finalize()
    assert state.initialized
    assert vo.map is not None  # engine ran (and re-uploaded after closures)
    assert len(state.trajectory) == n_frames
    assert all(np.isfinite(kf.t).all() for kf in state.keyframes)


def test_vo_runs_with_sim3_closure_enabled(loop_world):
    """The VOConfig.loop_closure_sim3 wiring drives close_loops_sim3 inside
    process_frame without breaking the run."""
    from cvsteer_tpu.slam.vo import process_frame

    X, desc = loop_world
    rng = np.random.default_rng(12)
    cfg = VOConfig(
        intrinsics=K, kf_max_gap=4, window=6, track_min_landmarks=40,
        min_parallax=0.01, loop_closure=True, loop_closure_sim3=True,
        loop_min_gap=6, loop_min_inliers=20,
    )
    state = init_vo(cfg)
    n_frames = 40
    for k in range(n_frames):
        a = 2 * np.pi * (k / (n_frames - 1))
        c = np.array([7.0 * np.sin(a), 0.0, -7.0 * np.cos(a)])
        R, t = _lookat_pose(c)
        state = process_frame(state, _render_features(X, desc, R, t, rng, pix_noise=0.1))
    assert state.initialized
    assert all(np.isfinite(kf.t).all() for kf in state.keyframes)


def test_finalize_reanchors_full_trajectory(loop_world):
    """Sim(3) closure corrections must reach NON-keyframe trajectory
    entries: finalize() re-anchors each tracked pose onto its reference
    keyframe's corrected pose via the stored relative pose + local scale
    (VOState.traj_ref). Without re-anchoring (the pre-round-4 behavior,
    emulated by clearing traj_ref), 2/3 of the trajectory stays in the
    pre-correction frame and full-trajectory ATE stays drift-sized."""
    import copy

    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.loopclosure import close_loops_sim3
    from cvsteer_tpu.slam.vo import finalize

    state, gt = _run_loop_vo(loop_world)
    assert state.initialized and len(state.keyframes) >= 10
    _inject_scale_drift(state, rate=0.06)
    n = close_loops_sim3(state, min_gap=6, min_inliers=20)
    assert n >= 1

    def full_ate(st):
        st = finalize(st)
        ids = [f for f, _, _ in st.trajectory]
        Rs, ts = st.poses()
        gtR = np.stack([gt[f][0] for f in ids])
        gtt = np.stack([gt[f][1] for f in ids])
        return ate_rmse(Rs, ts, gtR, gtt, align_scale=True)

    legacy = copy.deepcopy(state)
    legacy.traj_ref = [None] * len(legacy.trajectory)  # keyframe-only
    ate_old = full_ate(legacy)
    ate_new = full_ate(state)
    # re-anchoring must beat keyframe-only propagation decisively
    assert ate_new < 0.6 * ate_old, (ate_new, ate_old)


def test_closure_gate_consistency_and_cooldown():
    """closure_gate: threshold filter, temporal-consistency streak, and
    the rejected-region cooldown — the cheap pre-event rules that keep
    perceptually-aliased maps from paying a verification every promotion."""
    import numpy as np

    from cvsteer_tpu.slam.loopclosure import GATE_REGION_KF, closure_gate
    from cvsteer_tpu.slam.vo import VOConfig, init_vo

    cfg = VOConfig(loop_consistency=2, loop_reject_cooldown=10)
    state = init_vo(cfg)
    state.keyframes = [object()] * 30  # only len() is consulted

    idx = np.array([4, 11, 2])
    good = np.array([0.9, 0.85, 0.1])
    bad = np.array([0.5, 0.4, 0.1])

    # below threshold: never gates through, resets the streak
    assert closure_gate(state, idx, bad, min_gap=5, threshold=0.8) is False
    # first consistent hit: streak 1 < 2 -> wait
    assert closure_gate(state, idx, good, min_gap=5, threshold=0.8) is False
    # second consecutive hit on the same region -> verify
    assert closure_gate(state, idx, good, min_gap=5, threshold=0.8) is True
    # a hit on a DIFFERENT region restarts the streak
    far = np.array([20, 4, 2])
    assert closure_gate(state, far, good, min_gap=5, threshold=0.8) is False
    assert closure_gate(state, far, good, min_gap=5, threshold=0.8) is True

    # rejected-verification cooldown: region blocked until j > until
    region = 4 // GATE_REGION_KF
    state.loop_streak = (-1, 0)
    state.loop_reject_until[region] = len(state.keyframes) - 1 + 5
    assert closure_gate(state, idx, good, min_gap=5, threshold=0.8) is False
    assert closure_gate(state, idx, good, min_gap=5, threshold=0.8) is False
    state.keyframes = [object()] * 40  # past the cooldown horizon
    assert closure_gate(state, idx, good, min_gap=5, threshold=0.8) is True


def test_signature_index_capacity_warns():
    """Crossing loop_sig_capacity must warn loudly, not silently stop
    indexing (VERDICT r4 item 6)."""
    import warnings

    import jax.numpy as jnp
    import numpy as np
    import pytest

    from cvsteer_tpu.features.frontend import Features
    from cvsteer_tpu.slam.loopclosure import SignatureIndex

    def feat(seed):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(8, 16)).astype(np.float32)
        return Features(
            yx=jnp.zeros((8, 2)), score=jnp.ones(8), theta=jnp.zeros(8),
            level=jnp.zeros(8, jnp.int32), desc=jnp.asarray(d),
            valid=jnp.ones(8, bool),
        )

    class KF:
        def __init__(self, s):
            self.features = feat(s)

    idx = SignatureIndex(16, capacity=4)
    idx.extend([KF(i) for i in range(4)])  # at capacity: no warning
    kfs = [KF(i) for i in range(6)]
    with pytest.warns(RuntimeWarning, match="loop_sig_capacity"):
        idx.extend(kfs)


def test_sim3_skeleton_graph_corrects_large_histories(loop_world):
    """Above ~250 keyframes close_loops_sim3 solves a SKELETON graph
    (every stride-th keyframe + closure endpoints, dense and fully
    converged) and propagates corrections to skipped keyframes by their
    stored relative poses — the correction must reach EVERY keyframe,
    not only skeleton nodes."""
    from cvsteer_tpu.slam.loopclosure import close_loops_sim3

    X, desc = loop_world
    rng = np.random.default_rng(11)
    P = 300  # > SK_MAX -> skeleton path
    poses = _circle_poses(P)
    poses.append(poses[0])

    drifted = []
    for n, (R, t) in enumerate(poses):
        s = n / len(poses)
        dR, dt = se3.exp_se3(
            jnp.asarray(
                np.concatenate(
                    [0.04 * s * np.ones(3) * [1, -1, 0.5],
                     0.35 * s * np.array([1, 0.3, -0.5])]
                ),
                jnp.float32,
            )
        )
        Rn, tn = se3.compose(dR, dt, jnp.asarray(R), jnp.asarray(t))
        drifted.append((np.asarray(Rn), np.asarray(tn)))
    state = _state_with_keyframes(poses, X, desc, rng, drift=drifted)
    # minimal landmark map: the Sim(3) closure edge estimates each side's
    # local scale from landmark depths (sim3_closure_edge needs >= 10)
    n_lm = min(len(X), state.landmarks.shape[0])
    state.landmarks[:n_lm] = X[:n_lm]
    state.landmark_valid[:n_lm] = True
    state.num_landmarks = n_lm
    for kf in state.keyframes:
        kf.landmark_ids[:40] = np.arange(40)

    def errs():
        rot = [
            float(se3.rotation_geodesic(
                jnp.asarray(state.keyframes[k].R), jnp.asarray(poses[k][0])
            ))
            for k in range(len(poses))
        ]
        return np.asarray(rot)

    before = errs()
    n_closed = close_loops_sim3(state, min_gap=6, min_inliers=20)
    assert n_closed >= 1
    after = errs()
    # the tail half of the loop (where drift concentrated) must improve,
    # INCLUDING non-skeleton keyframes (stride > 1 at P = 301)
    sel = np.arange(len(poses) // 2, len(poses))
    non_skel = [k for k in sel if k % 2 == 1]  # odd ks: mostly skipped
    assert after[sel].mean() < 0.6 * before[sel].mean()
    assert after[non_skel].mean() < 0.6 * before[non_skel].mean()


def test_sim3_edge_scale_band_clamp(loop_world, monkeypatch):
    """A measured relative scale outside VOConfig.loop_scale_band is a
    broken measurement (epoch-mixed old-keyframe depth support / near-
    zero-baseline revisit triangulation — the r5 campaign measured
    s_z = 0.009 on a TRUE revisit), and must be replaced by the unit-
    scale prior, not fed to the solver."""
    from cvsteer_tpu.slam import loopclosure as lc

    X, desc = loop_world
    rng = np.random.default_rng(5)
    poses = _circle_poses(8)
    state = _state_with_keyframes(poses, X, desc, rng)
    state.diag = []

    class _Res:
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.0, 0.0, 1.0], np.float32)

    class _C:
        i, j = 0, 7
        result = _Res()

    # broken measurement: s_j/s_i = 0.005, far outside (0.5, 2.0)
    monkeypatch.setattr(lc, "closure_scales", lambda *a: (100.0, 0.5))
    s_z, R_z, t_z = lc.sim3_closure_edge(state, _C())
    assert s_z == 1.0
    assert any(e["ev"] == "closure_edge_clamp" for e in state.diag)
    np.testing.assert_allclose(np.linalg.norm(t_z), 0.5, rtol=1e-6)

    # in-band measurement passes through untouched
    monkeypatch.setattr(lc, "closure_scales", lambda *a: (1.0, 0.8))
    s_z, _, _ = lc.sim3_closure_edge(state, _C())
    assert abs(s_z - 0.8) < 1e-6


def test_sim3_solve_scale_sanity_rejects_warp(loop_world, monkeypatch):
    """Belt to the edge clamp: if a broken closure constraint DOES reach
    the solver and it responds by warping node scales outside the band,
    the whole event must be rejected (residual gates miss smooth warps —
    every edge residual stays small while the map collapses)."""
    from cvsteer_tpu.slam import loopclosure as lc
    from cvsteer_tpu.slam.loopclosure import close_loops_sim3

    X, desc = loop_world
    rng = np.random.default_rng(7)
    poses = _circle_poses(12)
    poses.append(poses[0])
    state = _state_with_keyframes(poses, X, desc, rng)
    state.diag = []
    n_lm = min(len(X), state.landmarks.shape[0])
    state.landmarks[:n_lm] = X[:n_lm]
    state.landmark_valid[:n_lm] = True
    state.num_landmarks = n_lm
    for kf in state.keyframes:
        kf.landmark_ids[:40] = np.arange(40)

    # bypass the edge-level clamp: hand the solver a poisoned edge
    monkeypatch.setattr(
        lc, "sim3_closure_edge",
        lambda st, c: (
            0.01,
            np.asarray(c.result.R),
            np.asarray(c.result.t, np.float32),
        ),
    )
    before = [(kf.R.copy(), kf.t.copy()) for kf in state.keyframes]
    n = close_loops_sim3(state, min_gap=6, min_inliers=20)
    assert n == 0
    stages = {e.get("stage") for e in state.diag
              if e.get("ev") == "closure_reject"}
    assert "scale_sanity" in stages or "post_solve" in stages
    for (R0, t0), kf in zip(before, state.keyframes):
        np.testing.assert_allclose(kf.R, R0)
        np.testing.assert_allclose(kf.t, t0)
