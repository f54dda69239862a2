"""Config tree, metrics channel, profiling hooks, checkpoint/resume."""

import io
import json

import numpy as np
import jax.numpy as jnp
import pytest

from cvsteer_tpu.utils.config import (
    EngineConfig,
    apply_overrides,
    from_dict,
    load_config,
    save_config,
    to_dict,
)
from cvsteer_tpu.utils.metrics import Metrics, StepTimer


def test_config_roundtrip(tmp_path):
    cfg = EngineConfig()
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg == cfg2
    assert cfg2.filters.g2_spacing == 0.67  # SteerableFiltersG2.h:38 default
    assert cfg2.filters.g4_width == 6  # SteerableFiltersG4.h:38 default


def test_config_overrides():
    cfg = EngineConfig()
    cfg2 = apply_overrides(
        cfg, ("slam.window=12", "frontend.levels=3", "camera.fx=700.5")
    )
    assert cfg2.slam.window == 12
    assert cfg2.frontend.levels == 3
    assert cfg2.camera.fx == 700.5
    assert cfg.slam.window == 8  # original untouched
    with pytest.raises(KeyError):
        apply_overrides(cfg, ("slam.nonexistent=1",))
    with pytest.raises(ValueError):
        apply_overrides(cfg, ("justakey",))


def test_metrics_channel():
    buf = io.StringIO()
    m = Metrics(stream=buf)
    m.count("matches", 40)
    m.count("matches", 2)
    m.gauge("ba_cost", 0.125)
    m.frame(8)
    m.log(step=3, note="kf")
    rec = json.loads(buf.getvalue())
    assert rec["matches"] == 42
    assert rec["ba_cost"] == 0.125
    assert rec["step"] == 3 and rec["note"] == "kf"
    assert rec["fps"] > 0


def test_step_timer():
    t = StepTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.means_ms()


def test_profiling_annotations_are_usable():
    from cvsteer_tpu.utils.profiling import annotate, step_annotation

    with annotate("unit-test-span"):
        x = jnp.ones(8).sum()
    with step_annotation("unit-test-step", 1):
        y = jnp.ones(8).sum()
    assert float(x) == float(y) == 8.0


def test_checkpoint_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_vo import K, _make_world, _gt_pose, _render_features

    from cvsteer_tpu.slam.vo import VOConfig, init_vo, process_frame
    from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

    X, desc = _make_world()
    rng = np.random.default_rng(11)
    cfg = VOConfig(intrinsics=K, kf_max_gap=4, window=6, track_min_landmarks=30)
    state = init_vo(cfg)
    for k in range(12):
        R, t = _gt_pose(k, 30)
        state = process_frame(state, _render_features(X, desc, R, t, rng))

    ck = SlamCheckpointer(str(tmp_path / "ckpt"))
    ck.save(len(state.keyframes), state)
    assert ck.latest_step() == len(state.keyframes)

    restored = ck.restore(init_vo(cfg))
    assert restored.frame_count == state.frame_count
    assert restored.num_landmarks == state.num_landmarks
    assert len(restored.keyframes) == len(state.keyframes)
    np.testing.assert_array_equal(restored.landmarks, state.landmarks)
    for a, b in zip(restored.keyframes, state.keyframes):
        np.testing.assert_array_equal(a.landmark_ids, b.landmark_ids)
        np.testing.assert_allclose(a.R, b.R)
        np.testing.assert_array_equal(
            np.asarray(a.features.yx), np.asarray(b.features.yx)
        )
    # scale-governor rolling histories survive the roundtrip (round 5:
    # scale-continuous re-init + warm ground smoothing after a restore)
    assert restored.kf_baselines == pytest.approx(state.kf_baselines)
    assert restored.ground_hist == pytest.approx(state.ground_hist)
    assert len(state.kf_baselines) > 0  # the run actually recorded speeds

    # resumed VO keeps tracking
    for k in range(12, 16):
        R, t = _gt_pose(k, 30)
        restored = process_frame(restored, _render_features(X, desc, R, t, rng))
    assert restored.frame_count == 16
    ck.close()
