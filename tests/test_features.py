"""Keypoints, phase descriptors, matching (BASELINE config 2-3 building blocks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cvsteer_tpu.features import (
    detect_keypoints,
    match_descriptors,
    phase_descriptors,
)
from cvsteer_tpu.filters.g2 import (
    dominant_orientation,
    energy_coefficients,
    g2_bank,
    g2_basis,
)


def _frontend(img):
    basis = g2_basis(jnp.asarray(img), method="xla")
    c1, c2, c3 = energy_coefficients(basis)
    theta, strength = dominant_orientation(c2, c3)
    return basis, theta, strength


def test_nms_detects_isolated_peaks():
    strength = np.zeros((64, 64), np.float32)
    peaks = [(10, 12), (30, 40), (50, 20)]
    for i, (y, x) in enumerate(peaks):
        strength[y, x] = 10.0 + i
    kp = detect_keypoints(jnp.asarray(strength), jnp.zeros((64, 64)), max_keypoints=8)
    assert int(kp.valid.sum()) == 3
    got = {tuple(np.round(p).astype(int)) for p in np.asarray(kp.yx)[np.asarray(kp.valid)]}
    assert got == set(peaks)
    # scores are sorted descending
    s = np.asarray(kp.score)[np.asarray(kp.valid)]
    assert (np.diff(s) <= 0).all()


def test_nms_respects_border_and_threshold():
    strength = np.zeros((32, 32), np.float32)
    strength[1, 1] = 100.0  # inside default border=3 -> rejected
    strength[16, 16] = 0.5
    kp = detect_keypoints(
        jnp.asarray(strength), jnp.zeros((32, 32)), max_keypoints=8, threshold=1.0
    )
    assert int(kp.valid.sum()) == 0


def test_subpixel_refinement():
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    cy, cx = 31.3, 22.7
    strength = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / 18.0)
    kp = detect_keypoints(jnp.asarray(strength), jnp.zeros((64, 64)), max_keypoints=4)
    assert int(kp.valid.sum()) >= 1
    y, x = np.asarray(kp.yx)[0]
    assert abs(y - cy) < 0.15 and abs(x - cx) < 0.15


def test_descriptors_self_match_identity(fish_gray):
    basis, theta, strength = _frontend(fish_gray)
    kp = detect_keypoints(strength, theta, max_keypoints=128, threshold=1.0)
    desc = phase_descriptors(basis, kp)
    nv = int(kp.valid.sum())
    assert nv > 20
    # unit norm on valid slots
    norms = np.linalg.norm(np.asarray(desc), axis=-1)
    np.testing.assert_allclose(norms[np.asarray(kp.valid)], 1.0, atol=1e-5)

    m = match_descriptors(desc, kp.valid, desc, kp.valid, ratio=1.0, mutual=True)
    idx = np.asarray(m.index)
    valid = np.asarray(m.valid)
    assert valid.sum() >= 0.95 * nv
    assert (idx[valid] == np.arange(len(idx))[valid]).all()


def test_matching_translated_image(fish_gray):
    dyx = 8
    img_a = fish_gray[:-dyx, :-dyx]
    img_b = fish_gray[dyx:, dyx:]  # b = a shifted by (-dy, -dx)

    ba, ta, sa = _frontend(img_a)
    bb, tb, sb = _frontend(img_b)
    ka = detect_keypoints(sa, ta, max_keypoints=256, threshold=1.0)
    kb = detect_keypoints(sb, tb, max_keypoints=256, threshold=1.0)
    da = phase_descriptors(ba, ka)
    db = phase_descriptors(bb, kb)
    m = match_descriptors(da, ka.valid, db, kb.valid, ratio=0.9)

    valid = np.asarray(m.valid)
    assert valid.sum() >= 30
    pa = np.asarray(ka.yx)[valid]
    pb = np.asarray(kb.yx)[np.asarray(m.index)[valid]]
    offset = pa - pb  # should be ~(dyx, dyx)
    good = (np.abs(offset - dyx) < 1.0).all(axis=1)
    assert good.mean() > 0.9, f"only {good.mean():.2f} of matches at expected offset"


def test_matching_rotated_image(fish_gray):
    img = fish_gray[: fish_gray.shape[0] // 8 * 8]
    rot = np.ascontiguousarray(np.rot90(img))  # (y,x) -> (W-1-x, y)
    H, W = img.shape

    ba, ta, sa = _frontend(img)
    bb, tb, sb = _frontend(rot)
    ka = detect_keypoints(sa, ta, max_keypoints=256, threshold=1.0)
    kb = detect_keypoints(sb, tb, max_keypoints=256, threshold=1.0)
    da = phase_descriptors(ba, ka)
    db = phase_descriptors(bb, kb)
    m = match_descriptors(da, ka.valid, db, kb.valid, ratio=0.9)

    valid = np.asarray(m.valid)
    assert valid.sum() >= 20
    pa = np.asarray(ka.yx)[valid]
    pb = np.asarray(kb.yx)[np.asarray(m.index)[valid]]
    expected = np.stack([W - 1.0 - pa[:, 1], pa[:, 0]], axis=1)
    good = (np.abs(expected - pb) < 1.5).all(axis=1)
    assert good.mean() > 0.7, f"only {good.mean():.2f} of matches consistent with rot90"


def test_corner_score_prefers_junctions_over_edges():
    """corner_strength = min_theta E(theta): high at crossings, ~0 on a
    straight edge (where the detector position would slide)."""
    from cvsteer_tpu.filters.g2 import corner_strength, energy_coefficients

    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    edge = 100.0 / (1.0 + np.exp(-(xs - 32.0)))  # vertical step edge
    cross = (
        100.0 * np.exp(-((xs - 32.0) ** 2) / 8.0)
        + 100.0 * np.exp(-((ys - 32.0) ** 2) / 8.0)
    )

    def score(img):
        basis = g2_basis(jnp.asarray(img), method="xla")
        c1, c2, c3 = energy_coefficients(basis)
        return np.asarray(corner_strength(c1, c2, c3))

    s_edge = score(edge)
    s_cross = score(cross)
    # the crossing point dominates any edge response
    assert s_cross[32, 32] > 20.0 * s_edge[32, 16]
    # on the cross, the center beats the pure-line regions
    assert s_cross[32, 32] > 3.0 * s_cross[32, 10]


def test_pooled_topk_selection_matches_exact():
    """The strided max-pool top-k pre-reduction (pool = nms_radius + 1)
    must select exactly the same keypoints as the exact full-map top-k:
    NMS admits no two survivors within Chebyshev distance <= radius, so
    each pool cell holds at most one survivor."""
    from cvsteer_tpu.features.keypoints import detect_keypoints

    rng = np.random.default_rng(42)
    for radius in (1, 2):
        for H, W in [(96, 128), (45, 67)]:  # even and ragged sizes
            s = jnp.asarray(rng.uniform(0, 10, (H, W)).astype(np.float32))
            theta = jnp.asarray(
                rng.uniform(-1.5, 1.5, (H, W)).astype(np.float32)
            )
            exact = detect_keypoints(
                s, theta, max_keypoints=64, nms_radius=radius,
                threshold=1.0, approx=False,
            )
            pooled = detect_keypoints(
                s, theta, max_keypoints=64, nms_radius=radius,
                threshold=1.0, approx=True,
            )
            np.testing.assert_array_equal(
                np.asarray(exact.valid), np.asarray(pooled.valid)
            )
            v = np.asarray(exact.valid)
            np.testing.assert_allclose(
                np.asarray(exact.yx)[v], np.asarray(pooled.yx)[v], atol=0
            )
            np.testing.assert_allclose(
                np.asarray(exact.score)[v], np.asarray(pooled.score)[v], atol=0
            )


def test_g4_order_features_translated_match(fish_gray):
    """FrontendConfig(order=4): the G4/H4 feature path (4th-order basis,
    binomial steering descriptors) must match across a translation just
    like the G2 path."""
    from cvsteer_tpu.features.frontend import FrontendConfig, extract_features

    dyx = 8
    img_a = jnp.asarray(fish_gray[:-dyx, :-dyx])
    img_b = jnp.asarray(fish_gray[dyx:, dyx:])
    cfg = FrontendConfig(levels=2, keypoints_per_level=128, threshold=1.0, order=4)

    fa = extract_features(img_a, cfg=cfg)
    fb = extract_features(img_b, cfg=cfg)
    assert int(np.asarray(fa.valid).sum()) >= 50
    assert np.isfinite(np.asarray(fa.desc)).all()
    # valid descriptors are unit-norm
    norms = np.linalg.norm(np.asarray(fa.desc)[np.asarray(fa.valid)], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    m = match_descriptors(fa.desc, fa.valid, fb.desc, fb.valid, ratio=0.9)
    valid = np.asarray(m.valid)
    assert valid.sum() >= 30
    pa = np.asarray(fa.yx)[valid]
    pb = np.asarray(fb.yx)[np.asarray(m.index)[valid]]
    lvl = np.asarray(fa.level)[valid]
    same = lvl == np.asarray(fb.level)[np.asarray(m.index)[valid]]
    good = (np.abs((pa - pb) - dyx) < 1.5).all(axis=1) & same
    assert good.mean() > 0.8, f"only {good.mean():.2f} matches at expected offset"


def test_fp32_sampling_matches_bf16_class(fish_gray):
    """FrontendConfig.desc_fp32_sampling: identical keypoints, descriptors
    within the bf16 sampling accuracy class of the production path (the
    per-sample bound is 2e-2 rel — after steering + L2 normalization the
    descriptor-level cosine stays near 1), and the fp32 path is genuinely
    different code (bit-inequality guards against the flag silently
    routing to the same sampler)."""
    from cvsteer_tpu.features.frontend import FrontendConfig, extract_features

    img = jnp.asarray(fish_gray)
    f16 = extract_features(img, cfg=FrontendConfig(levels=2))
    f32 = extract_features(
        img, cfg=FrontendConfig(levels=2, desc_fp32_sampling=True)
    )
    v = np.asarray(f16.valid) & np.asarray(f32.valid)
    assert v.sum() >= 50
    np.testing.assert_array_equal(np.asarray(f16.yx), np.asarray(f32.yx))
    da, db = np.asarray(f16.desc)[v], np.asarray(f32.desc)[v]
    assert not np.array_equal(da, db), "flag did not switch sampling paths"
    cos = np.sum(da * db, axis=1)
    assert cos.min() > 0.995, f"descriptor cosine dropped to {cos.min()}"
    norms = np.linalg.norm(db, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
