"""Gaussian pyramid + multi-scale feature extraction (BASELINE config 2)."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.features.frontend import FrontendConfig, extract_features
from cvsteer_tpu.features.matching import match_descriptors
from cvsteer_tpu.ops.pyramid import gaussian_pyramid, level_shapes, pyr_down


def test_pyr_down_matches_opencv(fish_gray):
    import cv2

    ours = np.asarray(pyr_down(jnp.asarray(fish_gray)))
    ref = cv2.pyrDown(fish_gray)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_pyramid_shapes(fish_gray):
    pyr = gaussian_pyramid(jnp.asarray(fish_gray), 5)
    shapes = level_shapes(*fish_gray.shape, 5)
    assert [p.shape for p in pyr] == [tuple(s) for s in shapes]
    assert pyr[0].shape == (185, 256) and pyr[4].shape == (12, 16)


def test_pyramid_batched(fish_gray):
    batch = jnp.stack([jnp.asarray(fish_gray)] * 3)
    pyr = gaussian_pyramid(batch, 3)
    assert pyr[2].shape == (3, 47, 64)


def test_extract_features_single(fish_gray):
    cfg = FrontendConfig(levels=3, keypoints_per_level=64)
    feats = jax.jit(lambda im: extract_features(im, cfg=cfg))(jnp.asarray(fish_gray))
    assert feats.yx.shape == (192, 2)
    assert feats.desc.shape == (192, cfg.descriptor_dim)
    nv = int(feats.valid.sum())
    assert nv > 60
    # higher levels report level-0 coordinates
    lv = np.asarray(feats.level)
    yx = np.asarray(feats.yx)
    valid = np.asarray(feats.valid)
    assert (yx[valid][:, 0] < 185).all() and (yx[valid] [:, 1] < 256).all()
    assert set(np.unique(lv[valid])) == {0, 1, 2}


def test_extract_features_batched_and_matchable(fish_gray):
    cfg = FrontendConfig(levels=3, keypoints_per_level=64)
    batch = jnp.stack([jnp.asarray(fish_gray)] * 2)
    feats = extract_features(batch, cfg=cfg)
    assert feats.desc.shape == (2, 192, cfg.descriptor_dim)
    m = match_descriptors(
        feats.desc[0], feats.valid[0], feats.desc[1], feats.valid[1], ratio=1.0
    )
    nv = int(feats.valid[0].sum())
    # identical images: nearly all valid keypoints self-match
    assert int(m.valid.sum()) >= 0.9 * nv


def test_steerable_pyramid_maps(fish_gray):
    from cvsteer_tpu.features.pyramid_maps import steerable_pyramid_maps
    from cvsteer_tpu.filters.g2 import steerable_pipeline_g2
    from cvsteer_tpu.filters.g4 import steerable_pipeline_g4

    maps = steerable_pyramid_maps(jnp.asarray(fish_gray), levels=3, method="xla")
    assert len(maps) == 3
    assert maps[0].g2.edges.shape == (185, 256)
    assert maps[1].g4.magnitude.shape == (93, 128)
    # level 0 equals the direct single-image pipelines
    ref2 = steerable_pipeline_g2(jnp.asarray(fish_gray), method="xla")
    np.testing.assert_allclose(
        np.asarray(maps[0].g2.edges), np.asarray(ref2.edges), rtol=1e-6, atol=1e-4
    )
    ref4 = steerable_pipeline_g4(jnp.asarray(fish_gray))
    np.testing.assert_allclose(
        np.asarray(maps[0].g4.energy), np.asarray(ref4.energy), rtol=1e-6, atol=1e-2
    )
