"""Spatially sharded feature extraction vs the single-device pipeline.

The sharded path (parallel.features_sharded) must reproduce
features.frontend.extract_features exactly: same keypoints in the same
order (the merge re-implements lax.top_k's tie-break), same subpixel
coordinates, same descriptors — including keypoints whose descriptor
support crosses shard boundaries or clamps at global image borders.
Runs on the 8-device CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from cvsteer_tpu.features.frontend import FrontendConfig, extract_features
from cvsteer_tpu.parallel.features_sharded import sharded_extract_features


def _mesh(data: int, space: int) -> Mesh:
    devs = np.array(jax.devices()[: data * space]).reshape(data, space)
    return Mesh(devs, ("data", "space"))


def _blur(imgs: np.ndarray) -> np.ndarray:
    """Band-limited random texture: corner scores are then generic (no
    plateaus), so exact keypoint-order equality is a meaningful check."""
    k = (np.hanning(9) / np.hanning(9).sum()).astype(np.float32)
    out = imgs
    for ax in (1, 2):
        out = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), ax, out
        )
    return out


@pytest.mark.parametrize(
    "data,space,h,levels", [(2, 4, 96, 4), (1, 8, 128, 2)]
)
def test_sharded_features_match_single_device(data, space, h, levels):
    # (2,4,96): level 0 sharded into 24-row slabs, levels 1+ replicated;
    # (1,8,128): 16-row slabs at S=8, replication kicking in at level 1
    # (2 levels keep the 8-way shard_map compile inside the suite budget)
    cfg = FrontendConfig(
        levels=levels, keypoints_per_level=64, threshold=1e-4
    )
    rng = np.random.default_rng(11)
    imgs = _blur(
        rng.standard_normal((2, h, 128)).astype(np.float32) * 40.0
    )
    imgs = jnp.asarray(imgs)

    ref = extract_features(imgs, cfg=cfg)
    out = sharded_extract_features(imgs, _mesh(data, space), cfg)

    assert bool(jnp.all(ref.valid == out.valid))
    v = np.asarray(ref.valid)
    assert v.any(), "test scene produced no keypoints"
    for name in ("yx", "score", "theta", "level", "desc"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        sel = v if a.ndim == 2 else v[..., None] & np.ones_like(a, bool)
        np.testing.assert_allclose(
            a[v], b[v], rtol=0, atol=1e-5,
            err_msg=f"field {name} diverges from single-device",
        )


def test_sharded_features_border_keypoints():
    """Force keypoints against the global top/bottom borders: their
    descriptor sampling clamps at the image edge, which the sharded path
    must reproduce via the edge-row overwrite (not the REFLECT halo).
    H=128 at S=8 keeps 16-row slabs ABOVE the halo so level 0 genuinely
    runs the sharded branch (a 64-row image would silently replicate and
    the overwrite path would go untested)."""
    cfg = FrontendConfig(levels=1, keypoints_per_level=32, threshold=1e-6)
    rng = np.random.default_rng(3)
    imgs = _blur(rng.standard_normal((1, 128, 128)).astype(np.float32) * 40.0)
    # strong isolated blobs near the borders (rows 4 and H-5)
    imgs[0, 4, 20] += 300.0
    imgs[0, 123, 100] += 300.0
    imgs = jnp.asarray(_blur(imgs))

    ref = extract_features(imgs, cfg=cfg)
    out = sharded_extract_features(imgs, _mesh(1, 8), cfg)
    v = np.asarray(ref.valid)
    assert bool(jnp.all(ref.valid == out.valid)) and v.any()
    rows = np.asarray(ref.yx)[0, v[0], 0]
    assert rows.min() < 8 and rows.max() > 120, "border blobs not detected"
    np.testing.assert_allclose(
        np.asarray(ref.desc)[v], np.asarray(out.desc)[v], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.yx)[v], np.asarray(out.yx)[v], atol=1e-5
    )


def test_sharded_features_g4():
    """Order-4 pipeline through the same sharded machinery."""
    cfg = FrontendConfig(levels=2, keypoints_per_level=32, order=4,
                         threshold=1e-5)
    rng = np.random.default_rng(7)
    imgs = _blur(rng.standard_normal((1, 96, 128)).astype(np.float32) * 40.0)
    imgs = jnp.asarray(imgs)
    ref = extract_features(imgs, cfg=cfg)
    out = sharded_extract_features(imgs, _mesh(1, 4), cfg)
    v = np.asarray(ref.valid)
    assert bool(jnp.all(ref.valid == out.valid)) and v.any()
    np.testing.assert_allclose(
        np.asarray(ref.desc)[v], np.asarray(out.desc)[v], atol=1e-5
    )
