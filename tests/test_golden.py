"""End-to-end golden-image regression — the reference's acceptance bar.

Reproduces TEST(cvsteer, basic) (test/test.cpp:70-108): run the G2 pipeline
on the embedded fish image, min-max normalize to 8-bit, JPEG-recode (to carry
the same compression artifacts as the stored goldens), and require mean
absolute L1 error <= 1.0 gray level per map.
"""

import numpy as np
import jax.numpy as jnp

from cvsteer_tpu.filters.g2 import steerable_pipeline_g2
from cvsteer_tpu.utils.imageproc import normalize_minmax_u8

from oracle import normalize_u8, recode_jpeg


def test_golden_images(fish_gray, goldens):
    maps = steerable_pipeline_g2(jnp.asarray(fish_gray), method="xla")
    n = fish_gray.size

    for ours, name in [
        (maps.edges, "edges"),
        (maps.lines_dark, "lines_dark"),
        (maps.lines_bright, "lines_bright"),
    ]:
        u8 = np.asarray(normalize_minmax_u8(ours))
        err = np.abs(
            recode_jpeg(u8).astype(np.float64) - goldens[name].astype(np.float64)
        ).sum() / n
        assert err <= 1.0, f"{name}: mean L1 {err:.3f} > 1.0"


def test_golden_images_no_recode(fish_gray, goldens):
    """Secondary bar: direct comparison against decoded goldens (includes the
    goldens' own JPEG artifacts), with a correspondingly relaxed threshold."""
    maps = steerable_pipeline_g2(jnp.asarray(fish_gray), method="xla")
    n = fish_gray.size
    for ours, name in [
        (maps.edges, "edges"),
        (maps.lines_dark, "lines_dark"),
        (maps.lines_bright, "lines_bright"),
    ]:
        u8 = np.asarray(normalize_minmax_u8(ours))
        err = np.abs(u8.astype(np.float64) - goldens[name].astype(np.float64)).sum() / n
        assert err <= 2.5, f"{name}: mean L1 {err:.3f} > 2.5"


def test_normalize_matches_opencv(fish_gray):
    maps = steerable_pipeline_g2(jnp.asarray(fish_gray), method="xla")
    ours = np.asarray(normalize_minmax_u8(maps.edges))
    ref = normalize_u8(np.asarray(maps.edges))
    # identical data normalized by us vs cv2.normalize: allow off-by-one from
    # rounding-mode edge cases only
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    assert (ours != ref).mean() < 0.01
