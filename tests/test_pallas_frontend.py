"""Pallas fused front-end kernels vs the XLA reference path.

On CPU test meshes the kernels run in Pallas interpreter mode; the same code
compiles with Mosaic on real TPU (exercised by bench.py / the CLI).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvsteer_tpu.filters.g2 import g2_bank, steerable_pipeline_g2
from cvsteer_tpu.filters.taps import g2h2_bank, g4h4_bank
from cvsteer_tpu.ops.pallas_frontend import (
    filter_bank_pallas,
    g2_maps_pallas,
    pallas_supported,
)
from cvsteer_tpu.ops.sepconv import filter_bank_xla


@pytest.fixture(scope="module")
def small_fish(fish_gray):
    # keep interpreter-mode runtime low: 64 x 160 crop
    return fish_gray[40:104, 40:200]


def test_bank_pallas_matches_xla_g2(small_fish):
    bank = g2h2_bank()
    ref = np.asarray(filter_bank_xla(jnp.asarray(small_fish), bank.xtaps, bank.ytaps))
    pal = np.asarray(filter_bank_pallas(jnp.asarray(small_fish), bank.xtaps, bank.ytaps))
    assert pal.shape == ref.shape
    np.testing.assert_allclose(pal, ref, atol=5e-3, rtol=1e-5)


def test_bank_pallas_matches_xla_g4(small_fish):
    bank = g4h4_bank()
    ref = np.asarray(filter_bank_xla(jnp.asarray(small_fish), bank.xtaps, bank.ytaps))
    pal = np.asarray(filter_bank_pallas(jnp.asarray(small_fish), bank.xtaps, bank.ytaps))
    np.testing.assert_allclose(pal, ref, atol=5e-3, rtol=1e-5)


def test_bank_pallas_batched(small_fish):
    bank = g2h2_bank()
    batch = jnp.stack([jnp.asarray(small_fish), jnp.asarray(small_fish[::-1])])
    pal = filter_bank_pallas(batch, bank.xtaps, bank.ytaps)
    assert pal.shape == (2, 7, 64, 160)
    ref = filter_bank_xla(batch, bank.xtaps, bank.ytaps)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=5e-3, rtol=1e-5)


def test_fused_maps_match_xla_pipeline(small_fish):
    bank = g2_bank()
    maps = steerable_pipeline_g2(jnp.asarray(small_fish), bank, method="xla")
    e, d, b = g2_maps_pallas(jnp.asarray(small_fish), bank.xtaps, bank.ytaps)
    for ours, ref, name in [
        (e, maps.edges, "edges"),
        (d, maps.lines_dark, "dark"),
        (b, maps.lines_bright, "bright"),
    ]:
        diff = np.abs(np.asarray(ours) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).mean() + 1e-6
        assert diff.max() / scale < 5e-3, f"{name}: {diff.max()} vs scale {scale}"


def test_isotropic_energy_matches_xla():
    """rho==0 pixels (c2=c3=0) must steer to theta=0 like arctan2(0,0)/2.

    A constant image zeroes every basis response, so c2=c3=0 everywhere —
    the regression case where the algebraic half-angle kernels previously
    chose theta=pi/4 and diverged from the XLA path (ADVICE r1)."""
    from cvsteer_tpu.ops.pallas_frontend import g2_maps_tiled_pallas

    bank = g2_bank()
    flat = jnp.full((32, 160), 0.5, jnp.float32)
    maps = steerable_pipeline_g2(flat, bank, method="xla")
    for fn in (g2_maps_pallas, g2_maps_tiled_pallas):
        e, d, b = fn(flat, bank.xtaps, bank.ytaps)
        for ours, ref in [(e, maps.edges), (d, maps.lines_dark), (b, maps.lines_bright)]:
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


def test_vmem_gate_falls_back():
    # a 4k image must not claim pallas whole-tile support (16MB VMEM)
    assert not pallas_supported(2160, 4096, 7, 4)
    # the golden test image fits comfortably
    assert pallas_supported(185, 256, 7, 4)
    # mid-size G4 (22 live row+basis buffers) routes to the tiled kernel
    assert not pallas_supported(256, 384, 11, 6)


def test_tiled_maps_match_xla_pipeline(small_fish):
    from cvsteer_tpu.ops.pallas_frontend import g2_maps_tiled_pallas

    bank = g2_bank()
    maps = steerable_pipeline_g2(jnp.asarray(small_fish), bank, method="xla")
    # tile_h=16 over a 64-row image -> 4 bands, exercises the band overlap
    e, d, b = g2_maps_tiled_pallas(
        jnp.asarray(small_fish), bank.xtaps, bank.ytaps, tile_h=16
    )
    for ours, ref, name in [
        (e, maps.edges, "edges"),
        (d, maps.lines_dark, "dark"),
        (b, maps.lines_bright, "bright"),
    ]:
        diff = np.abs(np.asarray(ours) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).mean() + 1e-6
        assert diff.max() / scale < 5e-3, f"{name}: {diff.max()} vs scale {scale}"


def test_tiled_maps_bf16_outputs(small_fish):
    """out_dtype=bfloat16 (the CLI/bench path): same maps to within bf16
    rounding of the fp32 kernel — consumers quantize to u8 where the
    2^-9 step is invisible (docs/ROOFLINE.md round 3)."""
    from cvsteer_tpu.ops.pallas_frontend import g2_maps_tiled_pallas

    bank = g2_bank()
    img = jnp.asarray(small_fish)
    f32 = g2_maps_tiled_pallas(img, bank.xtaps, bank.ytaps, tile_h=16)
    b16 = g2_maps_tiled_pallas(
        img, bank.xtaps, bank.ytaps, tile_h=16, out_dtype=jnp.bfloat16
    )
    for a, b, name in zip(f32, b16, ["edges", "dark", "bright"]):
        assert b.dtype == jnp.bfloat16, name
        diff = np.abs(np.asarray(a) - np.asarray(b, np.float32))
        # bf16 rounding of the fp32 value: <= 2^-9 relative to each pixel
        bound = np.abs(np.asarray(a)) * 2.0 ** -8 + 1e-6
        assert (diff <= bound).all(), f"{name}: {diff.max()}"


def test_tiled_maps_batched(small_fish):
    from cvsteer_tpu.ops.pallas_frontend import g2_maps_tiled_pallas

    bank = g2_bank()
    batch = jnp.stack([jnp.asarray(small_fish), jnp.asarray(small_fish[::-1])])
    e, d, b = g2_maps_tiled_pallas(batch, bank.xtaps, bank.ytaps, tile_h=32)
    assert e.shape == (2, 64, 160)
    ref = steerable_pipeline_g2(batch, bank, method="xla")
    scale = np.abs(np.asarray(ref.edges)).mean() + 1e-6
    assert np.abs(np.asarray(e) - np.asarray(ref.edges)).max() / scale < 5e-3


def test_bank_tiled_matches_xla(small_fish):
    from cvsteer_tpu.ops.pallas_frontend import bank_tiled_pallas

    for bank in (g2h2_bank(), g4h4_bank()):
        ref = np.asarray(filter_bank_xla(jnp.asarray(small_fish), bank.xtaps, bank.ytaps))
        til = np.asarray(
            bank_tiled_pallas(jnp.asarray(small_fish), bank.xtaps, bank.ytaps, tile_h=16)
        )
        assert til.shape == ref.shape
        np.testing.assert_allclose(til, ref, atol=5e-3, rtol=1e-4)


def test_basis_pallas_is_differentiable(small_fish):
    """Gradients flow through the pallas basis (custom VJP via XLA adjoint)."""
    from cvsteer_tpu.filters.g2 import g2_basis
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    bank = g2h2_bank()
    img = jnp.asarray(small_fish)

    def loss_pallas(im):
        b = g2_basis(im, method="pallas")
        return jnp.sum(b**2)

    def loss_xla(im):
        b = filter_bank_xla(im, bank.xtaps, bank.ytaps)
        return jnp.sum(b**2)

    g_p = np.asarray(jax.grad(loss_pallas)(img))
    g_x = np.asarray(jax.grad(loss_xla)(img))
    scale = np.abs(g_x).max() + 1e-9
    assert np.abs(g_p - g_x).max() / scale < 1e-3


def test_g4_basis_pallas_is_differentiable(small_fish):
    from cvsteer_tpu.filters.g4 import g4_basis

    bank = g4h4_bank()
    img = jnp.asarray(small_fish)
    g_p = np.asarray(jax.grad(lambda im: jnp.sum(g4_basis(im, method="pallas") ** 2))(img))
    g_x = np.asarray(jax.grad(
        lambda im: jnp.sum(filter_bank_xla(im, bank.xtaps, bank.ytaps) ** 2)
    )(img))
    assert np.abs(g_p - g_x).max() / (np.abs(g_x).max() + 1e-9) < 1e-3


def test_g4_fused_maps_match_xla_pipeline(small_fish):
    """Fused G4 maps kernel vs the XLA G4 pipeline + phase extractors."""
    from cvsteer_tpu.filters import g2 as fg2
    from cvsteer_tpu.filters.g4 import g4_bank, steerable_pipeline_g4
    from cvsteer_tpu.ops.pallas_frontend import g4_maps_pallas

    bank = g4_bank()
    m = steerable_pipeline_g4(jnp.asarray(small_fish), bank, method="xla")
    ref = (
        fg2.find_edges(m.magnitude, m.phase),
        fg2.find_dark_lines(m.magnitude, m.phase),
        fg2.find_bright_lines(m.magnitude, m.phase),
    )
    e, d, b = g4_maps_pallas(jnp.asarray(small_fish), bank.xtaps, bank.ytaps)
    for ours, want, name in [(e, ref[0], "edges"), (d, ref[1], "dark"), (b, ref[2], "bright")]:
        diff = np.abs(np.asarray(ours) - np.asarray(want))
        scale = np.abs(np.asarray(want)).mean() + 1e-6
        assert diff.max() / scale < 1e-2, f"{name}: {diff.max()} vs scale {scale}"


def test_pyr_down_pallas_matches_opencv():
    """Fused blur+decimate kernel vs cv2.pyrDown on an aligned frame.

    On CPU meshes pyr_down_pallas returns None (fast path is TPU-only) and
    this degenerates to the existing bank-path parity; on the real-TPU CI
    leg it exercises the stride-2 banded matmuls + in-matrix REFLECT_101.
    """
    import cv2

    from cvsteer_tpu.ops.pallas_frontend import pyr_down_pallas
    from cvsteer_tpu.ops.pyramid import pyr_down

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    # bf16x2 image-operand split: ~2^-17 relative; XLA/CPU path is exact
    assert np.abs(ours - ref).max() <= 255 * 3e-5 + 1e-3


def _p3_kept(p):
    """Mask of cells holding a real survivor (not the P3_SENTINEL mask).

    Strict > against the sentinel itself: masked cells carry P3_SENTINEL
    bit-exactly (the cell pick is bit-exact) and padding is -inf — the same
    test features.keypoints.detect_keypoints_packed applies."""
    from cvsteer_tpu.ops.pallas_frontend import P3_SENTINEL

    return np.asarray(p) > np.float32(P3_SENTINEL)


def _unpack_p3(p):
    """(score with low mantissa bits cleared, offset) from a packed p3 map."""
    bits = np.asarray(p, np.float32).view(np.int32)
    off = np.where(_p3_kept(p), bits & 15, 0)
    sc = (bits & ~15).view(np.float32)
    return sc, off


def test_features_full_kernel_matches_xla_reference(small_fish):
    """One-pass features kernel (basis + fused NMS + packed pooled score +
    subpixel offsets + half-angle) vs the XLA reference path."""
    from cvsteer_tpu.ops.pallas_frontend import (
        _g2_features_full_reference_xla,
        g2_features_full_pallas,
    )

    bank = g2h2_bank()
    img = jnp.asarray(small_fish)
    thr = 0.5
    out_k = g2_features_full_pallas(img, bank.xtaps, bank.ytaps, threshold=thr)
    out_r = _g2_features_full_reference_xla(img, bank.xtaps, bank.ytaps, thr, 2)
    names = ["p3", "dy", "dx", "ct", "st", "basis"]
    # survivor pixels: p3 is a 3x3 window max, so a pixel is an actual NMS
    # survivor iff its own p3 entry decodes back to itself (offset mods are
    # unique within the centered window)
    p3r = np.asarray(out_r[0])
    _, off_r = _unpack_p3(p3r)
    yy, xx = np.indices(p3r.shape)
    survivors = _p3_kept(p3r) & (off_r == (yy % 3) * 3 + xx % 3)
    for name, a, b in zip(names, out_k, out_r):
        a, b = np.asarray(a), np.asarray(b)
        if name == "p3":
            fa, fb = _p3_kept(a), _p3_kept(b)
            # NMS survivor sets may differ only where scores tie to ~1e-4
            assert (fa != fb).mean() < 1e-3
            both = fa & fb
            sa, oa = _unpack_p3(np.where(both, a, 0.0))
            sb, ob = _unpack_p3(np.where(both, b, 0.0))
            scale = np.abs(sb).max() + 1e-6
            assert np.abs(sa - sb).max() / scale < 1e-2
            # offsets agree wherever the window winner is unambiguous
            # (score paths differ by ~1e-5, so near-ties may swap)
            close = np.abs(sa - sb) / scale < 1e-5
            assert (oa[both & (np.abs(a) > 0)] == ob[both & (np.abs(a) > 0)])[
                close[both & (np.abs(a) > 0)]
            ].mean() > 0.99
        elif name in ("dy", "dx"):
            # subpixel offsets are consumed only at selected keypoints;
            # compare at survivor pixels (elsewhere the 5-point stencil is
            # evaluated on near-flat scores and is ill-conditioned)
            d = np.abs(a - b)[survivors]
            assert d.size == 0 or d.max() < 1e-2, name
        elif name in ("ct", "st"):
            d = np.abs(a - b)[survivors]
            assert d.size == 0 or d.max() < 1e-2, name
        else:
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / scale < 1e-2, name


def test_p3_onehot_cell_pick_is_bit_exact():
    """_p3_cells (one-hot HIGHEST matmuls) must equal p3[1::3, 1::3]
    BIT-for-bit: the low 4 mantissa bits carry the winner offset. Exercises
    the finite P3_SENTINEL (0 * -inf would have been NaN) and ragged
    trailing cells. On the TPU CI leg this pins the bf16x3 operand-split
    exactness the pick relies on; on CPU it pins the fp32 path."""
    from cvsteer_tpu.features.keypoints import _p3_cells
    from cvsteer_tpu.ops.pallas_frontend import P3_SENTINEL

    rng = np.random.default_rng(7)
    # The magnitude sweep pins the exactness domain's measured lower edge:
    # the bf16x3 split's lo residual sits ~2^-50 below the value, and on
    # the real MXU it flushes (subnormal) once values drop below ~2^-100 —
    # measured 2026-08-20 on v5e: bit-exact at 1e-30..1e-25 scale, 3/672
    # cells corrupt at 1e-35..1e-30, 204/672 at 1e-37..1e-35. The 1e-30
    # case pins that boundary on the TPU leg; packed corner scores are
    # thresholded far above it (see keypoints._p3_cells docstring).
    for (H, W), lo, hi in [
        ((512, 512), 1e-6, 1e6),
        ((185, 256), 1e-6, 1e6),
        ((13, 17), 1e-6, 1e6),
        ((64, 96), 1e-30, 1e-25),
    ]:
        mag = rng.uniform(lo, hi, (H, W)).astype(np.float32)
        x = (rng.standard_normal((H, W)).astype(np.float32) * mag)
        bits = x.view(np.int32)
        obits = rng.integers(0, 9, (H, W)).astype(np.int32)
        packed = ((bits & ~15) | obits).view(np.float32)
        keep = rng.uniform(size=(H, W)) < 0.3
        p3 = np.where(keep, packed, np.float32(P3_SENTINEL)).astype(np.float32)
        got = np.asarray(jax.jit(_p3_cells)(jnp.asarray(p3)))
        want = p3[1::3, 1::3]
        assert got.shape == want.shape
        assert (got.view(np.int32) == want.view(np.int32)).all(), (H, W)


def test_detect_keypoints_packed_matches_premasked(small_fish):
    """The packed-pool selection path yields the same keypoints as the
    round-2 premasked selection on the same detector maps (CPU/XLA)."""
    from cvsteer_tpu.features.keypoints import (
        detect_keypoints_packed,
        detect_keypoints_premasked,
    )
    from cvsteer_tpu.ops.pallas_frontend import _g2_features_full_reference_xla

    bank = g2h2_bank()
    img = jnp.asarray(small_fish)
    thr = 0.5
    p3, dy, dx, ct, st, basis = _g2_features_full_reference_xla(
        img, bank.xtaps, bank.ytaps, thr, 2
    )
    kp = detect_keypoints_packed(p3, dy, dx, ct, st, max_keypoints=64)
    # reference: exact top-k on the full masked map
    from cvsteer_tpu.filters.g2 import g2_bank, steerable_pipeline_g2

    score, ctr, str_ = __import__(
        "cvsteer_tpu.ops.pallas_frontend", fromlist=["x"]
    )._g2_feature_maps_reference_xla(img, bank.xtaps, bank.ytaps)
    from cvsteer_tpu.features.keypoints import detect_keypoints_cs

    kp_ref = detect_keypoints_cs(
        score, ctr, str_, max_keypoints=64, nms_radius=2, threshold=thr
    )
    n, n_ref = int(kp.valid.sum()), int(kp_ref.valid.sum())
    assert n == n_ref
    a = np.asarray(kp.yx)[np.asarray(kp.valid)]
    b = np.asarray(kp_ref.yx)[np.asarray(kp_ref.valid)]
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    assert np.allclose(a, b, atol=1e-5)
    # scores agree to the 4 cleared mantissa bits
    sa = np.sort(np.asarray(kp.score)[np.asarray(kp.valid)])
    sb = np.sort(np.asarray(kp_ref.score)[np.asarray(kp_ref.valid)])
    assert np.allclose(sa, sb, rtol=2.0 ** -18)


def test_accuracy_classes_on_chip(small_fish):
    """The two documented accuracy classes hold on the executing backend
    (VERDICT r2 item 10). On the real-TPU CI leg this pins the bf16x3
    fast kernel at its ~2e-3 max-rel-to-mean class and the fp32 pipeline
    at ~1e-4; on CPU meshes both collapse to the XLA path and the bounds
    hold trivially — the test is in the TPU leg's file selection so the
    on-chip claim is CI-checked."""
    from cvsteer_tpu.filters.g2 import g2_bank, g2_output_maps, steerable_pipeline_g2

    bank = g2_bank()
    img = jnp.asarray(small_fish)
    ref = steerable_pipeline_g2(img, bank, method="xla")
    ref_maps = [np.asarray(m) for m in (ref.edges, ref.lines_dark, ref.lines_bright)]

    fast = [np.asarray(m, np.float32) for m in g2_output_maps(img, bank, accuracy="fast")]
    precise = [
        np.asarray(m, np.float32)
        for m in g2_output_maps(img, bank, accuracy="precise")
    ]
    for f, p, r in zip(fast, precise, ref_maps):
        scale = np.abs(r).mean() + 1e-6
        assert np.abs(f - r).max() / scale < 2e-2  # fast class (bf16x3)
        assert np.abs(p - r).max() / scale < 1e-3  # precise class (fp32)


def test_desc_patch_dma_matches_gather_path():
    """Pallas patch-DMA descriptor sampling vs the XLA pair-table gather.

    Random keypoint-like sample clouds including exact image corners and
    a level-4-sized image smaller than the DMA window (table padding
    path). Interpreter mode on CPU meshes; Mosaic on the TPU CI leg.
    """
    from cvsteer_tpu.ops.interp import bilinear_sample_channels_last_pair_bf16
    from cvsteer_tpu.ops.pallas_desc import bilinear_sample_patch_dma

    rng = np.random.default_rng(3)
    for B, H, W in [(2, 64, 128), (1, 30, 40)]:
        C, N, S = 7, 16, 16
        basis = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
        kc_y = rng.uniform(0, H - 1, (B, N))
        kc_x = rng.uniform(0, W - 1, (B, N))
        # pin some keypoints to the exact corners (border-clamp coverage)
        kc_y[:, 0], kc_x[:, 0] = 0.0, 0.0
        kc_y[:, 1], kc_x[:, 1] = H - 1.0, W - 1.0
        off = rng.uniform(-6.8, 6.8, (B, N, S, 2))
        ys = jnp.asarray(np.clip(kc_y[..., None] + off[..., 0], 0, H - 1).astype(np.float32))
        xs = jnp.asarray(np.clip(kc_x[..., None] + off[..., 1], 0, W - 1).astype(np.float32))

        ref = jax.vmap(
            lambda im, y, x: bilinear_sample_channels_last_pair_bf16(
                jnp.moveaxis(im.astype(jnp.bfloat16), 0, -1),
                y.reshape(-1), x.reshape(-1),
            ).reshape(N, S, C)
        )(basis, ys, xs)
        out = bilinear_sample_patch_dma(basis, ys, xs)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        # both paths sample in bf16; they differ only in where the bf16
        # rounding lands (weights vs table), so the gap is one bf16 ulp
        assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_desc_patch_dma_gate():
    """The window contract gate: default G2/G4 shapes pass; oversized
    descriptor grids and non-vreg sample counts fall back."""
    from cvsteer_tpu.features.descriptors import patch_dma_supported

    assert patch_dma_supported(4, 3.0, 7)       # G2 default
    assert patch_dma_supported(4, 3.0, 11)      # G4 default
    assert not patch_dma_supported(3, 3.0, 7)   # 9*8 lanes not vreg-aligned
    assert not patch_dma_supported(4, 8.0, 7)   # cloud exceeds the window


def test_phase_descriptors_batch_matches_vmapped(small_fish):
    """phase_descriptors_batch == vmap(phase_descriptors) on the gather
    backend (and within the bf16 sampling class when the kernel engages)."""
    from cvsteer_tpu.features.descriptors import (
        phase_descriptors,
        phase_descriptors_batch,
    )
    from cvsteer_tpu.features.keypoints import Keypoints

    bank = g2h2_bank()
    img = jnp.asarray(small_fish)
    basis = filter_bank_xla(img, bank.xtaps, bank.ytaps)[None]
    rng = np.random.default_rng(5)
    N = 16
    H, W = img.shape
    kp = Keypoints(
        yx=jnp.asarray(rng.uniform(2, min(H, W) - 2, (1, N, 2)).astype(np.float32)),
        score=jnp.ones((1, N), jnp.float32),
        theta=jnp.asarray(rng.uniform(-np.pi, np.pi, (1, N)).astype(np.float32)),
        valid=jnp.ones((1, N), bool),
    )
    a = jax.vmap(lambda b, k: phase_descriptors(b, k))(
        basis, kp
    )
    b = phase_descriptors_batch(basis, kp)
    assert np.asarray(jnp.abs(a - b)).max() < 2e-2


def test_desc_patch_dma_g4_channels():
    """cp=16 path (G4/H4's 11 channels): window contract + parity."""
    from cvsteer_tpu.ops.interp import bilinear_sample_channels_last_pair_bf16
    from cvsteer_tpu.ops.pallas_desc import bilinear_sample_patch_dma

    rng = np.random.default_rng(9)
    B, C, H, W, N, S = 1, 11, 48, 96, 8, 16
    basis = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    kc_y = rng.uniform(0, H - 1, (B, N))
    kc_x = rng.uniform(0, W - 1, (B, N))
    off = rng.uniform(-6.4, 6.4, (B, N, S, 2))
    ys = jnp.asarray(np.clip(kc_y[..., None] + off[..., 0], 0, H - 1).astype(np.float32))
    xs = jnp.asarray(np.clip(kc_x[..., None] + off[..., 1], 0, W - 1).astype(np.float32))
    ref = jax.vmap(
        lambda im, y, x: bilinear_sample_channels_last_pair_bf16(
            jnp.moveaxis(im.astype(jnp.bfloat16), 0, -1),
            y.reshape(-1), x.reshape(-1),
        ).reshape(N, S, C)
    )(basis, ys, xs)
    out = bilinear_sample_patch_dma(basis, ys, xs, cp=16)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_bf16_descriptor_class_end_to_end(small_fish):
    """The bf16 sampling accuracy class is FREE downstream: descriptors
    from the production path (patch-DMA on TPU, bf16 pair gather
    elsewhere) against the fp32 sampling oracle
    (FrontendConfig.desc_fp32_sampling) stay above 0.995 cosine and
    produce the same matches. Measured on-chip (DESC_ACCURACY_r04.json):
    cosine min 0.999998, identical match sets at gaps 1/4/8, trajectory
    ATE delta 0.01 m (noise level)."""
    from cvsteer_tpu.features.frontend import FrontendConfig, extract_features
    from cvsteer_tpu.features.matching import match_descriptors

    img = jnp.asarray(small_fish)
    a = extract_features(img, cfg=FrontendConfig(levels=2))
    b = extract_features(
        img, cfg=FrontendConfig(levels=2, desc_fp32_sampling=True)
    )
    v = np.asarray(a.valid) & np.asarray(b.valid)
    assert v.sum() >= 50
    cos = np.sum(np.asarray(a.desc)[v] * np.asarray(b.desc)[v], axis=1)
    assert cos.min() > 0.995, f"bf16-vs-fp32 cosine {cos.min()}"
    # self-match across the two paths: every descriptor must pick itself
    m = match_descriptors(a.desc, a.valid, b.desc, b.valid, ratio=0.95)
    idx = np.asarray(m.index)[v]
    assert (idx == np.arange(len(np.asarray(a.valid)))[v]).mean() > 0.99
