"""Fused Pallas TPU kernels for the steerable-filter front-end.

The reference's hot path is 2*K one-dimensional convolution passes over
HBM-resident images plus ~20 elementwise full-image passes
(cvsteer/SteerableFiltersG2.cpp:60-99, :147-177, :179-199). Here the whole
front-end is ONE VMEM-resident kernel per image tile:

  HBM read:  the padded image, once.
  VMEM:      row pass  R_k = sum_t xtap[k,t] * img[:, t:t+W]      (K row convs)
             col pass  B_k = sum_t ytap[k,t] * R_k[t:t+H, :]      (K col convs)
             energy coefficients c1, c2, c3 (16 products)
             dominant-orientation steering + phase-selective maps.
  HBM write: only the requested output maps.

Transcendental-free steering: the pipeline needs cos/sin of
theta = arctan2(c3, c2) / 2, which follow algebraically from half-angle
identities (rho = hypot(c2, c3); cos 2t = c2/rho; sin 2t = c3/rho;
cos t = sqrt((1+cos 2t)/2), sin t = sign(c3) * sqrt((1-cos 2t)/2) — valid
because theta in (-pi/2, pi/2]). The phase-selective extractors collapse to
algebra too (magnitude = hypot(g2, h2), cos(phase) = g2/mag,
sin(phase) = h2/mag):

  edges  = mag * cos^2(|phase|-pi/2 err) = h2^2 / mag
  dark   = mag * cos^2(phase) [cos(phase) > 0] = g2^2 * [g2 > 0] / mag
  bright = mag * cos^2(phase) [cos(phase) < 0] = g2^2 * [g2 < 0] / mag

matching find{Edges,DarkLines,BrightLines}(magnitude, phase, ...) as the
reference CLI/test call them (example/steer.cpp:88-90, quirk C23).

Layout: lanes = image width (padded to 128), sublanes = image height.
One unified row-tiled kernel serves every size and all three products
(G2 maps / detector maps / G4 maps): 8-aligned double-buffered band DMA,
pltpu.roll lane shifts, tap-deduplicated row pass emitting pre-split bf16
hi/lo, 3-dot bf16x3 MXU column pass with REFLECT_101 rows baked into
per-tile-class matrices. See docs/ROOFLINE.md for the measured breakdown.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Masked-score sentinel for the packed pooled selection map (p3). The
# natural mask is -inf, but detect_keypoints_packed extracts the stride-3
# cell table with an exact one-hot Precision.HIGHEST matmul (the strided
# slice lowers to an ~18 us/frame row gather on v5e; the matmul costs ~4 us)
# and 0 * -inf = NaN would poison that contraction. This is the most
# negative fp32 that is EXACTLY representable in bfloat16 (0xFF7F0000 =
# -255 * 2^120), so it survives the MXU's bf16x3 operand split bit-exactly,
# and its low mantissa bits are zero so the offset decode stays trivial.
P3_SENTINEL = -255.0 * 2.0**120


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU test meshes)."""
    return jax.default_backend() != "tpu"


def _pad_for_kernel(
    image: jax.Array, r: int, ho: int, wo: int, wp: Optional[int] = None
) -> jax.Array:
    """Reflect-pad by r (REFLECT_101 parity), then zero-pad to (ho+2r, wp).

    ``wp`` defaults to wo+2r; the tiled kernel passes a 128-aligned width
    because Mosaic requires DMA slices aligned to the lane tiling.
    """
    *b, h, w = image.shape
    pad_hw = [(0, 0)] * (image.ndim - 2) + [(r, r), (r, r)]
    img = jnp.pad(image.astype(jnp.float32), pad_hw, mode="reflect")
    if wp is None:
        wp = wo + 2 * r
    extra = [(0, 0)] * (image.ndim - 2) + [(0, ho - h), (0, wp - (w + 2 * r))]
    return jnp.pad(img, extra)


def _row_col_bank(padded, xtaps: np.ndarray, ytaps: np.ndarray, h: int, w: int):
    """Unrolled separable bank over a VMEM-resident padded tile.

    padded: [h + 2r, w + 2r(+align)] array value. Returns list of K [h, w]
    basis arrays. Taps are baked as python-float constants.
    """
    K, T = xtaps.shape
    out = []
    for k in range(K):
        xt = [float(v) for v in xtaps[k]]
        yt = [float(v) for v in ytaps[k]]
        row = None
        for t in range(T):
            term = padded[:, t : t + w] * xt[t]
            row = term if row is None else row + term
        col = None
        for t in range(T):
            term = row[t : t + h, :] * yt[t]
            col = term if col is None else col + term
        out.append(col)
    return out


# ---------------------------------------------------------------------------
# Generic basis-bank kernel: image -> [K, H, W]
# ---------------------------------------------------------------------------


def _bank_kernel(img_ref, out_ref, *, xtaps, ytaps, h, w):
    padded = img_ref[0]
    basis = _row_col_bank(padded, xtaps, ytaps, h, w)
    for k, b in enumerate(basis):
        out_ref[0, k] = b


def _vmem_bytes_estimate(hi: int, wi: int, k: int) -> int:
    # padded tile + K row buffers + K basis buffers + transient temporaries,
    # fp32 — Mosaic's scoped stack holds roughly this live set at once.
    return 4 * hi * wi * (2 * k + 6)


# VMEM is ~16 MB/core on v5e; leave generous headroom for Mosaic's own
# buffers — a whole-tile kernel that overflows fails the entire compile,
# while routing to the tiled kernel merely costs a few percent.
_VMEM_BUDGET = 10 * 1024 * 1024


def pallas_supported(h: int, w: int, k: int, radius: int) -> bool:
    hi = _round_up(h, 8) + 2 * radius
    wi = _round_up(w, 128) + 2 * radius
    return _vmem_bytes_estimate(hi, wi, k) <= _VMEM_BUDGET


def filter_bank_pallas(image: jax.Array, xtaps, ytaps) -> jax.Array:
    """Pallas version of :func:`cvsteer_tpu.ops.sepconv.filter_bank_xla`.

    image [..., H, W] -> basis [..., K, H, W]. Large images route to the
    row-tiled band-DMA kernel instead of whole-tile VMEM residence.
    """
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, h, w = image.shape

    if not pallas_supported(h, w, K, r):
        return bank_tiled_pallas(image, xtaps, ytaps)

    ho, wo = _round_up(h, 8), _round_up(w, 128)
    hi, wi = ho + 2 * r, wo + 2 * r
    img = _pad_for_kernel(image.reshape((-1, h, w)), r, ho, wo)
    n = img.shape[0]

    kernel = functools.partial(_bank_kernel, xtaps=xtaps, ytaps=ytaps, h=ho, w=wo)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hi, wi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, K, ho, wo), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, K, ho, wo), jnp.float32),
        interpret=_interpret(),
    )(img)
    return out[:, :, :h, :w].reshape(tuple(batch) + (K, h, w))


# ---------------------------------------------------------------------------
# Fully fused G2 pipeline: image -> (edges, dark, bright).
#
# One unified row-tiled kernel for all image sizes (VERDICT r1 item 9): bands
# of tile_h rows (+ conv overlap) are double-buffered HBM->VMEM; the row pass
# runs on the VPU with tap-deduplicated symmetry-folded slices and emits
# bf16 hi/lo halves straight from its register-resident accumulators; the
# column pass is three plain bf16 MXU matmuls against prebaked hi/lo banded
# matrices (the bf16x3 scheme, ~2e-3 worst-case relative on the output maps
# vs the fp32 XLA path — the fp32-exact basis path filter_bank_pallas keeps
# Precision.HIGHEST); REFLECT_101 row handling is baked into per-tile-class
# column matrices so no row padding is ever materialized in HBM.
# ---------------------------------------------------------------------------

# Mosaic's scoped-vmem live set for the fused kernel is ~32 fp32 buffers of
# the band (measured round 1: 34 MB at 520x520 whole-tile); stay well inside
# the 16 MB VMEM.
_FUSED_LIVE_BUFFERS = 32


def _dedup_xtaps(xtaps: np.ndarray):
    """Group filters whose x-tap vectors are proportional.

    Returns (reps, slot_rep, slot_scale): ``reps`` are filter indices whose
    row convolution actually runs; slot k reuses reps[slot_rep[k]] scaled by
    slot_scale[k], folded into the column matrices at build time (zero kernel
    ops). For G2/H2, G22 == H22 and G23 = sqrt(1.8430) * H23
    (cvsteer/SteerableFiltersG2.cpp:35-42), so only 5 of 7 row convs run.
    """
    reps, slot_rep, slot_scale = [], [], []
    for k in range(xtaps.shape[0]):
        hit = None
        for ri, rk in enumerate(reps):
            a = xtaps[rk].astype(np.float64)
            b = xtaps[k].astype(np.float64)
            s = float(np.dot(a, b) / np.dot(a, a))
            if np.max(np.abs(b - s * a)) <= 1e-6 * max(1.0, float(np.max(np.abs(b)))):
                hit = (ri, s)
                break
        if hit is None:
            reps.append(k)
            hit = (len(reps) - 1, 1.0)
        slot_rep.append(hit[0])
        slot_scale.append(hit[1])
    return reps, slot_rep, slot_scale


def _shifted_slices(padded, T: int, wo: int, off: int = 0):
    """The T lane-shifted band views sl[u][:, c] = padded[:, c + u - off].

    On real TPU these are pltpu.roll + an aligned slice — a dedicated lane
    rotate, measured ~2x faster end-to-end than unaligned slicing (which
    Mosaic materializes with expensive shuffles).

    off=0 (padded layout): buffer column j holds reflected-image column
    j - r; shifts are all forward and the roll wrap-around never reaches a
    valid output column. off=r (wrap layout, see _reflect_block): buffer
    column j holds TRUE image column j for j < w, with the REFLECT_101
    columns stored in the final 128-lane block so the roll wrap-around IS
    the width reflection. Interpreter mode (CPU tests) keeps plain slices
    and therefore only supports off=0.
    """
    if _interpret():
        assert off == 0
        return [padded[:, u : u + wo] for u in range(T)]
    W = padded.shape[-1]
    out = []
    for u in range(T):
        d = u - off
        if d == 0:
            out.append(padded[:, :wo])
        else:
            out.append(pltpu.roll(padded, (W - d) % W, 1)[:, :wo])
    return out


def _reflect_block(q, wo: int, r: int, band_h: int):
    """[band_h, 128] wrap block making lane rolls over q REFLECT_101-correct.

    q[:, :wo] holds the true image columns (w == wo). The row pass reads
    column (c + d) mod wp for d in [-r, r]; storing block[m] = img[w-2-m]
    (right reflection, lanes 0..r-1) and block[128-k] = img[k] (left
    reflection via wrap-around, lanes 128-r..127) in q[:, wo:wo+128] makes
    every out-of-range read land on its reflected column. Built from two
    aligned 128-lane strips with narrow rolls + one-lane selects (Mosaic
    has no lane-reversal primitive); the untouched middle lanes are never
    referenced because |d| <= r < 64.
    """
    Sr = q[:, wo - 128 : wo]
    Sl = q[:, 0:128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (band_h, 128), 1)
    block = jnp.zeros((band_h, 128), jnp.float32)
    for m in range(r):
        block = jnp.where(lane == m, pltpu.roll(Sr, 2 * m + 2, 1), block)
    for k in range(1, r + 1):
        block = jnp.where(lane == 128 - k, pltpu.roll(Sl, 128 - 2 * k, 1), block)
    return block


def _row_pass_split(padded, xtaps: np.ndarray, wo: int, reps, slot_rep, off: int = 0):
    """Dedup'd symmetry-folded row pass emitting bf16 (hi, lo) stacks.

    The hi/lo split happens on the register-resident accumulators, so the
    column matmuls below get pre-split operands and Mosaic never runs its
    own (expensive) HIGHEST-precision operand splitting passes.
    """
    K, T = xtaps.shape
    r = (T - 1) // 2
    xsl = _shifted_slices(padded, T, wo, off)
    center = xsl[r]
    sums = [xsl[r + u] + xsl[r - u] for u in range(1, r + 1)]
    diffs = [xsl[r + u] - xsl[r - u] for u in range(1, r + 1)]
    rep_hi, rep_lo = [], []
    for rk in reps:
        taps = xtaps[rk]
        even = bool(np.allclose(taps[::-1], taps, atol=1e-7))
        odd = bool(np.allclose(taps[::-1], -taps, atol=1e-7))
        if even:
            acc = center * float(taps[r])
            for u in range(1, r + 1):
                acc = acc + sums[u - 1] * float(taps[r + u])
        elif odd:
            acc = diffs[0] * float(taps[r + 1])
            for u in range(2, r + 1):
                acc = acc + diffs[u - 1] * float(taps[r + u])
        else:  # generic fallback (custom non-symmetric taps)
            acc = xsl[0] * float(taps[0])
            for u in range(1, T):
                acc = acc + xsl[u] * float(taps[u])
        hi = acc.astype(jnp.bfloat16)
        rep_lo.append((acc - hi.astype(jnp.float32)).astype(jnp.bfloat16))
        rep_hi.append(hi)
    rows_hi = jnp.stack([rep_hi[slot_rep[k]] for k in range(K)])
    rows_lo = jnp.stack([rep_lo[slot_rep[k]] for k in range(K)])
    return rows_hi, rows_lo


# Sublane alignment for Mosaic DMA row starts: every band start must be a
# multiple of 8, so bands carry an 8-row margin each side instead of r.
_ROW_ALIGN = 8


def _col_mats_reflect(
    ytaps: np.ndarray, scales, tile_h: int, h: int, h8: int, num_tiles: int,
    ext: int = 0,
) -> np.ndarray:
    """[3, K, ext + tile_h + ext, band_h] banded column-conv matrices,
    REFLECT_101 rows.

    band_h = tile_h + 16; every band's DMA start row is a multiple of 8
    (first: 0, interior: t*tile_h - 8, last: h8 - band_h with h8 = h rounded
    up to 8). Tile classes: 0 = first (top reflection baked in), 1 =
    interior (never touches a boundary: the gap between (T-1)*tile_h and h8
    is a positive multiple of 8), 2 = last (bottom reflection about the true
    h; output rows >= h and DMA'd alignment rows >= h are never referenced).
    The x-tap dedup scales are folded into each filter's rows here.

    ``ext`` > 0 additionally emits ``ext`` rows above and below the tile
    (matrix row i covers global output row t*tile_h + i - ext, reflected at
    image boundaries) so a kernel can run row-window operations (NMS) on
    the tile without cross-tile communication. Requires ext + r <=
    _ROW_ALIGN so the extended support stays inside the band.
    """
    K, T = ytaps.shape
    r = (T - 1) // 2
    assert r + ext <= _ROW_ALIGN
    a = _ROW_ALIGN
    band_h = tile_h + 2 * a
    te = tile_h + 2 * ext
    C = np.zeros((3, K, te, band_h), np.float32)

    def reflect(g):
        # REFLECT_101 about [0, h)
        while g < 0 or g >= h:
            if g < 0:
                g = -g
            else:
                g = 2 * (h - 1) - g
        return g

    def fill(slot, t, s):
        for k in range(K):
            yt = ytaps[k].astype(np.float64) * float(scales[k])
            for i in range(te):
                o = t * tile_h + i - ext
                if ext == 0 and o >= h:
                    continue  # alignment padding row: stays zero (legacy)
                # Extended / out-of-range rows mirror their reflected source
                # row's coefficients: they are NMS context only, and the
                # border mask (>= nms_radius + 1) keeps any reflected
                # context from influencing an unmasked pixel.
                g0 = reflect(o)
                for v in range(-r, r + 1):
                    g = reflect(g0 + v)
                    b = g - s
                    assert 0 <= b < band_h, (slot, t, i, v, b)
                    C[slot, k, i, b] += yt[v + r]

    fill(0, 0, 0)
    if num_tiles > 2:
        for k in range(K):
            yt = ytaps[k].astype(np.float64) * float(scales[k])
            for i in range(te):
                for v in range(-r, r + 1):
                    C[1, k, i, i - ext + v + a] += yt[v + r]
    fill(2, num_tiles - 1, h8 - band_h)
    return C


def _g4_quad_terms():
    """Unique (i, j, w2, w3) products for the G4 2nd-harmonic coefficients
    c2/c3 (filters.g4._energy_quadratic_tables, symmetrized; c1 is not
    needed for the magnitude-based output maps). 33 shared products."""
    from cvsteer_tpu.filters.g4 import _energy_quadratic_tables

    _, M2, M3 = _energy_quadratic_tables()
    M2s = (M2 + M2.T) / 2.0
    M3s = (M3 + M3.T) / 2.0
    terms = []
    for i in range(11):
        for j in range(i, 11):
            f = 1.0 if i == j else 2.0
            w2, w3 = f * float(M2s[i, j]), f * float(M3s[i, j])
            if abs(w2) > 1e-7 or abs(w3) > 1e-7:
                terms.append((i, j, w2, w3))
    return terms


def _band_prologue(
    img_hbm, band, sems, *, tile_h, wo, num_tiles, s_last, xoff
):
    """Double-buffered band DMA shared by all tiled kernels.

    Issues/waits the 8-aligned HBM->VMEM band copies (own band on the very
    first grid step, prefetch of the next band otherwise) and, on the no-pad
    fast path (xoff > 0), builds the REFLECT_101 wrap block in-kernel.
    Returns the VMEM-resident padded band [band_h, wp]."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    band_h = band.shape[1]

    def start_row(tt):
        s = jnp.where(tt == 0, 0, tt * tile_h - _ROW_ALIGN)
        s = jnp.where(tt == num_tiles - 1, s_last, s)
        return pl.multiple_of(s, _ROW_ALIGN)

    def band_dma(slot, nn, tt):
        if xoff:
            dst = band.at[slot, pl.ds(0, band_h), pl.ds(0, wo)]
        else:
            dst = band.at[slot]
        return pltpu.make_async_copy(
            img_hbm.at[nn, pl.ds(start_row(tt), band_h), :],
            dst,
            sems.at[slot],
        )

    # Slots follow the GLOBAL step index so they stay consistent across the
    # image boundary (a per-image t%2 would collide with the cross-image
    # prefetch when num_tiles is odd, and double-start the first band).
    step = n * num_tiles + t
    slot = lax.rem(step, 2)
    next_slot = lax.rem(step + 1, 2)

    # Warm-up: only the very first grid step issues its own DMA; every other
    # band was prefetched by the previous step.
    @pl.when(step == 0)
    def _():
        band_dma(slot, 0, 0).start()

    # Prefetch the next band (next tile, or first tile of the next image).
    last_tile = t == num_tiles - 1

    @pl.when(jnp.logical_not(last_tile))
    def _():
        band_dma(next_slot, n, t + 1).start()

    @pl.when(last_tile & (n + 1 < pl.num_programs(0)))
    def _():
        band_dma(next_slot, n + 1, 0).start()

    band_dma(slot, n, t).wait()

    if xoff:
        band[slot, :, wo : wo + 128] = _reflect_block(
            band[slot], wo, xoff, band_h
        )
    return band[slot]  # [band_h, wp]


def _g2_maps_tiled_kernel(
    img_hbm, chi_ref, clo_ref, edges_ref, dark_ref, bright_ref, band, sems,
    *, xtaps, tile_h, wo, num_tiles, reps, slot_rep, s_last, mode="maps",
    xoff=0,
):
    """Grid (N, T): band DMA of image rows (8-aligned window, REFLECT_101 via
    the column matrices), double-buffered across grid steps, then the fused
    front-end math on the VMEM band. See the section comment above.

    xoff=0: the image in HBM carries a materialized width reflect-pad and
    fills the whole band scratch. xoff=r (the no-pad fast path for aligned
    sizes): the UNPADDED image is DMA'd into the first wo lanes and the
    reflection lives in a wrap block built in-kernel (_reflect_block), so
    no padded copy of the image is ever written to HBM.
    """
    padded = _band_prologue(
        img_hbm, band, sems, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        s_last=s_last, xoff=xoff,
    )
    rows_hi, rows_lo = _row_pass_split(padded, xtaps, wo, reps, slot_rep, xoff)
    n = pl.program_id(0)
    t = pl.program_id(1)

    cls = jnp.where(t == 0, 0, jnp.where(t == num_tiles - 1, 2, 1))
    chi = chi_ref[cls]  # [K, tile_h, band_h] bf16
    clo = clo_ref[cls]

    dn = (((2,), (1,)), ((0,), (0,)))
    # bf16x3 BY DESIGN: pin DEFAULT so an ambient highest-precision
    # context (precise-wrapped callers) cannot rewrite these into
    # multi-pass matmuls Mosaic rejects ("Bad lhs type")
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # bf16x3: C*R = (Chi + Clo)(Rhi + Rlo) minus the negligible Clo*Rlo term
    basis = dot(chi, rows_hi) + dot(chi, rows_lo) + dot(clo, rows_hi)

    if mode == "g4maps":
        b = [basis[k] for k in range(11)]
        c2 = None
        c3 = None
        for i, j, w2, w3 in _g4_quad_terms():
            p = b[i] * b[j]
            if abs(w2) > 1e-7:
                c2 = p * w2 if c2 is None else c2 + p * w2
            if abs(w3) > 1e-7:
                c3 = p * w3 if c3 is None else c3 + p * w3
        # Sqrt-free G4 steering tail (same scheme as the G2 one below, one
        # harmonic higher): with (u, v) = (cos 2t, sin 2t), the even powers
        # are cc = ct^2 = (1+u)/2, ss = st^2 = (1-u)/2, ct*st = v/2, so
        #   g4v   = cc^2*b0 + 6*cc*ss*b2 + ss^2*b4 - 2v*(cc*b1 + ss*b3)
        #   h4v   = ct*P - st*Q,  P = cc^2*b5 + 10*cc*ss*b7 + 5*ss^2*b9,
        #                         Q = 5*cc^2*b6 + 10*cc*ss*b8 + ss^2*b10
        #   h4v^2 = ((P^2+Q^2) + u*(P^2-Q^2))/2 - v*P*Q
        # and the maps only consume g4v (with sign) and h4v^2.
        s2 = c2 * c2 + c3 * c3
        inv_rho = jnp.where(s2 > 0.0, jax.lax.rsqrt(s2), 0.0)
        u = jnp.where(s2 > 0.0, c2 * inv_rho, 1.0)
        v = c3 * inv_rho
        cc = 0.5 * (1.0 + u)
        ss = 0.5 * (1.0 - u)
        cc2, ss2, cs = cc * cc, ss * ss, cc * ss
        g4v = (
            cc2 * b[0] + 6.0 * cs * b[2] + ss2 * b[4]
            - 2.0 * v * (cc * b[1] + ss * b[3])
        )
        P = cc2 * b[5] + 10.0 * cs * b[7] + 5.0 * ss2 * b[9]
        Q = 5.0 * cc2 * b[6] + 10.0 * cs * b[8] + ss2 * b[10]
        PP, QQ = P * P, Q * Q
        h4sq = jnp.maximum(
            0.5 * ((PP + QQ) + u * (PP - QQ)) - v * (P * Q), 0.0
        )
        g4sq_r = g4v * g4v
        mag2 = g4sq_r + h4sq
        inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)
        od = edges_ref.dtype
        edges_ref[0] = (h4sq * inv_mag).astype(od)
        g4sq = g4sq_r * inv_mag
        dark_ref[0] = jnp.where(g4v > 0.0, g4sq, 0.0).astype(od)
        bright_ref[0] = jnp.where(g4v < 0.0, g4sq, 0.0).astype(od)
        return

    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(xtaps.shape[0])]

    # s/d are shared with the steering tail below (g2a^2 - g2c^2 == s*d):
    # two fewer band-sized VPU ops than the textbook form (round-3 probe).
    s_gd = g2a + g2c
    d_gd = g2a - g2c
    c2 = (
        0.5 * (s_gd * d_gd)
        + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c)
        + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2b * s_gd) - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )

    if mode == "features":
        rho = jnp.sqrt(c2 * c2 + c3 * c3)
        inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
        # rho==0 must steer to theta=0 (arctan2(0,0)=0, XLA path), not pi/4.
        cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
        ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
        st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
        st = jnp.where(c3 >= 0.0, st_mag, -st_mag)
        # Detector maps: corner score c1 - rho (filters.g2.corner_strength)
        # and the half-angle (cos, sin) — theta itself is recovered by
        # arctan2 only at the few selected keypoints.
        c1 = (
            0.5 * (g2b * g2b)
            + 0.25 * (g2a * g2c)
            + 0.375 * (g2a * g2a + g2c * g2c)
            + 0.3125 * (h2a * h2a + h2d * h2d)
            + 0.5625 * (h2b * h2b + h2c * h2c)
            + 0.375 * (h2a * h2c + h2b * h2d)
        )
        edges_ref[0] = c1 - rho  # score
        dark_ref[0] = ct
        bright_ref[0] = st
        return

    # Sqrt-free steering tail. With (u, v) = (cos 2t, sin 2t) = (c2, c3)/rho,
    # half-angle identities give ct^2 = (1+u)/2, st^2 = (1-u)/2, ct*st = v/2,
    # so the steered responses need NO half-angle square roots:
    #   g2v   = ((g2a+g2c) + u*(g2a-g2c))/2 - v*g2b
    #   h2v   = ct*P - st*Q  with  P = ct^2*h2a + 3*st^2*h2c,
    #                              Q = 3*ct^2*h2b + st^2*h2d
    #   h2v^2 = ((P^2+Q^2) + u*(P^2-Q^2))/2 - v*P*Q
    # and the three output maps only consume g2v (with sign) and h2v^2.
    # rho==0 must steer to theta=0 (u=1, v=0), matching arctan2(0,0) = 0.
    s2 = c2 * c2 + c3 * c3
    inv_rho = jnp.where(s2 > 0.0, jax.lax.rsqrt(s2), 0.0)
    u = jnp.where(s2 > 0.0, c2 * inv_rho, 1.0)
    v = c3 * inv_rho
    g2v = 0.5 * (s_gd + u * d_gd) - v * g2b
    P = 0.5 * ((h2a + 3.0 * h2c) + u * (h2a - 3.0 * h2c))
    Q = 0.5 * ((3.0 * h2b + h2d) + u * (3.0 * h2b - h2d))
    PP, QQ = P * P, Q * Q
    h2sq = jnp.maximum(0.5 * ((PP + QQ) + u * (PP - QQ)) - v * (P * Q), 0.0)
    g2sq = g2v * g2v
    mag2 = g2sq + h2sq
    inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)
    od = edges_ref.dtype
    edges_ref[0] = (h2sq * inv_mag).astype(od)
    g2sq_over_mag = g2sq * inv_mag
    dark_ref[0] = jnp.where(g2v > 0.0, g2sq_over_mag, 0.0).astype(od)
    bright_ref[0] = jnp.where(g2v < 0.0, g2sq_over_mag, 0.0).astype(od)


def _lane_shift(a, d: int):
    """out[:, c] = a[:, c + d]; lane-roll on TPU, wrap-around at edges
    (edge lanes carry garbage context — callers mask a border)."""
    if _interpret():
        return jnp.roll(a, -d, axis=1)
    W = a.shape[-1]
    return pltpu.roll(a, (W - d) % W, 1)


def _g2_features_full_kernel(
    img_hbm, chi_ref, clo_ref,
    p3_ref, dy_ref, dx_ref, ct_ref, st_ref, basis_ref, band, sems,
    *, xtaps, tile_h, wo, num_tiles, reps, slot_rep, s_last, xoff,
    ext, h, w, threshold, border,
):
    """Whole feature front-end per band: basis + detector maps + fused NMS
    + pooled, mantissa-packed selection map + subpixel offsets.

    One pass produces everything ``features.frontend.extract_features``
    needs per pyramid level (round-3 detect rework — the old full-res
    raw/masked maps fed an XLA pad/reshape/transpose/cells chain costing
    ~220 us/frame @480x640):

    - ``p3``: per-pixel 3x3-window max (centered) of the NMS/threshold/
      border-masked corner score, with each candidate's (y%3)*3 + x%3
      offset packed into the low 4 mantissa bits. ``p3[1::3, 1::3]`` is
      then exactly the 3x3-cell max table: top-k runs on 9x fewer
      elements and the winner's pixel position decodes from the mantissa
      bits — no cells materialization, no winner gather. Packing
      perturbs scores by <= 2^-19 relative (ties only).
    - ``dy``/``dx``: the 1-D quadratic subpixel offsets at EVERY pixel
      (the kernel owns the 5-point stencil), replacing the XLA
      shifted-map stack + table gather.
    - ``(ct, st)`` half-angle orientation and the 7 basis responses as
      before.

    The NMS + pooling run on ``ext = nms_radius + 1``-extended tile rows
    (the extended column matrices reflect at image boundaries; border
    masking at >= nms_radius + 1 makes reflected context unobservable).
    """
    padded = _band_prologue(
        img_hbm, band, sems, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        s_last=s_last, xoff=xoff,
    )
    rows_hi, rows_lo = _row_pass_split(padded, xtaps, wo, reps, slot_rep, xoff)
    t = pl.program_id(1)

    cls = jnp.where(t == 0, 0, jnp.where(t == num_tiles - 1, 2, 1))
    chi = chi_ref[cls]  # [K, tile_h + 2*ext, band_h] bf16
    clo = clo_ref[cls]
    dn = (((2,), (1,)), ((0,), (0,)))
    # bf16x3 BY DESIGN: pin DEFAULT so an ambient highest-precision
    # context (precise-wrapped callers) cannot rewrite these into
    # multi-pass matmuls Mosaic rejects ("Bad lhs type")
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    basis = dot(chi, rows_hi) + dot(chi, rows_lo) + dot(clo, rows_hi)
    basis_ref[0] = basis[:, ext : ext + tile_h, :]

    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(7)]
    s_gd = g2a + g2c
    d_gd = g2a - g2c
    c1 = (
        0.5 * (g2b * g2b)
        + 0.25 * (g2a * g2c)
        + 0.375 * (g2a * g2a + g2c * g2c)
        + 0.3125 * (h2a * h2a + h2d * h2d)
        + 0.5625 * (h2b * h2b + h2c * h2c)
        + 0.375 * (h2a * h2c + h2b * h2d)
    )
    c2 = (
        0.5 * (s_gd * d_gd)
        + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c)
        + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2b * s_gd) - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )
    rho = jnp.sqrt(c2 * c2 + c3 * c3)
    score = c1 - rho  # [tile_h + 2*ext, wo], ext = nms_radius + 1

    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
    cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
    ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
    st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
    st = jnp.where(c3 >= 0.0, st_mag, -st_mag)
    ct_ref[0] = ct[ext : ext + tile_h]
    st_ref[0] = st[ext : ext + tile_h]

    nr = ext - 1  # NMS radius; 1 extra context row/col feeds the 3x3 pooling
    s_t = score[ext : ext + tile_h]

    # Subpixel quadratic offsets at every pixel (5-point stencil): replaces
    # the XLA shifted-map table. Outer 1-px frame zeroed (lane shifts wrap;
    # those pixels are border-masked from selection anyway, zeroing makes
    # the map identical to the XLA fallback).
    row_g = t * tile_h + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
    col_g = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1)
    interior = (
        (row_g >= 1) & (row_g < h - 1) & (col_g >= 1) & (col_g < w - 1)
    )
    up = score[ext - 1 : ext - 1 + tile_h]
    down = score[ext + 1 : ext + 1 + tile_h]
    left = _lane_shift(s_t, -1)
    right = _lane_shift(s_t, 1)
    den_y = up - 2.0 * s_t + down
    dy = jnp.where(jnp.abs(den_y) > 1e-12, 0.5 * (up - down) / den_y, 0.0)
    den_x = left - 2.0 * s_t + right
    dx = jnp.where(jnp.abs(den_x) > 1e-12, 0.5 * (left - right) / den_x, 0.0)
    dy_ref[0] = jnp.where(interior, jnp.clip(dy, -0.5, 0.5), 0.0)
    dx_ref[0] = jnp.where(interior, jnp.clip(dx, -0.5, 0.5), 0.0)

    # NMS on tile rows +- 1 (the pooling window below needs masked scores
    # one row beyond the tile): lane-rolled x-max over all extended rows,
    # then the row window per extended output row.
    m = score
    for d in range(1, nr + 1):
        m = jnp.maximum(m, jnp.maximum(_lane_shift(score, d), _lane_shift(score, -d)))
    k0 = ext - 1 - nr
    win = m[k0 : k0 + tile_h + 2]
    for d in range(1, 2 * nr + 1):
        win = jnp.maximum(win, m[k0 + d : k0 + d + tile_h + 2])
    s_e = score[ext - 1 : ext + 1 + tile_h]  # rows t*tile_h - 1 .. + tile_h
    is_max = s_e >= win

    b = ext  # border = nms_radius + 1
    row_e = t * tile_h - 1 + jax.lax.broadcasted_iota(jnp.int32, s_e.shape, 0)
    col_e = jax.lax.broadcasted_iota(jnp.int32, s_e.shape, 1)
    keep = (
        is_max & (s_e > threshold)
        & (row_e >= b) & (row_e < h - b) & (col_e >= b) & (col_e < w - b)
    )
    # Pack each survivor's in-cell offset (y%3)*3 + x%3 into the low 4
    # mantissa bits (<= 2^-19 relative perturbation; survivors are > 0).
    obits = lax.rem(row_e, 3) * 3 + lax.rem(col_e, 3)
    sbits = lax.bitcast_convert_type(s_e, jnp.int32)
    packed_f = lax.bitcast_convert_type((sbits & ~15) | obits, jnp.float32)
    packed = jnp.where(keep, packed_f, P3_SENTINEL)
    # Centered 3x3 window max: p3[1::3, 1::3] is the 3x3-cell max table.
    m3 = jnp.maximum(
        packed, jnp.maximum(_lane_shift(packed, 1), _lane_shift(packed, -1))
    )
    p3_ref[0] = jnp.maximum(
        m3[0:tile_h], jnp.maximum(m3[1 : 1 + tile_h], m3[2 : 2 + tile_h])
    )


def _g2_maps_reference_xla(image, xtaps, ytaps):
    """fp32 XLA fallback for shapes the banded kernel cannot tile (tiny
    images): the same maps algebra over filter_bank_xla basis responses."""
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    basis = filter_bank_xla(image, xtaps, ytaps)
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[..., k, :, :] for k in range(7)]
    c2 = (
        0.5 * (g2a * g2a - g2c * g2c)
        + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c)
        + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2a * g2b) - g2b * g2c - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )
    rho = jnp.sqrt(c2 * c2 + c3 * c3)
    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
    cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
    ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
    st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
    st = jnp.where(c3 >= 0.0, st_mag, -st_mag)
    ct2, st2 = ct * ct, st * st
    g2v = ct2 * g2a - 2.0 * ct * st * g2b + st2 * g2c
    h2v = ct * ct2 * h2a - 3.0 * ct2 * st * h2b + 3.0 * ct * st2 * h2c - st * st2 * h2d
    mag2 = g2v * g2v + h2v * h2v
    inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)
    edges = (h2v * h2v) * inv_mag
    g2sq = (g2v * g2v) * inv_mag
    dark = jnp.where(g2v > 0.0, g2sq, 0.0)
    bright = jnp.where(g2v < 0.0, g2sq, 0.0)
    return edges, dark, bright


def g2_maps_pallas(
    image: jax.Array, xtaps, ytaps, *, out_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused front-end: image [..., H, W] -> (edges, lines_dark, lines_bright).

    One HBM read of the image, three map writes; everything else VMEM-
    resident. Alias for the unified row-tiled kernel (the former whole-tile
    variant was removed in round 2 — one formulation, one tile policy)."""
    return g2_maps_tiled_pallas(image, xtaps, ytaps, out_dtype=out_dtype)


def _g2_feature_maps_reference_xla(image, xtaps, ytaps):
    """fp32 XLA fallback for the detector maps (tiny images / CPU)."""
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    basis = filter_bank_xla(image, xtaps, ytaps)
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[..., k, :, :] for k in range(7)]
    c1 = (
        0.5 * (g2b * g2b)
        + 0.25 * (g2a * g2c)
        + 0.375 * (g2a * g2a + g2c * g2c)
        + 0.3125 * (h2a * h2a + h2d * h2d)
        + 0.5625 * (h2b * h2b + h2c * h2c)
        + 0.375 * (h2a * h2c + h2b * h2d)
    )
    c2 = (
        0.5 * (g2a * g2a - g2c * g2c)
        + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c)
        + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2a * g2b) - g2b * g2c - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )
    rho = jnp.sqrt(c2 * c2 + c3 * c3)
    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
    cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
    ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
    st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
    st = jnp.where(c3 >= 0.0, st_mag, -st_mag)
    return c1 - rho, ct, st


def _g4_maps_reference_xla(image, xtaps, ytaps):
    """fp32 XLA fallback for the fused G4 maps (tiny images / CPU)."""
    from cvsteer_tpu.filters import g2 as fg2
    from cvsteer_tpu.filters import g4 as fg4
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    basis = filter_bank_xla(image, xtaps, ytaps)
    _, c2, c3 = fg4.energy_coefficients(basis)
    theta, _ = fg4.dominant_orientation(c2, c3)
    g4v, h4v = fg4.steer(basis, theta)
    magnitude, phase = fg4.magnitude_phase(g4v, h4v)
    return (
        fg2.find_edges(magnitude, phase),
        fg2.find_dark_lines(magnitude, phase),
        fg2.find_bright_lines(magnitude, phase),
    )


def g4_maps_pallas(
    image: jax.Array, xtaps, ytaps, *, out_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused G4/H4 front-end: image [..., H, W] -> (edges, dark, bright).

    The G4 analog of :func:`g2_maps_pallas` (VERDICT r1 item 9): the same
    unified tiled kernel with the 4th-order tail — closed-form quadratic
    c2/c3 (33 shared basis products), transcendental-free half-angle
    steering with binomial 4th/5th-degree weights, and the magnitude-based
    phase-selective maps (quirk C23 semantics, matching the CLI g4 path)."""
    return g2_maps_tiled_pallas(image, xtaps, ytaps, mode="g4maps", out_dtype=out_dtype)


def g2_feature_maps_pallas(
    image: jax.Array, xtaps, ytaps
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused detector front-end: image [..., H, W] -> (score, cos, sin).

    score = corner strength c1 - |(c2, c3)| (filters.g2.corner_strength);
    (cos, sin) of the dominant half-angle orientation, computed without
    transcendentals. One kernel per image instead of the basis-bank +
    XLA-elementwise chain (VERDICT r1 item 4 / round-2 feature fusion)."""
    return g2_maps_tiled_pallas(image, xtaps, ytaps, mode="features")


def _row_pass_symmetric(padded, xtaps: np.ndarray, wo: int):
    """Row convolutions for all K filters over a padded band, exploiting the
    even/odd symmetry of the analytic taps (Freeman-Adelson tap functions
    are all pure-even or pure-odd, cvsteer/SteerableFiltersG2.cpp:35-42):
    mirrored slices are folded into sums/differences once, so each filter
    needs r+1 (even) or r (odd) fused multiply-adds instead of 2r+1.
    Returns a list of K [band_h, wo] row-response arrays."""
    K, T = xtaps.shape
    r = (T - 1) // 2
    xsl = _shifted_slices(padded, T, wo)
    center = xsl[r]
    sums = [xsl[r + u] + xsl[r - u] for u in range(1, r + 1)]
    diffs = [xsl[r + u] - xsl[r - u] for u in range(1, r + 1)]

    rows = []
    for k in range(K):
        taps = xtaps[k]
        even = bool(np.allclose(taps[::-1], taps, atol=1e-7))
        odd = bool(np.allclose(taps[::-1], -taps, atol=1e-7))
        if even:
            acc = center * float(taps[r])
            for u in range(1, r + 1):
                acc = acc + sums[u - 1] * float(taps[r + u])
        elif odd:
            acc = diffs[0] * float(taps[r + 1])
            for u in range(2, r + 1):
                acc = acc + diffs[u - 1] * float(taps[r + u])
        else:  # generic fallback (custom non-symmetric taps)
            acc = xsl[0] * float(taps[0])
            for u in range(1, T):
                acc = acc + xsl[u] * float(taps[u])
        rows.append(acc)
    return rows


def _col_conv_matrix(ytaps: np.ndarray, tile_h: int, band_h: int) -> np.ndarray:
    """Banded [K, tile_h, band_h] matrix with C[k, i, i+t] = ytaps[k, t].

    Lets the column pass run as one batched MXU matmul over the row-conv
    results instead of K*T sublane-shifted VPU passes (~10% end-to-end on
    v5e; requires HIGHEST precision or the fp32 operands quantize to bf16).
    """
    K, T = ytaps.shape
    C = np.zeros((K, tile_h, band_h), np.float32)
    for k in range(K):
        for i in range(tile_h):
            C[k, i, i : i + T] = ytaps[k]
    return C


DEFAULT_TILE_H = 64


def g2_maps_tiled_pallas(
    image: jax.Array, xtaps, ytaps, *, tile_h: int = DEFAULT_TILE_H,
    mode: str = "maps", out_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-tiled fused front-end for images of any size.

    The image stays in HBM unpadded in the row direction (REFLECT_101 rows
    are baked into the per-tile-class column matrices; only a width pad is
    materialized); bands of ``tile_h`` rows (+ 2*radius overlap) are
    double-buffered into VMEM and the whole pipeline (bank conv -> energy ->
    half-angle steering -> phase-selective maps) runs per band.

    ``out_dtype=jnp.bfloat16`` halves the HBM map-write traffic (3.15 ->
    1.57 MB @512x512). Every shipped consumer (CLI PNG writes, the golden
    test's 8-bit normalize) quantizes the maps to 8 bits, where bf16's
    2^-9 relative rounding is below the u8 quantization step; fp32 stays
    the default for library callers.
    """
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, h, w = image.shape

    # Auto-shrink the band height so the live set fits VMEM even for very
    # wide images (the buffer count grows with the filter count K).
    wo_est = _round_up(w, 128)
    live = _FUSED_LIVE_BUFFERS + 3 * max(K - 7, 0)
    max_tile = _VMEM_BUDGET // (4 * wo_est * live)
    tile_h = max(8, min(tile_h, (max_tile // 8) * 8))
    # The 8-aligned DMA window needs band_h = tile_h + 16 <= h8.
    h8 = _round_up(h, _ROW_ALIGN)
    tile_h = min(tile_h, ((h8 - 2 * _ROW_ALIGN) // 8) * 8 if h8 > 2 * _ROW_ALIGN else 0)
    if tile_h < 8 or r > _ROW_ALIGN:
        ref = {
            "features": _g2_feature_maps_reference_xla,
            "g4maps": _g4_maps_reference_xla,
        }.get(mode, _g2_maps_reference_xla)
        out = ref(image.astype(jnp.float32), xtaps, ytaps)
        if mode != "features" and out_dtype != jnp.float32:
            out = tuple(m.astype(out_dtype) for m in out)
        return out

    wo = _round_up(w, 128)
    num_tiles = -(-h // tile_h)  # ceil: output rows >= h, cropped below
    ho = num_tiles * tile_h
    band_h = tile_h + 2 * _ROW_ALIGN

    # Fast path for aligned shapes (512x512, 480x640, ...): DMA the raw
    # image and build the width reflection in-kernel as a wrap block
    # (_reflect_block) — no padded copy of the image is materialized in HBM
    # at all. Fallback: materialize the classic reflect-pad via XLA.
    fast_reflect = (
        not _interpret()
        and w == wo
        and w >= 128
        and h % _ROW_ALIGN == 0
        and r <= 32
    )
    img = image.reshape((-1, h, w)).astype(jnp.float32)
    if fast_reflect:
        wp = wo + 128
        xoff = r
    else:
        # Mosaic DMA slices must be lane-aligned: round padded width to 128.
        wp = _round_up(wo + 2 * r, 128)
        xoff = 0
        # Width pad: reflect r columns each side, zero-fill to wp lanes;
        # rows are zero-filled to a multiple of 8 only when h is not already
        # one (alignment rows are never referenced by the column matrices).
        img = jnp.pad(img, [(0, 0), (0, 0), (r, r)], mode="reflect")
        img = jnp.pad(img, [(0, 0), (0, h8 - h), (0, wp - (w + 2 * r))])
    n = img.shape[0]

    reps, slot_rep, slot_scale = _dedup_xtaps(xtaps)
    cmats = _col_mats_reflect(ytaps, slot_scale, tile_h, h, h8, num_tiles)
    chi = cmats.astype(jnp.bfloat16)
    clo = (cmats - np.asarray(chi, np.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(
        _g2_maps_tiled_kernel,
        xtaps=xtaps, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        reps=reps, slot_rep=slot_rep, s_last=h8 - band_h, mode=mode,
        xoff=xoff,
    )
    map_dtype = jnp.float32 if mode == "features" else out_dtype
    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, ho, wo), map_dtype)
    edges, dark, bright = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((2, band_h, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * ho * wo * (4 * K * T + 60),
            bytes_accessed=n * (h * wp * 4 + 3 * ho * wo * jnp.dtype(map_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(img, jnp.asarray(chi), jnp.asarray(clo))
    crop = lambda x: x[:, :h, :w].reshape(tuple(batch) + (h, w))
    return crop(edges), crop(dark), crop(bright)


def _g2_features_full_reference_xla(image, xtaps, ytaps, threshold, nms_radius):
    """XLA fallback for :func:`g2_features_full_pallas` (tiny images/CPU).

    Produces the same (p3, dy, dx, ct, st, basis) contract as the kernel:
    p3 = centered 3x3 window max of the NMS/threshold/border-masked score
    with the (y%3)*3 + x%3 offset packed into the low 4 mantissa bits.
    """
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    basis = filter_bank_xla(image, xtaps, ytaps)
    score, ct, st = _g2_feature_maps_reference_xla(image, xtaps, ytaps)
    *b_dims, hh, ww = score.shape
    k = 2 * nms_radius + 1
    rr = nms_radius
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (score.ndim - 2) + (k, k),
        window_strides=(1,) * score.ndim,
        padding=[(0, 0)] * (score.ndim - 2) + [(rr, rr), (rr, rr)],
    )
    bo = nms_radius + 1
    row = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    in_b = (row >= bo) & (row < hh - bo) & (col >= bo) & (col < ww - bo)
    keep = (score >= mx) & (score > threshold) & in_b

    obits = (row % 3) * 3 + col % 3
    sbits = jax.lax.bitcast_convert_type(score, jnp.int32)
    packed_f = jax.lax.bitcast_convert_type((sbits & ~15) | obits, jnp.float32)
    packed = jnp.where(keep, packed_f, P3_SENTINEL)
    p3 = jax.lax.reduce_window(
        packed, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (score.ndim - 2) + (3, 3),
        window_strides=(1,) * score.ndim,
        padding=[(0, 0)] * (score.ndim - 2) + [(1, 1), (1, 1)],
    )

    def shift(x, d, axis):
        pad = [(0, 0)] * x.ndim
        if d > 0:
            pad[axis] = (d, 0)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, x.shape[axis])
        else:
            pad[axis] = (0, -d)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(-d, x.shape[axis] - d)
        return jnp.pad(x, pad, mode="edge")[tuple(sl)]

    up = shift(score, 1, score.ndim - 2)
    down = shift(score, -1, score.ndim - 2)
    left = shift(score, 1, score.ndim - 1)
    right = shift(score, -1, score.ndim - 1)
    interior = (row >= 1) & (row < hh - 1) & (col >= 1) & (col < ww - 1)
    den_y = up - 2.0 * score + down
    dy = jnp.where(jnp.abs(den_y) > 1e-12, 0.5 * (up - down) / den_y, 0.0)
    den_x = left - 2.0 * score + right
    dx = jnp.where(jnp.abs(den_x) > 1e-12, 0.5 * (left - right) / den_x, 0.0)
    dy = jnp.where(interior, jnp.clip(dy, -0.5, 0.5), 0.0)
    dx = jnp.where(interior, jnp.clip(dx, -0.5, 0.5), 0.0)
    return p3, dy, dx, ct, st, basis


def g2_features_full_pallas(
    image: jax.Array, xtaps, ytaps, *, threshold: float,
    nms_radius: int = 2, tile_h: int = 64,
):
    """Whole detector front-end in ONE kernel pass per pyramid level.

    image [..., H, W] -> (p3, dy, dx, cos, sin, basis[..., K, H, W]).
    ``p3`` is the centered 3x3-window max of the NMS/threshold/border-masked
    corner score with the winner's (y%3)*3 + x%3 offset packed into the low
    4 mantissa bits — ``p3[1::3, 1::3]`` is the 3x3-cell max table ready
    for top-k selection (features.keypoints.detect_keypoints_packed);
    ``dy``/``dx`` are per-pixel subpixel offsets; basis feeds descriptors.
    The round-2 pipeline emitted full-res raw/masked maps and paid an XLA
    pad/reshape/transpose/cells/table chain (~220 us/frame @480x640).
    """
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    ext = nms_radius + 1  # +1 context row/col for the 3x3 pooling window
    *batch, h, w = image.shape

    wo_est = _round_up(w, 128)
    live = _FUSED_LIVE_BUFFERS + 3 * max(K - 7, 0) + 2 * K
    max_tile = _VMEM_BUDGET // (4 * wo_est * live)
    tile_h = max(8, min(tile_h, (max_tile // 8) * 8))
    h8 = _round_up(h, _ROW_ALIGN)
    tile_h = min(tile_h, ((h8 - 2 * _ROW_ALIGN) // 8) * 8 if h8 > 2 * _ROW_ALIGN else 0)
    if (
        tile_h < 8 or r + ext > _ROW_ALIGN
        or h <= 2 * (ext + 1) or w <= 2 * (ext + 1)
    ):
        return _g2_features_full_reference_xla(
            image.astype(jnp.float32), xtaps, ytaps, threshold, nms_radius
        )

    wo = _round_up(w, 128)
    num_tiles = -(-h // tile_h)
    ho = num_tiles * tile_h
    band_h = tile_h + 2 * _ROW_ALIGN

    fast_reflect = (
        not _interpret() and w == wo and w >= 128
        and h % _ROW_ALIGN == 0 and r <= 32
    )
    img = image.reshape((-1, h, w)).astype(jnp.float32)
    if fast_reflect:
        wp = wo + 128
        xoff = r
    else:
        wp = _round_up(wo + 2 * r, 128)
        xoff = 0
        img = jnp.pad(img, [(0, 0), (0, 0), (r, r)], mode="reflect")
        img = jnp.pad(img, [(0, 0), (0, h8 - h), (0, wp - (w + 2 * r))])
    n = img.shape[0]

    reps, slot_rep, slot_scale = _dedup_xtaps(xtaps)
    cmats = _col_mats_reflect(
        ytaps, slot_scale, tile_h, h, h8, num_tiles, ext=ext
    )
    chi = cmats.astype(jnp.bfloat16)
    clo = (cmats - np.asarray(chi, np.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(
        _g2_features_full_kernel,
        xtaps=xtaps, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        reps=reps, slot_rep=slot_rep, s_last=h8 - band_h, xoff=xoff,
        ext=ext, h=h, w=w, threshold=float(threshold), border=ext,
    )
    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(
        (1, K, tile_h, wo), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((n, ho, wo), jnp.float32)
    bshape = jax.ShapeDtypeStruct((n, K, ho, wo), jnp.float32)
    p3, dy, dx, ct, st, basis = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec, spec, spec, spec, bspec),
        out_shape=(shape, shape, shape, shape, shape, bshape),
        scratch_shapes=[
            pltpu.VMEM((2, band_h, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * ho * wo * (4 * K * T + 90),
            bytes_accessed=n * (h * wp + (5 + K) * ho * wo) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(img, jnp.asarray(chi), jnp.asarray(clo))
    crop = lambda x: x[..., :h, :w].reshape(
        tuple(batch) + x.shape[1:-2] + (h, w)
    )
    return crop(p3), crop(dy), crop(dx), crop(ct), crop(st), crop(basis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def filter_bank_pallas_diff(image: jax.Array, xtaps_t, ytaps_t) -> jax.Array:
    """Differentiable wrapper around :func:`filter_bank_pallas`.

    Pallas kernels carry no autodiff rules; the forward pass runs the fused
    kernel while the backward pass uses the VJP of the numerically
    equivalent XLA bank (a separable correlation's adjoint is the flipped
    convolution — jax derives it from filter_bank_xla directly). Taps are
    passed as nested tuples so they hash as static arguments.
    """
    return filter_bank_pallas(
        image, np.asarray(xtaps_t, np.float32), np.asarray(ytaps_t, np.float32)
    )


def _fbp_fwd(image, xtaps_t, ytaps_t):
    return filter_bank_pallas_diff(image, xtaps_t, ytaps_t), image


def _fbp_bwd(xtaps_t, ytaps_t, image, g):
    from cvsteer_tpu.ops.sepconv import filter_bank_xla

    xt = np.asarray(xtaps_t, np.float32)
    yt = np.asarray(ytaps_t, np.float32)
    _, vjp = jax.vjp(lambda im: filter_bank_xla(im, xt, yt), image)
    return vjp(g)


filter_bank_pallas_diff.defvjp(_fbp_fwd, _fbp_bwd)


def _taps_tuple(taps) -> tuple:
    return tuple(tuple(float(v) for v in row) for row in np.asarray(taps))


def _bank_tiled_kernel(
    img_hbm, colmat_ref, out_ref, band, sems,
    *, xtaps, tile_h, wo, num_tiles, band_h,
):
    """Generic K-filter bank over tiled bands: basis stack out [1, K, th, wo].

    ``band_h`` is tile_h + 2*radius rounded up to 8 (Mosaic requires VMEM
    slices 8-aligned in the sublane dimension — caught by the real-TPU CI
    leg for G4's radius 6); the alignment rows carry zero column-matrix
    weight."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    K, T = xtaps.shape

    def band_dma(slot, nn, tt):
        return pltpu.make_async_copy(
            img_hbm.at[nn, pl.ds(tt * tile_h, band_h), :],
            band.at[slot],
            sems.at[slot],
        )

    step = n * num_tiles + t
    slot = lax.rem(step, 2)
    next_slot = lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        band_dma(slot, 0, 0).start()

    last_tile = t == num_tiles - 1

    @pl.when(jnp.logical_not(last_tile))
    def _():
        band_dma(next_slot, n, t + 1).start()

    @pl.when(last_tile & (n + 1 < pl.num_programs(0)))
    def _():
        band_dma(next_slot, n + 1, 0).start()

    band_dma(slot, n, t).wait()
    padded = band[slot]
    rows_st = jnp.stack(_row_pass_symmetric(padded, xtaps, wo))
    basis = jax.lax.dot_general(
        colmat_ref[:],
        rows_st,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = basis


def bank_tiled_pallas(
    image: jax.Array, xtaps, ytaps, *, tile_h: int = DEFAULT_TILE_H
) -> jax.Array:
    """Row-tiled separable bank for images of any size: [..., K, H, W]."""
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, h, w = image.shape

    wo_est = _round_up(w, 128)
    # live set ~ K row buffers + K basis + band; keep a margin like the fused kernel
    max_tile = _VMEM_BUDGET // (4 * wo_est * (3 * K + 8))
    tile_h = max(8, min(tile_h, (max_tile // 8) * 8))
    tile_h = min(tile_h, _round_up(h, 8))
    ho, wo = _round_up(h, tile_h), _round_up(w, 128)
    wp = _round_up(wo + 2 * r, 128)
    num_tiles = ho // tile_h
    # Mosaic needs the band scratch 8-aligned in sublanes; extra rows are
    # zero-padded in HBM and carry zero weight in the column matrix.
    band_h = _round_up(tile_h + 2 * r, 8)
    extra = band_h - (tile_h + 2 * r)
    img = _pad_for_kernel(image.reshape((-1, h, w)), r, ho + extra, wo, wp=wp)
    n = img.shape[0]

    kernel = functools.partial(
        _bank_tiled_kernel, xtaps=xtaps, tile_h=tile_h, wo=wo,
        num_tiles=num_tiles, band_h=band_h,
    )
    colmat = jnp.asarray(_col_conv_matrix(ytaps, tile_h, band_h))
    out = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, tile_h, wo), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, K, ho, wo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, band_h, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(img, colmat)
    return out[:, :, :h, :w].reshape(tuple(batch) + (K, h, w))


# ---------------------------------------------------------------------------
# Fused pyramid-down kernel: blur5 + 2x decimation as two banded stride-2
# MXU matmuls (round 3). The XLA path (separable bank + [::2, ::2] strided
# slices + HBM reflect-pads) cost ~30 us/frame at 480x640 in pure layout
# ops; here REFLECT_101 is baked into the matrix weights (an out-of-range
# source column reflects to an IN-range one, so no pad and no wrap block is
# ever materialized) and the decimation is the matrices' stride.
# ---------------------------------------------------------------------------


def _pyr_col_mats(tile_h: int, h: int, h8: int, num_tiles: int) -> np.ndarray:
    """[3, tile_h//2, band_h] stride-2 banded blur matrices (REFLECT_101),
    per tile class (first/interior/last), matching _col_mats_reflect's band
    geometry: band row b = global src row start(t) + b."""
    from cvsteer_tpu.ops.pyramid import _BINOMIAL5

    taps = np.asarray(_BINOMIAL5, np.float64)
    a = _ROW_ALIGN
    band_h = tile_h + 2 * a
    th2 = tile_h // 2
    C = np.zeros((3, th2, band_h), np.float32)

    def reflect(g):
        while g < 0 or g >= h:
            g = -g if g < 0 else 2 * (h - 1) - g
        return g

    def fill(slot, t, s):
        for i in range(th2):
            gout = t * th2 + i
            if 2 * gout >= h:
                continue  # ceil-half padding rows stay zero
            for d in range(-2, 3):
                g = reflect(2 * gout + d)
                b = g - s
                assert 0 <= b < band_h, (slot, t, i, d, b)
                C[slot, i, b] += taps[d + 2]

    fill(0, 0, 0)
    if num_tiles > 2:
        for i in range(th2):
            for d in range(-2, 3):
                C[1, i, 2 * i + d + a] += taps[d + 2]
    fill(2, num_tiles - 1, h8 - band_h)
    return C


def _pyr_row_mat(w: int, woh_pad: int) -> np.ndarray:
    """[w, woh_pad] stride-2 banded blur matrix over lanes (REFLECT_101)."""
    from cvsteer_tpu.ops.pyramid import _BINOMIAL5

    taps = np.asarray(_BINOMIAL5, np.float64)
    wh = -(-w // 2)
    M = np.zeros((w, woh_pad), np.float32)

    def reflect(g):
        while g < 0 or g >= w:
            g = -g if g < 0 else 2 * (w - 1) - g
        return g

    for j in range(wh):
        for d in range(-2, 3):
            M[reflect(2 * j + d), j] += taps[d + 2]
    return M


def _pyr_down_kernel(
    img_hbm, mc_ref, mx_ref, out_ref, band, sems,
    *, tile_h, wo, num_tiles, s_last,
):
    padded = _band_prologue(
        img_hbm, band, sems, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        s_last=s_last, xoff=0,
    )
    t = pl.program_id(1)
    cls = jnp.where(t == 0, 0, jnp.where(t == num_tiles - 1, 2, 1))
    # The binomial taps and every reflected-sum coefficient are multiples
    # of 1/16 <= 1 — EXACT in bf16 — so only the image operand needs the
    # hi/lo split and each matmul pair reconstructs the fp32 product.
    mc = mc_ref[cls]  # [th2, band_h] bf16 (exact)
    phi = padded.astype(jnp.bfloat16)
    plo = (padded - phi.astype(jnp.float32)).astype(jnp.bfloat16)
    _dn = (((1,), (0,)), ((), ()))
    _dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=_dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,  # bf16 hi/lo split by design
    )
    rows = _dot(mc, phi) + _dot(mc, plo)  # [th2, wo]: col blur + row decim
    rhi = rows.astype(jnp.bfloat16)
    rlo = (rows - rhi.astype(jnp.float32)).astype(jnp.bfloat16)
    mx = mx_ref[:]
    out_ref[0] = (
        jnp.dot(rhi, mx, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        + jnp.dot(rlo, mx, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    )  # row blur + lane decimation


def pyr_down_pallas(image: jax.Array, *, tile_h: int = DEFAULT_TILE_H):
    """cv2.pyrDown parity (blur5 + even-index decimation) in one kernel.

    Fast path for 8-aligned heights and 128-aligned widths (pyramid level
    0 at typical sizes); other shapes return None and the caller keeps the
    separable-bank + strided-slice path.
    """
    *batch, h, w = image.shape
    if (
        _interpret() or h % _ROW_ALIGN != 0 or w % 128 != 0 or w < 128
        or h <= 2 * _ROW_ALIGN + 8
    ):
        return None
    tile_h = min(tile_h, ((h - 2 * _ROW_ALIGN) // 8) * 8)
    # both the source band and the half-res output rows must stay 8-aligned
    while tile_h % 16 != 0:
        tile_h -= 8
    if tile_h < 16:
        return None
    h8 = h
    num_tiles = -(-h // tile_h)
    ho = num_tiles * tile_h
    band_h = tile_h + 2 * _ROW_ALIGN
    wo = w
    hh, wh = -(-h // 2), -(-w // 2)
    woh_pad = _round_up(wh, 128)
    th2 = tile_h // 2

    img = image.reshape((-1, h, w)).astype(jnp.float32)
    n = img.shape[0]

    mc = _pyr_col_mats(tile_h, h, h8, num_tiles)
    mx = _pyr_row_mat(w, woh_pad)

    kernel = functools.partial(
        _pyr_down_kernel, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        s_last=h8 - band_h,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th2, woh_pad), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, num_tiles * th2, woh_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, band_h, wo), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * ho * wo * 20,
            bytes_accessed=n * (h * wo + hh * woh_pad) * 4,
            transcendentals=0,
        ),
    )(img, jnp.asarray(mc).astype(jnp.bfloat16),
      jnp.asarray(mx).astype(jnp.bfloat16))
    return out[:, :hh, :wh].reshape(tuple(batch) + (hh, wh))


def steerable_pipeline_g2_pallas(image: jax.Array, bank=None):
    """Full G2Maps with the Pallas basis kernel + XLA-fused elementwise chain.

    Used by steerable_pipeline_g2(method='auto') on TPU. The minimal-output
    fast path for benchmarks/CLI is :func:`g2_maps_pallas`.
    """
    from cvsteer_tpu.filters import g2 as fg2

    if bank is None:
        bank = fg2.g2_bank()
    basis = filter_bank_pallas_diff(
        image, _taps_tuple(bank.xtaps), _taps_tuple(bank.ytaps)
    )
    c1, c2, c3 = fg2.energy_coefficients(basis)
    theta, strength = fg2.dominant_orientation(c2, c3)
    g2v, h2v = fg2.steer(basis, theta)
    magnitude, phase = fg2.magnitude_phase(g2v, h2v)
    e = fg2.oriented_energy(c1, c2, c3, theta)
    return fg2.G2Maps(
        g2=g2v,
        h2=h2v,
        energy=e,
        magnitude=magnitude,
        phase=phase,
        theta=theta,
        strength=strength,
        edges=fg2.find_edges(magnitude, phase),
        lines_dark=fg2.find_dark_lines(magnitude, phase),
        lines_bright=fg2.find_bright_lines(magnitude, phase),
    )
