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

Layout: lanes = image width (padded to 128), sublanes = image height
(padded to 8). Whole-tile-in-VMEM for images up to ~1k x 1k; larger images
currently fall back to the XLA path (tiled halo-DMA variant is the planned
extension).
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
# Fully fused G2 pipeline kernel: image -> (edges, dark, bright[, extras])
# ---------------------------------------------------------------------------


def _g2_maps_kernel(img_ref, edges_ref, dark_ref, bright_ref, *, xtaps, ytaps, h, w):
    padded = img_ref[0]
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = _row_col_bank(padded, xtaps, ytaps, h, w)

    # Oriented-energy Fourier coefficients (SteerableFiltersG2.cpp:93-95).
    g2aa, g2cc, g2bb = g2a * g2a, g2c * g2c, g2b * g2b
    h2aa, h2bb, h2cc, h2dd = h2a * h2a, h2b * h2b, h2c * h2c, h2d * h2d
    h2ac, h2bd = h2a * h2c, h2b * h2d
    c2 = 0.5 * (g2aa - g2cc) + 0.46875 * (h2aa - h2dd) + 0.28125 * (h2bb - h2cc) + 0.1875 * (h2ac - h2bd)
    c3 = (
        -(g2a * g2b) - g2b * g2c - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )

    # Half-angle steering weights without atan2: theta = arctan2(c3, c2)/2.
    rho = jnp.sqrt(c2 * c2 + c3 * c3)
    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
    # rho==0 must steer to theta=0 (arctan2(0,0)=0 on the XLA path), not pi/4.
    cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
    ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
    st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
    st = jnp.where(c3 >= 0.0, st_mag, -st_mag)

    ct2, st2 = ct * ct, st * st
    ct3, st3 = ct2 * ct, st2 * st
    g2v = ct2 * g2a - 2.0 * ct * st * g2b + st2 * g2c
    h2v = ct3 * h2a - 3.0 * ct2 * st * h2b + 3.0 * ct * st2 * h2c - st3 * h2d

    mag2 = g2v * g2v + h2v * h2v
    inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)

    # Algebraic phase-selective maps (see module docstring).
    edges_ref[0] = (h2v * h2v) * inv_mag
    g2sq_over_mag = (g2v * g2v) * inv_mag
    dark_ref[0] = jnp.where(g2v > 0.0, g2sq_over_mag, 0.0)
    bright_ref[0] = jnp.where(g2v < 0.0, g2sq_over_mag, 0.0)


# Mosaic's scoped-vmem live set for the fused kernel is ~32 fp32 buffers of
# the padded tile (measured: 34 MB at 520x520); stay well inside 16 MB.
_FUSED_LIVE_BUFFERS = 32


def g2_maps_pallas(
    image: jax.Array, xtaps, ytaps
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused front-end: image [..., H, W] -> (edges, lines_dark, lines_bright).

    One HBM read of the image, three map writes; everything else VMEM/VPU.
    Dispatches to the row-tiled double-buffered kernel when the whole padded
    tile would not fit VMEM.
    """
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, h, w = image.shape

    ho, wo = _round_up(h, 8), _round_up(w, 128)
    if 4 * (ho + 2 * r) * (wo + 2 * r) * _FUSED_LIVE_BUFFERS > _VMEM_BUDGET:
        return g2_maps_tiled_pallas(image, xtaps, ytaps)
    hi, wi = ho + 2 * r, wo + 2 * r
    img = _pad_for_kernel(image.reshape((-1, h, w)), r, ho, wo)
    n = img.shape[0]

    kernel = functools.partial(_g2_maps_kernel, xtaps=xtaps, ytaps=ytaps, h=ho, w=wo)
    spec = pl.BlockSpec((1, ho, wo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, ho, wo), jnp.float32)
    edges, dark, bright = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hi, wi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=n * ho * wo * (4 * K * T + 60),
            bytes_accessed=n * (hi * wi + 3 * ho * wo) * 4,
            transcendentals=n * ho * wo * 3,
        ),
        interpret=_interpret(),
    )(img)
    crop = lambda x: x[:, :h, :w].reshape(tuple(batch) + (h, w))
    return crop(edges), crop(dark), crop(bright)


# ---------------------------------------------------------------------------
# Row-tiled fused G2 pipeline: double-buffered HBM->VMEM band DMA.
# Scales to arbitrary image sizes; the whole-tile kernel above is the
# small-image special case.
# ---------------------------------------------------------------------------


def _row_pass_symmetric(padded, xtaps: np.ndarray, wo: int):
    """Row convolutions for all K filters over a padded band, exploiting the
    even/odd symmetry of the analytic taps (Freeman-Adelson tap functions
    are all pure-even or pure-odd, cvsteer/SteerableFiltersG2.cpp:35-42):
    mirrored slices are folded into sums/differences once, so each filter
    needs r+1 (even) or r (odd) fused multiply-adds instead of 2r+1.
    Returns a list of K [band_h, wo] row-response arrays."""
    K, T = xtaps.shape
    r = (T - 1) // 2
    xsl = [padded[:, u : u + wo] for u in range(T)]
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


def _g2_maps_tiled_kernel(
    img_hbm, colmat_ref, edges_ref, dark_ref, bright_ref, band, sems,
    *, xtaps, ytaps, tile_h, wp, wo, num_tiles,
):
    """Grid (N, T): band DMA of rows [t*tile_h, t*tile_h + tile_h + 2r) of
    image n, double-buffered across grid steps, then the fused front-end math
    on the VMEM band. Row pass on the VPU with the T shifted slices hoisted
    and shared across the K filters; column pass as one batched banded
    matmul on the MXU; steering/phase algebra fused on the VPU."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    r = (xtaps.shape[1] - 1) // 2
    band_h = tile_h + 2 * r

    def band_dma(slot, nn, tt):
        return pltpu.make_async_copy(
            img_hbm.at[nn, pl.ds(tt * tile_h, band_h), :],
            band.at[slot],
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

    padded = band[slot]  # [band_h, wp]
    # Row pass: symmetry-folded shared slices (see _row_pass_symmetric).
    rows_st = jnp.stack(_row_pass_symmetric(padded, xtaps, wo))  # [K, band_h, wo]
    # Column pass: batched banded matmul on the MXU (fp32 via HIGHEST).
    basis = jax.lax.dot_general(
        colmat_ref[:],
        rows_st,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [K, tile_h, wo]
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(xtaps.shape[0])]

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
    # rho==0 must steer to theta=0 (arctan2(0,0)=0 on the XLA path), not pi/4.
    cos2t = jnp.where(rho > 0.0, c2 * inv_rho, 1.0)
    ct = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2t), 0.0))
    st_mag = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos2t), 0.0))
    st = jnp.where(c3 >= 0.0, st_mag, -st_mag)

    ct2, st2 = ct * ct, st * st
    ct3, st3 = ct2 * ct, st2 * st
    g2v = ct2 * g2a - 2.0 * ct * st * g2b + st2 * g2c
    h2v = ct3 * h2a - 3.0 * ct2 * st * h2b + 3.0 * ct * st2 * h2c - st3 * h2d

    mag2 = g2v * g2v + h2v * h2v
    inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)
    edges_ref[0] = (h2v * h2v) * inv_mag
    g2sq_over_mag = (g2v * g2v) * inv_mag
    dark_ref[0] = jnp.where(g2v > 0.0, g2sq_over_mag, 0.0)
    bright_ref[0] = jnp.where(g2v < 0.0, g2sq_over_mag, 0.0)


DEFAULT_TILE_H = 128


def g2_maps_tiled_pallas(
    image: jax.Array, xtaps, ytaps, *, tile_h: int = DEFAULT_TILE_H
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-tiled fused front-end for images of any size.

    The image stays in HBM; bands of ``tile_h`` rows (+ 2*radius overlap) are
    double-buffered into VMEM and the whole pipeline (bank conv -> energy ->
    half-angle steering -> phase-selective maps) runs per band.
    """
    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, h, w = image.shape

    # Auto-shrink the band height so the ~32-buffer live set fits VMEM even
    # for very wide images.
    wo_est = _round_up(w, 128)
    max_tile = _VMEM_BUDGET // (4 * wo_est * _FUSED_LIVE_BUFFERS)
    tile_h = max(8, min(tile_h, (max_tile // 8) * 8))

    tile_h = min(tile_h, _round_up(h, 8))
    ho, wo = _round_up(h, tile_h), _round_up(w, 128)
    # Mosaic DMA slices must be lane-aligned: round the padded width to 128.
    hp, wp = ho + 2 * r, _round_up(wo + 2 * r, 128)
    img = _pad_for_kernel(image.reshape((-1, h, w)), r, ho, wo, wp=wp)
    n = img.shape[0]
    num_tiles = ho // tile_h
    band_h = tile_h + 2 * r

    kernel = functools.partial(
        _g2_maps_tiled_kernel,
        xtaps=xtaps, ytaps=ytaps, tile_h=tile_h, wp=wp, wo=wo, num_tiles=num_tiles,
    )
    colmat = jnp.asarray(_col_conv_matrix(ytaps, tile_h, band_h))
    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, ho, wo), jnp.float32)
    edges, dark, bright = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            bytes_accessed=n * (hp * wp + 3 * ho * wo) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(img, colmat)
    crop = lambda x: x[:, :h, :w].reshape(tuple(batch) + (h, w))
    return crop(edges), crop(dark), crop(bright)


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
    img_hbm, colmat_ref, out_ref, band, sems, *, xtaps, tile_h, wo, num_tiles
):
    """Generic K-filter bank over tiled bands: basis stack out [1, K, th, wo]."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    K, T = xtaps.shape
    r = (T - 1) // 2
    band_h = tile_h + 2 * r

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
    img = _pad_for_kernel(image.reshape((-1, h, w)), r, ho, wo, wp=wp)
    n = img.shape[0]
    num_tiles = ho // tile_h
    band_h = tile_h + 2 * r

    kernel = functools.partial(
        _bank_tiled_kernel, xtaps=xtaps, tile_h=tile_h, wo=wo, num_tiles=num_tiles
    )
    colmat = jnp.asarray(_col_conv_matrix(ytaps, tile_h, band_h))
    out = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
