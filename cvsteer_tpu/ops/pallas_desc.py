"""Pallas TPU kernel for descriptor sampling: per-keypoint patch DMA.

The descriptor stage bilinearly samples the 7-channel basis stack at
16 rotated grid points per keypoint (features/descriptors.py — the
per-point steering identity of the reference, SteerableFiltersG2.cpp:
115-134, applied on a keypoint-oriented grid). Under XLA this lowers to
row gathers at a measured ~6.6 ns/row REGARDLESS of row width, and the
rate degrades superlinearly with the gather working set (2.2x from B=8
to B=16; scripts/probe_desc_gather.py) — ~270-400 us/frame at the bench
shapes, the dominant feature-extraction cost.

This kernel replaces the gathers with one async-copy per KEYPOINT: a
[32, 384]-lane bf16 patch of a channels-last basis table, fetched
HBM->VMEM on a double-buffered ring (measured ~100-150 ns/patch,
scripts/probe_dma_gather.py), with the bilinear x/y interpolation done
as one small MXU matmul per keypoint against a mask matrix built
in-registers from lane iotas:

  table    [Hp, Wp*Cp] bf16   channel-minor: lane l = x*Cp + c
  patch    [32, 384]          rows ya..ya+31, lanes xa*Cp..+384
  XW       [384, LC]          XW[l, s*Cp+c] = bilinear x-weight of
                              table lane l for sample s, channel c
  xsel     [32, LC]           patch @ XW   (x-interp + channel select)
  out[s*Cp+c] = sum_r xsel[r, :] * R[r, :]   (bilinear y one-hot)

Out-of-window corner lanes (clamped border samples) simply never match
the iota masks, so the +1 bilinear neighbors are self-guarding — no
explicit bounds handling inside the kernel.

DMA alignment constraints (measured, not assumed): slice starts AND
shapes must be multiples of the (8, 128) tile in the last two dims, so
the window is 32 rows x 384 lanes (48 px at Cp=8) and the aligned corner
always exists because the sample cloud spans <= 17 px (grid 4, spacing
3.0: 2*(4.5*sqrt(2) + 1) < 15.8).

Off-TPU callers use the XLA gather path (features/descriptors.py); this
kernel is TPU-only by construction (DMA semantics) and is parity-tested
against the gather path in the CVSTEER_TEST_TPU CI leg.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y = 32          # patch rows (8-aligned DMA start + <=17-row span)
WIN_LANES = 384     # patch lanes (128-aligned DMA start + span)
KB = 8              # keypoints per grid step


def _desc_patch_kernel(
    # scalar prefetch
    ya_ref, xl_ref, bi_ref,
    # inputs
    tbl_ref, xrow_ref, yrow_ref,
    # outputs
    out_ref,
    # scratch
    patches, sems,
    *, cp: int, steps: int,
):
    g = pl.program_id(0)

    def issue(step, slot):
        def one(j, _):
            i = step * KB + j
            pltpu.make_async_copy(
                tbl_ref.at[
                    bi_ref[i],
                    pl.ds(pl.multiple_of(ya_ref[i], 8), WIN_Y),
                    pl.ds(pl.multiple_of(xl_ref[i], 128), WIN_LANES),
                ],
                patches.at[slot, j],
                sems.at[slot, j],
            ).start()
            return 0

        lax.fori_loop(0, KB, one, 0)

    # prologue: fetch this step's patches (first step only), then kick off
    # the next step's fetches so compute overlaps the DMA ring
    @pl.when(g == 0)
    def _():
        issue(0, 0)

    @pl.when(g + 1 < steps)
    def _():
        issue(g + 1, (g + 1) % 2)

    slot = g % 2

    def wait(j, _):
        i = g * KB + j
        pltpu.make_async_copy(
            tbl_ref.at[
                bi_ref[i],
                pl.ds(pl.multiple_of(ya_ref[i], 8), WIN_Y),
                pl.ds(pl.multiple_of(xl_ref[i], 128), WIN_LANES),
            ],
            patches.at[slot, j],
            sems.at[slot, j],
        ).wait()
        return 0

    lax.fori_loop(0, KB, wait, 0)

    lc = out_ref.shape[-1]
    # step-constant masks: table-lane pixel index and channel-match grid
    m_iota = lax.broadcasted_iota(jnp.int32, (WIN_LANES, lc), 1)
    l_int = lax.broadcasted_iota(jnp.int32, (WIN_LANES, lc), 0)
    px = (l_int // cp).astype(jnp.float32)  # table pixel of lane l
    chmask = (l_int % cp) == (m_iota % cp)
    rr = lax.broadcasted_iota(jnp.int32, (WIN_Y, lc), 0).astype(jnp.float32)

    for j in range(KB):
        xr = xrow_ref[j, :][None, :]          # [1, LC] sample x in window px
        yr = yrow_ref[j, :][None, :]
        # Bilinear "hat" weight: relu(1 - |px - xr|) is (1-frac) at the
        # floor lane, frac at floor+1, and 0 at every other integer px —
        # identical support to the two-compare/two-select form, values
        # equal within the bf16 sampling accuracy class (the floor+1 lane
        # computes 1-(1-frac), up to 1 fp32 ulp off frac; xw is cast to
        # bf16 below), at half the vreg-ops on the [WIN_LANES, LC] array.
        xw = jnp.where(
            chmask, jnp.maximum(1.0 - jnp.abs(px - xr), 0.0), 0.0
        )
        patch = patches[slot, j]
        xsel = jax.lax.dot_general(
            patch, xw.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # bf16 BY DESIGN (the kernel's accuracy class): pin DEFAULT so
            # an ambient highest-precision context (utils.precision.precise
            # callers like slam.twoview) cannot rewrite this into a
            # multi-pass matmul Mosaic rejects ("Bad lhs type")
            precision=jax.lax.Precision.DEFAULT,
        )                                      # [WIN_Y, LC]
        r = jnp.maximum(1.0 - jnp.abs(rr - yr), 0.0)  # y hat weight
        out_ref[j, :] = jnp.sum(xsel * r, axis=0)


def sample_patches_pallas(
    tbl: jax.Array,
    ya: jax.Array,
    xa: jax.Array,
    bi: jax.Array,
    xrow: jax.Array,
    yrow: jax.Array,
    *,
    cp: int,
) -> jax.Array:
    """Bilinear descriptor samples from a channels-last basis table.

    tbl:  [B, Hp, Wp*cp] bf16 (Hp >= 32, Wp*cp >= 384, both tile-padded)
    ya:   [N] int32 patch row starts (multiples of 8, <= Hp-32)
    xa:   [N] int32 patch lane starts (multiples of 128, <= Wp*cp-384)
    bi:   [N] int32 batch index per keypoint
    xrow: [N, LC] f32; xrow[k, s*cp+c] = sample x in window pixels
    yrow: [N, LC] f32; same for y (window rows)

    Returns [N, LC] f32: out[k, s*cp+c] = bilinear sample of channel c.
    N must be a multiple of KB; LC a multiple of 128.
    """
    n, lc = xrow.shape
    assert n % KB == 0 and lc % 128 == 0
    steps = n // KB
    kernel = functools.partial(_desc_patch_kernel, cp=cp, steps=steps)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((KB, lc), lambda g, *_: (g, 0)),
                pl.BlockSpec((KB, lc), lambda g, *_: (g, 0)),
            ],
            out_specs=pl.BlockSpec((KB, lc), lambda g, *_: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_Y, WIN_LANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, lc), jnp.float32),
        interpret=interpret,
    )(ya, xa, bi, tbl, xrow, yrow)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def basis_table(basis: jax.Array, cp: int = 8) -> jax.Array:
    """[B, C, H, W] fp32 basis -> [B, Hp, Wp*cp] bf16 channel-minor table."""
    b, c, h, w = basis.shape
    assert c <= cp
    hp = max(_round_up(h, 8), WIN_Y)
    wp = max(_round_up(w, 128 // cp), (WIN_LANES + cp - 1) // cp)
    t = jnp.moveaxis(basis.astype(jnp.bfloat16), 1, -1)  # [B, H, W, C]
    t = jnp.pad(t, ((0, 0), (0, hp - h), (0, wp - w), (0, cp - c)))
    return t.reshape(b, hp, wp * cp)


def bilinear_sample_patch_dma(
    basis: jax.Array, ys: jax.Array, xs: jax.Array, *, cp: int = 8
) -> jax.Array:
    """Drop-in TPU replacement for the XLA pair-table gather sampling.

    basis: [B, C, H, W] fp32; ys/xs: [B, K, S] float pixel coords.
    Returns [B, K, S, C] f32 samples (bf16 sampling accuracy class, same
    as ops.interp.bilinear_sample_channels_last_pair_bf16).

    The per-keypoint sample cloud must span < 24 px in y and < 32 px in x
    (descriptor grids up to ~7x7 at spacing 3 qualify); the aligned DMA
    window then always covers every clamped sample's bilinear corners.

    NaN contract: non-finite ys/xs propagate (NaN-in -> NaN samples) —
    the hat-weight form relu(1 - |px - x|) keeps NaN where a compare/
    select would have zeroed it. Callers in this package always pass
    clipped, finite coords (invalid keypoints are zeroed upstream).
    """
    b, c, h, w = basis.shape
    _, k, s = ys.shape
    assert s * cp % 128 == 0, "samples*channels must fill whole vregs"
    # pad the keypoint axis so b*k divides the kernel's KB-keypoint grid
    # step (padded entries sample at (0, 0) and are sliced off)
    k_pad = -k % KB
    if k_pad:
        pad = lambda a: jnp.pad(a, ((0, 0), (0, k_pad), (0, 0)))
        out = bilinear_sample_patch_dma(
            basis, pad(ys), pad(xs), cp=cp
        )
        return out[:, :k]
    tbl = basis_table(basis, cp)
    hp = tbl.shape[1]
    wp = tbl.shape[2] // cp

    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ymin = jnp.min(jnp.floor(ys), axis=-1)  # [B, K]
    xmin = jnp.min(jnp.floor(xs), axis=-1)
    ya = jnp.clip((ymin.astype(jnp.int32) // 8) * 8, 0, hp - WIN_Y)
    pxm = 128 // cp
    xa = jnp.clip(
        (xmin.astype(jnp.int32) // pxm) * pxm, 0, wp - WIN_LANES // cp
    )

    yloc = ys - ya[..., None].astype(jnp.float32)  # [B, K, S]
    xloc = xs - xa[..., None].astype(jnp.float32)
    lc = s * cp
    xrow = jnp.broadcast_to(xloc[..., None], (b, k, s, cp)).reshape(
        b * k, lc
    )
    yrow = jnp.broadcast_to(yloc[..., None], (b, k, s, cp)).reshape(
        b * k, lc
    )
    bi = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, k)
    ).reshape(-1)
    out = sample_patches_pallas(
        tbl,
        ya.reshape(-1),
        (xa * cp).reshape(-1),
        bi,
        xrow,
        yrow,
        cp=cp,
    )
    return out.reshape(b, k, s, cp)[..., :c]
