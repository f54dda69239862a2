"""Stage isolation of the round-2 production kernel (roll + presplit).

Reuses the production helpers so the measured stages are exactly the
shipping code paths. Anti-DCE: every stage consumes all filters.
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsteer_tpu.filters.g2 import g2_bank
from cvsteer_tpu.ops import pallas_frontend as pf

ITERS = 8
B, H, W = 16, 512, 512
TILE = 64


def stage_kernel(img_hbm, chi_ref, clo_ref, o0, o1, o2, band, sems,
                 *, xtaps, tile_h, wo, num_tiles, reps, slot_rep, s_last, stage):
    n = pl.program_id(0)
    t = pl.program_id(1)
    band_h = tile_h + 2 * pf._ROW_ALIGN

    def start_row(tt):
        s = jnp.where(tt == 0, 0, tt * tile_h - pf._ROW_ALIGN)
        s = jnp.where(tt == num_tiles - 1, s_last, s)
        return pl.multiple_of(s, pf._ROW_ALIGN)

    def band_dma(slot, nn, tt):
        return pltpu.make_async_copy(
            img_hbm.at[nn, pl.ds(start_row(tt), band_h), :],
            band.at[slot], sems.at[slot])

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

    if stage == "dma":
        sl = padded[:tile_h, :wo]
        o0[0], o1[0], o2[0] = sl, sl * 2.0, sl * 3.0
        return

    rows_hi, rows_lo = pf._row_pass_split(padded, xtaps, wo, reps, slot_rep)
    if stage == "row":
        tot = sum(rows_hi[k][:tile_h].astype(jnp.float32) for k in range(7))
        totl = sum(rows_lo[k][:tile_h].astype(jnp.float32) for k in range(7))
        o0[0], o1[0], o2[0] = tot, totl, tot + totl
        return

    cls = jnp.where(t == 0, 0, jnp.where(t == num_tiles - 1, 2, 1))
    chi = chi_ref[cls]
    clo = clo_ref[cls]
    dn = (((2,), (1,)), ((0,), (0,)))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    basis = dot(chi, rows_hi) + dot(chi, rows_lo) + dot(clo, rows_hi)
    if stage == "col":
        o0[0] = sum(basis[k] for k in range(7))
        o1[0] = basis[0] - basis[1]
        o2[0] = basis[2] - basis[3]
        return

    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(7)]
    c2 = (0.5 * (g2a * g2a - g2c * g2c) + 0.46875 * (h2a * h2a - h2d * h2d)
          + 0.28125 * (h2b * h2b - h2c * h2c) + 0.1875 * (h2a * h2c - h2b * h2d))
    c3 = (-(g2a * g2b) - g2b * g2c - 0.9375 * (h2c * h2d + h2a * h2b)
          - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d)
    if stage == "coeff":
        o0[0], o1[0], o2[0] = c2, c3, c2 + c3
        return

    # Sqrt-free steering tail — mirror of the production kernel's.
    s2 = c2 * c2 + c3 * c3
    inv_rho = jnp.where(s2 > 0.0, jax.lax.rsqrt(s2), 0.0)
    u = jnp.where(s2 > 0.0, c2 * inv_rho, 1.0)
    v = c3 * inv_rho
    g2v = 0.5 * ((g2a + g2c) + u * (g2a - g2c)) - v * g2b
    P = 0.5 * ((h2a + 3.0 * h2c) + u * (h2a - 3.0 * h2c))
    Q = 0.5 * ((3.0 * h2b + h2d) + u * (3.0 * h2b - h2d))
    PP, QQ = P * P, Q * Q
    h2sq = jnp.maximum(0.5 * ((PP + QQ) + u * (PP - QQ)) - v * (P * Q), 0.0)
    g2sq_ = g2v * g2v
    mag2 = g2sq_ + h2sq
    inv_mag = jnp.where(mag2 > 0.0, jax.lax.rsqrt(mag2), 0.0)
    o0[0] = h2sq * inv_mag
    g2sq = g2sq_ * inv_mag
    o1[0] = jnp.where(g2v > 0.0, g2sq, 0.0)
    o2[0] = jnp.where(g2v < 0.0, g2sq, 0.0)


def build(stage):
    bank = g2_bank()
    xtaps = np.asarray(bank.xtaps, np.float32)
    ytaps = np.asarray(bank.ytaps, np.float32)
    r = 4
    tile_h = TILE
    h8 = H
    num_tiles = H // tile_h
    band_h = tile_h + 16
    wo = W
    wp = pf._round_up(wo + 2 * r, 128)
    reps, slot_rep, slot_scale = pf._dedup_xtaps(xtaps)
    cmats = pf._col_mats_reflect(ytaps, slot_scale, tile_h, H, h8, num_tiles)
    chi = jnp.asarray(cmats.astype(jnp.bfloat16))
    clo = jnp.asarray((cmats - np.asarray(chi, np.float32)).astype(jnp.bfloat16))
    kernel = functools.partial(
        stage_kernel, xtaps=xtaps, tile_h=tile_h, wo=wo, num_tiles=num_tiles,
        reps=reps, slot_rep=slot_rep, s_last=h8 - band_h, stage=stage)
    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, H, wo), jnp.float32)
    name = f"v2stage_{stage}"

    def run(img):
        return pl.pallas_call(
            kernel, grid=(B, num_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(spec, spec, spec), out_shape=(shape, shape, shape),
            scratch_shapes=[pltpu.VMEM((2, band_h, wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            name=name, interpret=pf._interpret(),
        )(img, chi, clo)

    @jax.jit
    def chain(img, carry):
        a, b, c = run(img + carry * 1e-6)
        return carry + a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]

    return name, chain


def main():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
    r = 4
    wp = pf._round_up(W + 2 * r, 128)
    imgp = jnp.asarray(np.pad(np.pad(img, ((0, 0), (0, 0), (r, r)), mode="reflect"),
                              ((0, 0), (0, 0), (0, wp - W - 2 * r))))
    prev = 0.0
    for stage in ["dma", "row", "col", "coeff", "full"]:
        name, chain = build(stage)
        logdir = f"/tmp/v2s_{stage}"
        shutil.rmtree(logdir, ignore_errors=True)
        c = jnp.float32(0.0)
        float(chain(imgp, c))
        with jax.profiler.trace(logdir):
            c = jnp.float32(0.0)
            for _ in range(ITERS):
                c = chain(imgp, c)
            float(c)
        dur = collections.Counter()
        for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
            data = json.load(gzip.open(f))
            pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            for e in data["traceEvents"]:
                if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
                    dur[e["name"]] += e.get("dur", 0)
        kus = next((v for k, v in dur.items() if name in k), 0) / ITERS / B
        print(f"{stage}: {kus:.2f} us/f (delta {kus - prev:+.2f})")
        prev = kus


if __name__ == "__main__":
    main()
