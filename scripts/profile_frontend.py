"""Trace-backed stage isolation of the fused G2 front-end kernel.

Builds cut-down variants of the row-tiled fused kernel (DMA only, +row pass,
+column matmul, +energy coefficients, full) with identical grids and output
traffic, runs each under jax.profiler.trace, and reports DEVICE-side
microseconds per frame parsed from the trace — wall-clock through the axon
tunnel is unreliable (see BENCH_NOTES.md), device event durations are not.

Usage:  python scripts/profile_frontend.py [--batch 16] [--size 512]
Writes a markdown table to stdout (paste into docs/ROOFLINE.md).
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import shutil
import time

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


def _stage_kernel(
    img_hbm, colmat_ref, o0, o1, o2, band, sems,
    *, xtaps, ytaps, tile_h, wp, wo, num_tiles, stage, precision,
):
    n = pl.program_id(0)
    t = pl.program_id(1)
    r = (xtaps.shape[1] - 1) // 2
    band_h = tile_h + 2 * r

    def band_dma(slot, nn, tt):
        return pltpu.make_async_copy(
            img_hbm.at[nn, pl.ds(tt * tile_h, band_h), :], band.at[slot], sems.at[slot]
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

    if stage == "dma":
        sl = padded[r : r + tile_h, :wo]
        o0[0] = sl
        o1[0] = sl * 2.0
        o2[0] = sl * 3.0
        return

    rows_st = jnp.stack(pf._row_pass_symmetric(padded, xtaps, wo))
    if stage == "row":
        o0[0] = rows_st[0][:tile_h]
        o1[0] = rows_st[1][:tile_h]
        o2[0] = rows_st[2][:tile_h]
        return

    basis = jax.lax.dot_general(
        colmat_ref[:], rows_st, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(xtaps.shape[0])]
    if stage == "col":
        o0[0] = g2a
        o1[0] = g2b
        o2[0] = h2a
        return

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
    if stage == "coeff":
        o0[0] = c2
        o1[0] = c3
        o2[0] = g2a
        return

    rho = jnp.sqrt(c2 * c2 + c3 * c3)
    inv_rho = jnp.where(rho > 0.0, 1.0 / rho, 0.0)
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
    o0[0] = (h2v * h2v) * inv_mag
    g2sq = (g2v * g2v) * inv_mag
    o1[0] = jnp.where(g2v > 0.0, g2sq, 0.0)
    o2[0] = jnp.where(g2v < 0.0, g2sq, 0.0)


def make_variant(stage, precision, B, H, W, tile_h=128):
    bank = g2_bank()
    xtaps = np.asarray(bank.xtaps, np.float32)
    ytaps = np.asarray(bank.ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    h, w = H, W
    ho, wo = H, W  # assume aligned benchmark sizes
    hp, wp = ho + 2 * r, pf._round_up(wo + 2 * r, 128)
    num_tiles = ho // tile_h
    band_h = tile_h + 2 * r
    name = f"g2stage_{stage}_{'hi' if precision == lax.Precision.HIGHEST else 'med'}"

    kernel = functools.partial(
        _stage_kernel, xtaps=xtaps, ytaps=ytaps, tile_h=tile_h, wp=wp, wo=wo,
        num_tiles=num_tiles, stage=stage, precision=precision,
    )
    colmat = jnp.asarray(pf._col_conv_matrix(ytaps, tile_h, band_h))
    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, ho, wo), jnp.float32)

    def run(img_padded):
        return pl.pallas_call(
            kernel,
            grid=(B, num_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(spec, spec, spec),
            out_shape=(shape, shape, shape),
            scratch_shapes=[pltpu.VMEM((2, band_h, wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            name=name,
            interpret=pf._interpret(),
        )(img_padded, colmat)

    @jax.jit
    def chain(img_padded, carry):
        a, b, c = run(img_padded + carry * 1e-6)
        return carry + a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]

    return name, chain


def parse_trace(logdir):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    dur = collections.Counter()
    cnt = collections.Counter()
    for f in files:
        data = json.load(gzip.open(f))
        pids = {
            e["pid"]: e["args"].get("name")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
                dur[e["name"]] += e.get("dur", 0)
                cnt[e["name"]] += 1
    return dur, cnt


def measure(fn, x, logdir):
    shutil.rmtree(logdir, ignore_errors=True)
    c = jnp.float32(0.0)
    float(fn(x, c))  # compile+warm
    with jax.profiler.trace(logdir):
        c = jnp.float32(0.0)
        for _ in range(ITERS):
            c = fn(x, c)
        float(c)
    return parse_trace(logdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    B, H, W = args.batch, args.size, args.size

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
    bank = g2_bank()
    r = 4
    wp = pf._round_up(W + 2 * r, 128)
    img_padded = jnp.asarray(
        np.pad(np.pad(img, ((0, 0), (r, r), (r, r)), mode="reflect"),
               ((0, 0), (0, 0), (0, wp - W - 2 * r)))
    )

    print(f"# stage isolation: B={B} {H}x{W}, device={jax.devices()[0].device_kind}")
    print("| variant | device us/frame | delta us |")
    print("|---|---|---|")
    prev = 0.0
    results = {}
    for stage in ["dma", "row", "col", "coeff", "full"]:
        name, chain = make_variant(stage, lax.Precision.HIGHEST, B, H, W)
        dur, cnt = measure(chain, img_padded, f"/tmp/prof_{stage}")
        kus = next((v for k, v in dur.items() if name in k), None)
        if kus is None:  # fall back: largest non-jit event
            kus = max((v for k, v in dur.items() if not k.startswith("jit_")), default=0)
        us = kus / ITERS / B
        results[stage] = us
        print(f"| {stage} | {us:.2f} | {us - prev:+.2f} |")
        prev = us

    # precision experiment on the column matmul
    for prec, tag in [(lax.Precision.DEFAULT, "col_default")]:
        name, chain = make_variant("full", prec, B, H, W)
        dur, cnt = measure(chain, img_padded, f"/tmp/prof_{tag}")
        kus = next((v for k, v in dur.items() if name in k), 0)
        print(f"| full/{tag} | {kus / ITERS / B:.2f} | |")

    # the XLA pad chain around the real entry point, for reference
    @jax.jit
    def full_entry(x, carry):
        e, d, b = pf.g2_maps_tiled_pallas(x + carry * 1e-6, bank.xtaps, bank.ytaps)
        return carry + e[0, 0, 0] + d[0, 0, 0] + b[0, 0, 0]

    dur, cnt = measure(full_entry, jnp.asarray(img), "/tmp/prof_entry")
    total = sum(v for k, v in dur.items() if k.startswith("jit_"))
    kern = sum(v for k, v in dur.items() if "g2_maps_tiled" in k or k == "step.1")
    print(f"| entry total (incl pad) | {total / ITERS / B:.2f} | |")
    print(f"| entry kernel | {kern / ITERS / B:.2f} | |")
    print(f"| entry pad/XLA overhead | {(total - kern) / ITERS / B:.2f} | |")

    hbm_bytes = (H + 2 * r) * wp * 4 + 3 * H * W * 4
    print(f"\nHBM roofline @819GB/s: {hbm_bytes / 819e9 * 1e6:.2f} us/frame "
          f"({hbm_bytes / 1e6:.2f} MB/frame)")


if __name__ == "__main__":
    main()
