"""Round-3 kernel probes: out_dtype (fp32 vs bf16 map writes) x tile_h.

Measures the PRODUCTION g2_maps_tiled_pallas via jax.profiler traces
(device-side us/frame — the honest metric per docs/ROOFLINE.md) plus
max-rel-to-mean error vs the fp32 XLA reference path.
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
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.filters.g2 import g2_bank
from cvsteer_tpu.ops import pallas_frontend as pf

ITERS = 8


def trace_device_us(fn, args, logdir, iters=ITERS):
    """Total TPU device-event us per call of fn, via chained dispatches."""
    @jax.jit
    def chain(img, carry):
        e, d, b = fn(img + carry * 1e-6)
        return (
            carry
            + e[0, 0, 0].astype(jnp.float32)
            + d[0, 0, 0].astype(jnp.float32)
            + b[0, 0, 0].astype(jnp.float32)
        )

    img = args
    c = jnp.float32(0.0)
    float(chain(img, c))  # warmup/compile
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        c = jnp.float32(0.0)
        for _ in range(iters):
            c = chain(img, c)
        float(c)
    dur = collections.Counter()
    for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        pids = {
            e["pid"]: e["args"].get("name")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
                dur[e["name"]] += e.get("dur", 0)
    total_all = sum(dur.values())
    return total_all / iters, dict(dur)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    B, H, W = args.batch, args.size, args.size

    bank = g2_bank()
    xt = np.asarray(bank.xtaps, np.float32)
    yt = np.asarray(bank.ytaps, np.float32)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))

    ref = jax.jit(lambda im: pf._g2_maps_reference_xla(im, xt, yt))
    ref_maps = [np.asarray(m) for m in ref(img)]

    rows = []
    for dtype_name, dt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        for tile in [32, 48, 64, 96, 128]:
            fn = functools.partial(
                pf.g2_maps_tiled_pallas, xtaps=xt, ytaps=yt,
                tile_h=tile, out_dtype=dt,
            )
            try:
                us, _ = trace_device_us(
                    lambda im: fn(im), img, f"/tmp/r3k_{dtype_name}_{tile}"
                )
            except Exception as e:  # noqa
                print(f"{dtype_name} tile={tile}: FAILED {type(e).__name__}: {e}")
                continue
            out = [np.asarray(m, np.float32) for m in jax.jit(lambda im: fn(im))(img)]
            errs = [
                float(np.max(np.abs(o - r)) / (np.mean(np.abs(r)) + 1e-12))
                for o, r in zip(out, ref_maps)
            ]
            rows.append((dtype_name, tile, us / B, max(errs)))
            print(
                f"{dtype_name} tile={tile}: {us / B:.2f} us/frame  "
                f"max-rel-to-mean {max(errs):.2e}"
            )

    print("\n| out dtype | tile_h | us/frame | max-rel |")
    print("|---|---|---|---|")
    for d, t, u, e in rows:
        print(f"| {d} | {t} | {u:.2f} | {e:.1e} |")


if __name__ == "__main__":
    main()
