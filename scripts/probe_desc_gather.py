"""Probe descriptor-gather strategies on the chip (round 3 follow-up).

The descriptor stage is the remaining feature-extraction floor
(~395 us/frame of the 680 at B=16): 10 XLA row gathers at ~7 ns/row.
This probe isolates the gather variants at the exact bench shapes so
per-row/per-lane/batch-scaling claims are measured, not assumed:

  pair  — two 2C-lane bf16 row gathers per sample (production)
  quad  — one 4C-lane bf16 row gather per sample
  batch — the same gather at B=8/16 (the production trace shows the
          level-0 gathers scaling superlinearly with B)

Run: python scripts/probe_desc_gather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.utils.profiling import trace_device_events

C = 7
N = 256          # keypoints per level
S = 16           # descriptor samples per keypoint
ITERS = 8


def consume(x):
    return jnp.sum(x.astype(jnp.float32)) * 1e-9


def run(tag, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    dur = trace_device_events(lambda: jax.block_until_ready(f(*args)),
                              iters=ITERS, logdir=f"/tmp/probe_dg_{tag}")
    tot = sum(dur.values()) / ITERS
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:4]
    print(f"{tag:34s} {tot:9.1f} us/call  " +
          "  ".join(f"{k[:28]}={v/ITERS:.1f}" for k, v in top))
    return tot


def main():
    rng = np.random.default_rng(0)

    for B, H, W in [(8, 480, 640), (16, 480, 640)]:
        basis = jnp.asarray(
            rng.standard_normal((B, H, W, C)).astype(np.float32))
        ys = jnp.asarray(
            rng.uniform(1, H - 2, (B, N * S)).astype(np.float32))
        xs = jnp.asarray(
            rng.uniform(1, W - 2, (B, N * S)).astype(np.float32))
        print(f"\n== B={B} {H}x{W}  ({B * N * S} samples, "
              f"{2 * B * N * S} pair rows)")

        from cvsteer_tpu.ops.interp import (
            bilinear_sample_channels_last_pair_bf16,
            bilinear_sample_channels_last_quad_bf16,
        )

        def pair(basis, ys, xs):
            out = jax.vmap(bilinear_sample_channels_last_pair_bf16)(
                basis.astype(jnp.bfloat16), ys, xs)
            return consume(out)

        def quad(basis, ys, xs):
            out = jax.vmap(bilinear_sample_channels_last_quad_bf16)(
                basis.astype(jnp.bfloat16), ys, xs)
            return consume(out)

        # raw single gather (no bilinear): per-row cost floor, 2C lanes
        def raw_pair_rows(basis, ys, xs):
            imgb = basis.astype(jnp.bfloat16)
            right = jnp.concatenate([imgb[:, :, 1:], imgb[:, :, -1:]], 2)
            tbl = jnp.concatenate([imgb, right], -1).reshape(B, H * W, 2 * C)
            idx = (ys.astype(jnp.int32) * W + xs.astype(jnp.int32))
            out = jax.vmap(lambda t, i: t[i])(tbl, idx)
            return consume(out)

        # flat table across batch: ONE gather of B*N*S rows instead of a
        # vmapped per-image gather (tests whether the vmap batching rule
        # is what goes superlinear at B=16)
        def flat_pair(basis, ys, xs):
            imgb = basis.astype(jnp.bfloat16)
            right = jnp.concatenate([imgb[:, :, 1:], imgb[:, :, -1:]], 2)
            tbl = jnp.concatenate([imgb, right], -1).reshape(B * H * W, 2 * C)
            y0 = jnp.floor(ys.reshape(-1)).astype(jnp.int32)
            x0 = jnp.floor(xs.reshape(-1)).astype(jnp.int32)
            boff = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * (H * W), N * S)
            wy = (ys.reshape(-1) - y0)[:, None]
            wx = (xs.reshape(-1) - x0)[:, None]
            rt = tbl[boff + y0 * W + x0].astype(jnp.float32)
            rb = tbl[boff + jnp.minimum(y0 + 1, H - 1) * W + x0].astype(
                jnp.float32)
            top = rt[:, :C] * (1 - wx) + rt[:, C:] * wx
            bot = rb[:, :C] * (1 - wx) + rb[:, C:] * wx
            out = top * (1 - wy) + bot * wy
            return consume(out)

        base = run("pair (production)", pair, basis, ys, xs)
        run("quad (1 gather/sample)", quad, basis, ys, xs)
        run("raw rows only (floor)", raw_pair_rows, basis, ys, xs)
        run("flat cross-batch table", flat_pair, basis, ys, xs)
        per_row = base / (2 * B * N * S) * 1e3
        print(f"   pair per-row: {per_row:.2f} ns")


if __name__ == "__main__":
    main()
