"""Validate + time the Pallas descriptor-patch kernel on the chip.

Parity: bilinear_sample_patch_dma vs the XLA pair-table gather path
(ops.interp.bilinear_sample_channels_last_pair_bf16) on random
keypoint-like sample clouds, then device timing at the bench shapes.

Run: python scripts/probe_desc_kernel.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.ops.interp import bilinear_sample_channels_last_pair_bf16
from cvsteer_tpu.ops.pallas_desc import bilinear_sample_patch_dma
from cvsteer_tpu.utils.profiling import trace_device_events

C, N, S, ITERS = 7, 256, 16, 8


def xla_path(basis, ys, xs):
    def one(img, y, x):
        return bilinear_sample_channels_last_pair_bf16(
            jnp.moveaxis(img.astype(jnp.bfloat16), 0, -1),
            y.reshape(-1), x.reshape(-1),
        ).reshape(y.shape + (C,))

    return jax.vmap(one)(basis, ys, xs)


def main():
    rng = np.random.default_rng(0)
    for B, H, W in [(2, 64, 128), (8, 480, 640), (16, 480, 640)]:
        basis = jnp.asarray(
            rng.standard_normal((B, C, H, W)).astype(np.float32))
        # keypoint-like clouds: center + rotated-grid offsets (span <= 14.8)
        kc_y = rng.uniform(0, H - 1, (B, N))
        kc_x = rng.uniform(0, W - 1, (B, N))
        off = rng.uniform(-6.8, 6.8, (B, N, S, 2))
        ys = jnp.asarray(
            np.clip(kc_y[..., None] + off[..., 0], 0, H - 1).astype(
                np.float32))
        xs = jnp.asarray(
            np.clip(kc_x[..., None] + off[..., 1], 0, W - 1).astype(
                np.float32))

        a = jax.jit(xla_path)(basis, ys, xs)
        b = jax.jit(bilinear_sample_patch_dma)(basis, ys, xs)
        diff = jnp.max(jnp.abs(a - b))
        scale = jnp.max(jnp.abs(a))
        print(f"B={B} {H}x{W}: max abs diff {float(diff):.5f} "
              f"(max |a| {float(scale):.2f}) -> "
              f"{'OK' if float(diff) < 0.05 * float(scale) else 'MISMATCH'}")

        if H < 100:
            continue
        for tag, fn in [("xla_pair", xla_path),
                        ("patch_dma", bilinear_sample_patch_dma)]:
            f = jax.jit(
                lambda bb, yy, xx: jnp.sum(fn(bb, yy, xx)) * 1e-9)
            jax.block_until_ready(f(basis, ys, xs))
            dur = trace_device_events(
                lambda: jax.block_until_ready(f(basis, ys, xs)),
                iters=ITERS, logdir=f"/tmp/pdk_{tag}_{B}")
            tot = sum(dur.values()) / ITERS
            print(f"   {tag:12s} {tot:8.1f} us/call = {tot / B:6.1f}"
                  f" us/frame")
            for k, v in sorted(dur.items(), key=lambda kv: -kv[1])[:3]:
                print(f"        {v / ITERS:8.1f}  {k[:56]}")


if __name__ == "__main__":
    main()
