"""Measure Pallas per-row DMA gather throughput vs the XLA gather.

The descriptor stage's floor under XLA is ~6.6 ns/gathered-row (flat in
row bytes; see probe_desc_gather.py). A Pallas kernel can instead issue
one small async DMA per row (HBM -> VMEM out), pipelined on a semaphore
ring. This probe measures the per-DMA issue/retire cost for:

  row28   — one 28 B row (the bf16 pair-table row) per DMA
  row512  — one 512 B row per DMA (issue-cost amortization check)
  patch   — one [16, 256]-lane bf16 strided 2-D patch per DMA
            (the per-keypoint descriptor-patch shape)

Run: python scripts/probe_dma_gather.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsteer_tpu.utils.profiling import trace_device_events

ITERS = 8
NSEM = 16  # outstanding-DMA ring


def dma_gather_rows(tbl, idx, block_m: int = 512):
    """out[i] = tbl[idx[i]] via one DMA per row, NSEM outstanding."""
    M = idx.shape[0]
    R, L = tbl.shape

    def kernel(idx_ref, tbl_ref, out_ref, sems):
        def start(i):
            pltpu.make_async_copy(
                tbl_ref.at[idx_ref[i]], out_ref.at[i % block_m],
                sems.at[i % NSEM],
            ).start()

        def wait(i):
            pltpu.make_async_copy(
                tbl_ref.at[idx_ref[i]], out_ref.at[i % block_m],
                sems.at[i % NSEM],
            ).wait()

        blk = pl.program_id(0) * block_m

        def body(j, _):
            i = blk + j
            # retire the DMA NSEM behind before reusing its semaphore
            jax.lax.cond(j >= NSEM, lambda: wait(i - NSEM), lambda: None)
            start(i)
            return 0

        jax.lax.fori_loop(0, block_m, body, 0)

        def tail(j, _):
            wait(blk + block_m - NSEM + j)
            return 0

        jax.lax.fori_loop(0, NSEM, tail, 0)

    grid = (M // block_m,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (block_m, L), lambda g, idx: (g, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((M, L), tbl.dtype),
    )(idx, tbl)


def dma_gather_patches(img, ys, xs, ph: int = 16, pw: int = 256):
    """out[k] = img[ys[k]:ys[k]+ph, xs[k]:xs[k]+pw] — one 2-D DMA per patch."""
    K = ys.shape[0]
    H, W = img.shape

    def kernel(ys_ref, xs_ref, img_ref, out_ref, sems):
        def mk(i):
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(ys_ref[i], ph), pl.ds(xs_ref[i], pw)],
                out_ref.at[i % 8],
                sems.at[i % NSEM],
            )

        blk = pl.program_id(0) * 8

        def body(j, _):
            i = blk + j
            jax.lax.cond(j >= NSEM, lambda: mk(i - NSEM).wait(),
                         lambda: None)
            mk(i).start()
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

        def tail(j, _):
            mk(blk + 8 - min(8, NSEM) + j).wait()
            return 0

        jax.lax.fori_loop(0, min(8, NSEM), tail, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(K // 8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (8, ph, pw), lambda g, ys, xs: (g, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((K, ph, pw), img.dtype),
    )(ys, xs, img)


def run(tag, fn, *args, rows, bytes_per_row):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    dur = trace_device_events(lambda: jax.block_until_ready(f(*args)),
                              iters=ITERS, logdir=f"/tmp/probe_dma_{tag}")
    tot = sum(dur.values()) / ITERS
    print(f"{tag:22s} {tot:9.1f} us  {tot / rows * 1e3:8.2f} ns/row  "
          f"({rows * bytes_per_row / tot / 1e3:.1f} GB/s)")
    return out


def main():
    rng = np.random.default_rng(0)
    R, L = 307200, 16  # level-0 pair table rows; 16 bf16 lanes = 32 B
    M = 65536
    tbl = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, R, M).astype(np.int32))

    # XLA gather baseline, identical shapes
    def xla_gather(tbl, idx):
        return tbl[idx]

    run("xla_row32", xla_gather, tbl, idx, rows=M, bytes_per_row=32)
    run("dma_row32", lambda t, i: dma_gather_rows(t, i), tbl, idx,
        rows=M, bytes_per_row=32)

    tbl512 = jnp.asarray(rng.standard_normal((R // 8, 256)).astype(
        np.float32)).astype(jnp.bfloat16)
    idx512 = jnp.asarray(rng.integers(0, R // 8, M // 8).astype(np.int32))
    run("xla_row512", xla_gather, tbl512, idx512,
        rows=M // 8, bytes_per_row=512)
    run("dma_row512", lambda t, i: dma_gather_rows(t, i), tbl512, idx512,
        rows=M // 8, bytes_per_row=512)

    # per-keypoint patches: 2048 patches of [16, 256] bf16 = 8 KB each
    H, W = 480, 8 * 640  # channels-last flattened lanes (640 px x 8 ch)
    img = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    K = 2048
    pys = jnp.asarray(rng.integers(0, H - 16, K).astype(np.int32))
    pxs = jnp.asarray((rng.integers(0, 600, K) * 8).astype(np.int32))
    run("dma_patch16x256", lambda a, b, c: dma_gather_patches(a, b, c),
        img, pys, pxs, rows=K, bytes_per_row=16 * 256 * 2)


if __name__ == "__main__":
    main()
