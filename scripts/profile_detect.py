"""Device-time comparison of keypoint-selection formulations (v5e).

Variants of the pooled top-k pre-reduction + subpixel/aux extraction in
features.keypoints, measured by jax.profiler trace on the real chip:

  P0  current: pad -> reshape/transpose cells [Hp, Wp, s*s] -> max ->
      approx_max_k -> one cells-row gather for the winner offset
  P1  strided: s^2 strided slices -> elementwise max [Hp, Wp] ->
      approx_max_k -> winner via s^2 stacked [kk] gathers
  G0  current table: 4 shifted maps + 7-lane stack [H*W, 7] -> row gather
  G1  XLA gather with slice_sizes=(3,3) for the neighborhood + (1,1)
      picks for aux maps

Run: python scripts/profile_detect.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import shutil

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from profile_frontend import parse_trace

B, H, W = 8, 480, 640
POOL = 3
KK = 256
ITERS = 30


def pool_p0(sm):
    Hp, Wp = -(-H // POOL), -(-W // POOL)
    smp = jnp.pad(
        sm, ((0, Hp * POOL - H), (0, Wp * POOL - W)), constant_values=-jnp.inf
    )
    cells = (
        smp.reshape(Hp, POOL, Wp, POOL).transpose(0, 2, 1, 3).reshape(
            Hp * Wp, POOL * POOL
        )
    )
    cell_scores, cell_idx = lax.approx_max_k(cells.max(-1), KK, recall_target=0.99)
    rows = cells[cell_idx]
    off = jnp.argmax(rows, axis=-1)
    cy = (cell_idx // Wp) * POOL + off // POOL
    cx = (cell_idx % Wp) * POOL + off % POOL
    return cell_scores, cy * W + cx


def pool_p1(sm):
    Hp, Wp = -(-H // POOL), -(-W // POOL)
    smp = jnp.pad(
        sm, ((0, Hp * POOL - H), (0, Wp * POOL - W)), constant_values=-jnp.inf
    )
    # s^2 strided sub-grids, each [Hp, Wp]; flattened for the winner gathers
    grids = jnp.stack(
        [
            smp[i::POOL, j::POOL].reshape(-1)
            for i in range(POOL)
            for j in range(POOL)
        ]
    )  # [s*s, Hp*Wp]
    cell_max = grids.max(0)
    cell_scores, cell_idx = lax.approx_max_k(cell_max, KK, recall_target=0.99)
    rows = grids[:, cell_idx].T  # [KK, s*s]
    off = jnp.argmax(rows, axis=-1)
    cy = (cell_idx // Wp) * POOL + off // POOL
    cx = (cell_idx % Wp) * POOL + off % POOL
    return cell_scores, cy * W + cx


def gather_g0(s, ct, st, flat_idx):
    up = jnp.concatenate([s[:1], s[:-1]], 0)
    down = jnp.concatenate([s[1:], s[-1:]], 0)
    left = jnp.concatenate([s[:, :1], s[:, :-1]], 1)
    right = jnp.concatenate([s[:, 1:], s[:, -1:]], 1)
    tbl = jnp.stack([s, up, down, left, right, ct, st], -1).reshape(H * W, -1)
    return tbl[flat_idx]


def gather_g1(s, ct, st, flat_idx):
    yi = jnp.clip(flat_idx // W, 1, H - 2)
    xi = jnp.clip(flat_idx % W, 1, W - 2)
    start = jnp.stack([yi - 1, xi - 1], -1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    nb = lax.gather(
        s, start, dn, slice_sizes=(3, 3), mode=lax.GatherScatterMode.CLIP
    )  # [KK, 3, 3]
    pick = jnp.stack([yi, xi], -1)
    dnp = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0, 1), start_index_map=(0, 1)
    )
    ctv = lax.gather(ct, pick, dnp, slice_sizes=(1, 1),
                     mode=lax.GatherScatterMode.CLIP)
    stv = lax.gather(st, pick, dnp, slice_sizes=(1, 1),
                     mode=lax.GatherScatterMode.CLIP)
    return jnp.concatenate(
        [
            nb[:, 1, 1:2], nb[:, 0, 1:2], nb[:, 2, 1:2],
            nb[:, 1, 0:1], nb[:, 1, 2:3],
            ctv[:, None], stv[:, None],
        ],
        -1,
    )


def measure(fn, args, tag):
    step = jax.jit(
        lambda c, *a: c + sum(jnp.sum(o) for o in jax.tree.leaves(fn(*a)))
    )
    c = jnp.float32(0.0)
    float(step(c, *args))
    logdir = f"/tmp/det_trace_{tag}"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        c = jnp.float32(0.0)
        for _ in range(ITERS):
            c = step(c, *args)
        float(c)
    dur, cnt = parse_trace(logdir)
    top = {k: v for k, v in dur.items() if k.startswith("jit_")}
    total = sum(top.values()) / (ITERS * B)
    print(f"{tag}: {total:.1f} us/frame", flush=True)
    return total


def main():
    rng = np.random.default_rng(0)
    sm = jnp.asarray(
        np.where(
            rng.random((B, H, W)) > 0.99,
            rng.random((B, H, W)).astype(np.float32) * 10,
            -np.inf,
        ).astype(np.float32)
    )
    s = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    st = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, H * W, size=(B, KK)).astype(np.int32)
    )

    vm = lambda f: jax.vmap(f)
    measure(vm(pool_p0), (sm,), "P0_cells")
    measure(vm(pool_p1), (sm,), "P1_strided")
    measure(vm(gather_g0), (s, ct, st, idx), "G0_table")
    measure(vm(gather_g1), (s, ct, st, idx), "G1_slice_gather")
    # parity checks (host)
    a = jax.device_get(vm(pool_p0)(sm))
    b = jax.device_get(vm(pool_p1)(sm))
    np.testing.assert_allclose(a[0], b[0], rtol=1e-6)
    assert (a[1] == b[1]).mean() > 0.99  # approx_max_k ordering jitter
    ga = jax.device_get(vm(gather_g0)(s, ct, st, idx))
    gb = jax.device_get(vm(gather_g1)(s, ct, st, idx))
    # G1 clips to the interior; compare where G0's neighbors are interior
    yi = np.asarray(idx) // W
    xi = np.asarray(idx) % W
    inner = (yi >= 1) & (yi < H - 1) & (xi >= 1) & (xi < W - 1)
    np.testing.assert_allclose(ga[inner], gb[inner], rtol=1e-6)
    print("parity ok", flush=True)


if __name__ == "__main__":
    main()
