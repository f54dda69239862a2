"""Experiment harness for G2 fused-kernel optimization candidates.

Each variant is a full image->3-maps kernel; reports trace-derived device
us/frame AND max relative error vs the fp32 XLA reference path, so speed
and parity are judged together. See scripts/profile_frontend.py for the
stage-isolation breakdown this builds on.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsteer_tpu.filters.g2 import g2_bank, steerable_pipeline_g2
from cvsteer_tpu.ops import pallas_frontend as pf

ITERS = 8


def _maps_from_basis(g2a, g2b, g2c, h2a, h2b, h2c, h2d):
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
    return _maps_from_coeffs(c2, c3, g2a, g2b, g2c, h2a, h2b, h2c, h2d)


def _maps_from_coeffs(c2, c3, g2a, g2b, g2c, h2a, h2b, h2c, h2d):
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
    edges = (h2v * h2v) * inv_mag
    g2sq = (g2v * g2v) * inv_mag
    dark = jnp.where(g2v > 0.0, g2sq, 0.0)
    bright = jnp.where(g2v < 0.0, g2sq, 0.0)
    return edges, dark, bright


def _dma_prologue(img_hbm, band, sems, tile_h, r, num_tiles):
    n = pl.program_id(0)
    t = pl.program_id(1)
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
    return band[slot]


# --------------------------------------------------------------- variants


def _kernel_baseline(img_hbm, colmat_ref, o0, o1, o2, band, sems,
                     *, xtaps, tile_h, wo, num_tiles, precision):
    r = (xtaps.shape[1] - 1) // 2
    padded = _dma_prologue(img_hbm, band, sems, tile_h, r, num_tiles)
    rows_st = jnp.stack(pf._row_pass_symmetric(padded, xtaps, wo))
    basis = jax.lax.dot_general(
        colmat_ref[:], rows_st, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    e, d, b = _maps_from_basis(*[basis[k] for k in range(7)])
    o0[0], o1[0], o2[0] = e, d, b


def _kernel_rowmxu(img_hbm, colmat_ref, xhi_ref, xlo_ref, o0, o1, o2, band, sems,
                   *, xtaps, tile_h, wo, num_tiles, precision, row_splits):
    """Row pass as a tap-contraction dot on the MXU over the shifted stack."""
    K, T = xtaps.shape
    r = (T - 1) // 2
    padded = _dma_prologue(img_hbm, band, sems, tile_h, r, num_tiles)
    S = jnp.stack([padded[:, u : u + wo] for u in range(T)])  # [T, bh, wo]
    band_h = tile_h + 2 * r
    Sf = S.reshape(T, band_h * wo)
    if row_splits == 2:
        Sb = Sf.astype(jnp.bfloat16)
        rows = (
            jax.lax.dot_general(xhi_ref[:], Sb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xlo_ref[:], Sb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        )
    else:
        rows = jax.lax.dot_general(
            xhi_ref[:].astype(jnp.float32) + xlo_ref[:].astype(jnp.float32), Sf,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    rows_st = rows.reshape(K, band_h, wo)
    basis = jax.lax.dot_general(
        colmat_ref[:], rows_st, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    e, d, b = _maps_from_basis(*[basis[k] for k in range(7)])
    o0[0], o1[0], o2[0] = e, d, b


def _kernel_presplit(img_hbm, chi_ref, clo_ref, o0, o1, o2, band, sems,
                     *, xtaps, tile_h, wo, num_tiles, stage="full"):
    """bf16x3 column pass with zero runtime split passes.

    The row pass emits hi/lo bf16 halves straight from its register-resident
    accumulators (same VMEM write bytes as one fp32 store); the column
    matrices are prebaked as bf16 hi/lo constants; the column conv is then
    three plain bf16 MXU matmuls accumulated in fp32 — numerically the same
    bf16x3 scheme as Precision.HIGHEST, without Mosaic's per-step operand
    splitting of the rows stack."""
    r = (xtaps.shape[1] - 1) // 2
    padded = _dma_prologue(img_hbm, band, sems, tile_h, r, num_tiles)
    accs = pf._row_pass_symmetric(padded, xtaps, wo)
    his, los = [], []
    for acc in accs:
        hi = acc.astype(jnp.bfloat16)
        los.append((acc - hi.astype(jnp.float32)).astype(jnp.bfloat16))
        his.append(hi)
    rows_hi = jnp.stack(his)
    rows_lo = jnp.stack(los)
    if stage == "row":
        # consume every filter's rows so nothing is dead-code-eliminated
        tot = sum(rows_hi[k][:tile_h].astype(jnp.float32) for k in range(7))
        totl = sum(rows_lo[k][:tile_h].astype(jnp.float32) for k in range(7))
        o0[0] = tot
        o1[0] = totl
        o2[0] = tot + totl
        return
    dn = (((2,), (1,)), ((0,), (0,)))
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    basis = dot(chi_ref[:], rows_hi) + dot(chi_ref[:], rows_lo) + dot(clo_ref[:], rows_hi)
    if stage == "col":
        o0[0] = sum(basis[k] for k in range(7))
        o1[0] = basis[0] - basis[1]
        o2[0] = basis[2] - basis[3]
        return
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(7)]
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
        o2[0] = c2 + c3
        return
    e, d, b = _maps_from_coeffs(c2, c3, g2a, g2b, g2c, h2a, h2b, h2c, h2d)
    o0[0], o1[0], o2[0] = e, d, b


def _kernel_factored(img_hbm, colmat_ref, o0, o1, o2, band, sems,
                     *, xtaps, tile_h, wo, num_tiles, precision):
    """Energy coefficients via the harmonic factorization:
    G2(t) = A + X cos2t - Y sin2t ; H2(t) = P cos t + Q sin t + R cos3t + S sin3t
    c2 = 2AX + (P^2-Q^2)/2 + PR + QS ; c3 = -2AY + PQ + PS - QR.
    """
    r = (xtaps.shape[1] - 1) // 2
    padded = _dma_prologue(img_hbm, band, sems, tile_h, r, num_tiles)
    rows_st = jnp.stack(pf._row_pass_symmetric(padded, xtaps, wo))
    basis = jax.lax.dot_general(
        colmat_ref[:], rows_st, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = [basis[k] for k in range(7)]
    A = 0.5 * (g2a + g2c)
    X = 0.5 * (g2a - g2c)
    Y = g2b
    P = 0.75 * (h2a + h2c)
    Q = -0.75 * (h2b + h2d)
    R = 0.25 * h2a - 0.75 * h2c
    S = 0.25 * h2d - 0.75 * h2b
    c2 = 2.0 * A * X + 0.5 * (P - Q) * (P + Q) + P * R + Q * S
    c3 = -2.0 * A * Y + P * Q + P * S - Q * R
    e, d, b = _maps_from_coeffs(c2, c3, g2a, g2b, g2c, h2a, h2b, h2c, h2d)
    o0[0], o1[0], o2[0] = e, d, b


def build(kind, precision, B, H, W, tile_h):
    bank = g2_bank()
    xtaps = np.asarray(bank.xtaps, np.float32)
    ytaps = np.asarray(bank.ytaps, np.float32)
    K, T = xtaps.shape
    r = (T - 1) // 2
    ho, wo = H, W
    wp = pf._round_up(wo + 2 * r, 128)
    num_tiles = ho // tile_h
    band_h = tile_h + 2 * r
    ptag = {lax.Precision.HIGHEST: "hi", lax.Precision.DEFAULT: "def"}[precision]
    name = f"v_{kind}_{ptag}_t{tile_h}"

    colmat = jnp.asarray(pf._col_conv_matrix(ytaps, tile_h, band_h))
    extra = []
    if kind.startswith("presplit"):
        stage = kind.split(":")[1] if ":" in kind else "full"
        name = f"v_{kind.replace(':', '_')}_{ptag}_t{tile_h}"
        cm = pf._col_conv_matrix(ytaps, tile_h, band_h)
        chi = cm.astype(np.float32).astype(jnp.bfloat16)
        clo = (cm - np.asarray(chi, np.float32)).astype(jnp.bfloat16)
        kernel = functools.partial(
            _kernel_presplit, xtaps=xtaps, tile_h=tile_h, wo=wo,
            num_tiles=num_tiles, stage=stage)

        spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((B, ho, wo), jnp.float32)

        def run(img_padded):
            return pl.pallas_call(
                kernel,
                grid=(B, num_tiles),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=(spec, spec, spec),
                out_shape=(shape, shape, shape),
                scratch_shapes=[pltpu.VMEM((2, band_h, wp), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
                name=name,
                interpret=pf._interpret(),
            )(img_padded, jnp.asarray(chi), jnp.asarray(clo))

        @jax.jit
        def chain(img_padded, carry):
            a, b, c = run(img_padded + carry * 1e-6)
            return carry + a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]

        @jax.jit
        def once(img_padded):
            return run(img_padded)

        return name, chain, once
    if kind == "rowmxu":
        xhi = xtaps.astype(np.float32).astype(jnp.bfloat16)
        xlo = (xtaps - np.asarray(xhi, np.float32)).astype(jnp.bfloat16)
        extra = [jnp.asarray(xhi), jnp.asarray(xlo)]
        kernel = functools.partial(
            _kernel_rowmxu, xtaps=xtaps, tile_h=tile_h, wo=wo,
            num_tiles=num_tiles, precision=precision, row_splits=2)
    elif kind == "factored":
        kernel = functools.partial(
            _kernel_factored, xtaps=xtaps, tile_h=tile_h, wo=wo,
            num_tiles=num_tiles, precision=precision)
    else:
        kernel = functools.partial(
            _kernel_baseline, xtaps=xtaps, tile_h=tile_h, wo=wo,
            num_tiles=num_tiles, precision=precision)

    spec = pl.BlockSpec((1, tile_h, wo), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, ho, wo), jnp.float32)

    def run(img_padded):
        return pl.pallas_call(
            kernel,
            grid=(B, num_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=(spec, spec, spec),
            out_shape=(shape, shape, shape),
            scratch_shapes=[pltpu.VMEM((2, band_h, wp), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            name=name,
            interpret=pf._interpret(),
        )(img_padded, colmat, *extra)

    @jax.jit
    def chain(img_padded, carry):
        a, b, c = run(img_padded + carry * 1e-6)
        return carry + a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]

    @jax.jit
    def once(img_padded):
        return run(img_padded)

    return name, chain, once


def parse_trace(logdir):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    dur = collections.Counter()
    for f in files:
        data = json.load(gzip.open(f))
        pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
                dur[e["name"]] += e.get("dur", 0)
    return dur


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
               ((0, 0), (0, 0), (0, wp - W - 2 * r))))

    ref = steerable_pipeline_g2(jnp.asarray(img[:2]), bank, method="xla")
    refs = [np.asarray(ref.edges), np.asarray(ref.lines_dark), np.asarray(ref.lines_bright)]
    scale = max(np.abs(x).max() for x in refs)

    cases = [
        ("presplit:row", lax.Precision.HIGHEST, 64),
        ("presplit:col", lax.Precision.HIGHEST, 64),
        ("presplit:coeff", lax.Precision.HIGHEST, 64),
        ("presplit", lax.Precision.HIGHEST, 64),
    ]
    print(f"# variants: B={B} {H}x{W}")
    print("| variant | device us/frame | max rel err |")
    print("|---|---|---|")
    for kind, prec, th in cases:
        try:
            name, chain, once = build(kind, prec, B, H, W, th)
            outs = once(img_padded)
            err = max(
                float(np.abs(np.asarray(o)[:2] - rf).max()) for o, rf in zip(outs, refs)
            ) / float(scale)
            shutil.rmtree(f"/tmp/pv_{name}", ignore_errors=True)
            c = jnp.float32(0.0)
            float(chain(img_padded, c))
            with jax.profiler.trace(f"/tmp/pv_{name}"):
                c = jnp.float32(0.0)
                for _ in range(ITERS):
                    c = chain(img_padded, c)
                float(c)
            dur = parse_trace(f"/tmp/pv_{name}")
            kus = next((v for k, v in dur.items() if name in k), 0)
            print(f"| {name} | {kus / ITERS / B:.2f} | {err:.2e} |")
        except Exception as ex:
            print(f"| {kind}/{prec}/{th} | FAILED {type(ex).__name__}: {str(ex)[:120]} | |")


if __name__ == "__main__":
    main()
