"""Scaling benchmark: front-end frames/s and BA iterations/s at 1..N devices.

BASELINE config 5's measurement harness. On a real pod slice this reports
frames/s at 1 chip / 1 host / N hosts and the scaling efficiency
frames/s(N) / (N * frames/s(1)); on a single chip (or the CPU emulation via
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) it
exercises the same code paths.

Usage: python scripts/scaling_bench.py [--ba] [--image 512 512] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon PJRT plugin ignores JAX_PLATFORMS once registered; honor an
# explicit cpu request (virtual-mesh runs) via the authoritative config.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def bench_frontend(n_devices: int, batch: int, h: int, w: int, iters: int) -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cvsteer_tpu.filters.g2 import g2_bank
    from cvsteer_tpu.parallel import make_mesh, sharded_g2_maps
    from cvsteer_tpu.parallel.frontend_sharded import shard_batch

    mesh = make_mesh({"data": n_devices}, devices=jax.devices()[:n_devices])
    bank = g2_bank()
    b = batch * n_devices
    rng = np.random.default_rng(0)
    x = shard_batch(
        jnp.asarray(rng.uniform(0, 255, (b, h, w)).astype("float32")), mesh
    )

    @jax.jit
    def run(x):
        def body(c, _):
            e, d, br = sharded_g2_maps(x + c * 1e-6, mesh, bank)
            return c + e[0, 0, 0] + d[0, 0, 0] + br[0, 0, 0], None

        c, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = time.perf_counter() - t0
    return b * iters / dt


def bench_ba(n_devices: int, cameras: int, landmarks: int, iters: int) -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.parallel import make_mesh
    from cvsteer_tpu.parallel.ba_sharded import bundle_adjust_sharded, place_ba_inputs
    from cvsteer_tpu.slam import se3
    from cvsteer_tpu.slam.ba import BAProblem, BAState

    mesh = make_mesh({"data": n_devices}, devices=jax.devices()[:n_devices])
    rng = np.random.default_rng(0)
    L = landmarks * n_devices
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 10], (L, 3)), jnp.float32)
    R = se3.exp_so3(jnp.asarray(rng.normal(0, 0.05, (cameras, 3)), jnp.float32))
    t = jnp.asarray(
        np.stack([[0.4 * c, 0.0, 0.0] for c in range(cameras)]), jnp.float32
    )
    p = jnp.einsum("cij,lj->cli", R, X) + t[:, None, :]
    problem = BAProblem(
        uv=p[..., :2] / p[..., 2:3],
        mask=p[..., 2] > 0.5,
        fixed_cameras=jnp.asarray([True] + [False] * (cameras - 1)),
        huber_delta=0.0,
    )
    init = BAState(R=R, t=t, X=X + 0.05)
    st, prob, _ = place_ba_inputs(init, problem, mesh)

    fn = jax.jit(
        lambda s, pr: bundle_adjust_sharded(s, pr, mesh, iterations=iters)
    )
    jax.block_until_ready(fn(st, prob))
    t0 = time.perf_counter()
    out, stats = fn(st, prob)
    jax.block_until_ready((out, stats))
    dt = time.perf_counter() - t0
    return iters / dt


def bench_pgo(n_devices: int, poses: int, edges_per_dev: int, iters: int) -> float:
    """Edge-sharded pose-graph LM iterations/s (lane-array PCG; one [6, P]
    psum per CG iteration is the only per-iteration communication)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.parallel import make_mesh
    from cvsteer_tpu.parallel.posegraph_sharded import (
        optimize_pose_graph_sharded,
        place_pose_graph,
    )
    from cvsteer_tpu.slam import se3
    from cvsteer_tpu.slam.posegraph import PoseGraph, Poses

    mesh = make_mesh({"data": n_devices}, devices=jax.devices()[:n_devices])
    rng = np.random.default_rng(0)
    P = poses
    E = edges_per_dev * n_devices
    w = jnp.asarray(rng.normal(0, 0.3, (P, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1.0, (P, 3)), jnp.float32)
    R = se3.exp_so3(w)
    ii = np.concatenate([np.arange(P - 1), rng.integers(0, P - 1, E - (P - 1))])
    jj = np.concatenate([np.arange(1, P), rng.integers(1, P, E - (P - 1))])
    jj = np.where(jj == ii, (jj + 1) % P, jj)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    Rz, tz = se3.compose(R[jj], t[jj], *se3.invert(R[ii], t[ii]))
    graph = PoseGraph(
        i=ii, j=jj, R_z=Rz, t_z=tz,
        weight=jnp.ones(E, jnp.float32),
        fixed=jnp.asarray(np.arange(P) == 0),
    )
    dw = jnp.asarray(rng.normal(0, 0.03, (P, 3)), jnp.float32)
    init = Poses(R=se3.exp_so3(dw) @ R, t=t + 0.05)
    placed = place_pose_graph(graph, mesh)

    fn = jax.jit(
        lambda ps, g: optimize_pose_graph_sharded(
            ps, g, mesh, iterations=iters, cg_iterations=25
        )
    )
    jax.block_until_ready(fn(init, placed))
    t0 = time.perf_counter()
    out, stats = fn(init, placed)
    jax.block_until_ready((out, stats))
    return iters / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Analytic config-5 efficiency table (VERDICT r2 item 5b).
#
# Multi-chip hardware is not reachable from this container, so the >= 0.8
# claim is made checkable instead of prose: the communication VOLUME comes
# from the compiled-HLO collectives audit (tests/test_collectives_audit.py
# pins it — BA moves one landmark-count-independent fused psum of
# 36C^2 + 48C + 2 fp32 per LM iteration), the compute time from device
# traces on the real v5e chip, and the interconnect numbers are pinned
# public v5e figures. Every input is recorded in the emitted JSON.
# ---------------------------------------------------------------------------

# Measured on the real chip (2026-08-19 device trace, C=8): BA LM-iteration
# device time fits t = A_US + B_US_PER_LM * L over L in {1024, 8192}.
# Round 4 (VERDICT r3 item 4): scripts/ba_trace_fit.py re-measures at
# L up to 3e5 — covering the table's whole L range — and passes the
# refit (plus the measured points) into analytic_ba_efficiency, so the
# defaults below are only the historical fallback.
_BA_A_US = 48.4
_BA_B_US_PER_LM = 0.0193
# Interconnect assumptions (documented inputs, not measurements): a v5e pod
# slice's ICI moves ~45 GB/s effective per allreduce direction with ~8 us
# software+hop latency per collective; DCN (inter-slice) ~6 GB/s with
# ~60 us latency. Ring allreduce moves 2(n-1)/n * payload per chip.
_LINKS = {"ici": (45e9, 8e-6), "dcn": (6e9, 60e-6)}


def analytic_ba_efficiency(
    out_path: str = "SCALING_r03.json",
    a_us: float = _BA_A_US,
    b_us_per_lm: float = _BA_B_US_PER_LM,
    measured_points=None,
    t1_table=None,
    c_scale=None,
) -> dict:
    """``t1_table``: {L: measured C=8 iter us} covering EXACTLY the table's
    L values (scripts/ba_trace_fit.py) — when given, every row's compute
    input is a measurement, and the affine (a_us, b_us_per_lm) fallback is
    unused. ``c_scale``: {C: measured iter-time multiplier vs C=8} pinning
    the linear-in-C assumption. ``measured_points``: the raw device-trace
    samples, recorded in the JSON for auditability."""
    _BA_A_US, _BA_B_US_PER_LM = a_us, b_us_per_lm  # noqa: F841 (shadow)
    c_scale = c_scale or {}
    table = []
    for link, (bw, lat) in _LINKS.items():
        for C in (8, 16, 32):
            # compute model: residual/Jacobian/Schur work is linear in both
            # C and L (C=8 anchor; the C^3 reduced solve is negligible at
            # these window sizes)
            for L in (10_000, 100_000, 1_000_000):
                if t1_table and L in t1_table:
                    mult = c_scale.get(C, C / 8.0)
                    t1 = t1_table[L] * mult * 1e-6
                else:
                    t1 = (_BA_A_US + _BA_B_US_PER_LM * L) * (C / 8.0) * 1e-6
                payload = 4 * (36 * C * C + 48 * C + 2)  # audited psum bytes
                for n in (2, 4, 8, 16, 32):
                    t_comm = lat + 2 * (n - 1) / n * payload / bw
                    t_n = t1 / n + t_comm
                    eff = t1 / (n * t_n)
                    table.append({
                        "solver": "ba_landmark_sharded", "link": link,
                        "C": C, "L": L, "chips": n,
                        "iter_us_1chip": round(t1 * 1e6, 1),
                        "comm_us": round(t_comm * 1e6, 2),
                        "efficiency": round(eff, 3),
                    })
    meets = [r for r in table if r["efficiency"] >= 0.8]
    # ---- C-scaling attribution (VERDICT r4 item 8) ----------------------
    # The measured superlinearity in C fits t(C) = a*C + b*C^2 at fixed L:
    # the linear term is the per-observation residual/Jacobian work over
    # the dense [C, L] grid; the QUADRATIC term is the cross-camera Schur
    # complement assembly (S = sum_l B_l^T D_l^-1 B_l fills all C x C
    # 6x6 blocks -> O(C^2 L) MXU FLOPs). Fit from the measured C points;
    # the r4 numbers give a = 345 us, b = 3.67 us at L = 1e5 and predict
    # C=16 at 2.157x (measured 2.157) / C=32 at 4.94x (measured 4.74,
    # -4 %): the superlinearity is the algorithmic C^2 term, not padding
    # or recompilation (compile time is excluded by the device trace).
    attribution = None
    if c_scale and len(c_scale) >= 3:
        Cs = sorted(c_scale)
        import numpy as _np

        A = _np.array([[c, c * c] for c in Cs], float)
        y = _np.array([c_scale[c] for c in Cs], float)
        (a_fit, b_fit), res, *_ = _np.linalg.lstsq(A, y, rcond=None)
        pred = A @ _np.array([a_fit, b_fit])
        attribution = {
            "model": "t(C)/t(8) = a*C + b*C^2 (a: [C,L]-grid residual/"
                     "Jacobian work; b: O(C^2 L) cross-camera Schur "
                     "assembly)",
            "fit": {"a": round(float(a_fit), 5), "b": round(float(b_fit), 6)},
            "fit_error_pct": [
                round(100 * float(p / m - 1), 1)
                for p, m in zip(pred, y)
            ],
            "schur_c2_share_at_C": {
                str(c): round(float(b_fit * c * c / (a_fit * c + b_fit * c * c)), 3)
                for c in Cs
            },
        }
    out = {
        "model": "eff(n) = t1 / (n * (t1/n + lat + 2(n-1)/n * bytes/bw))",
        "inputs": {
            "ba_iter_us(C=8, L)": (
                {str(k): v for k, v in t1_table.items()}
                if t1_table else
                f"{_BA_A_US} + {_BA_B_US_PER_LM}*L (device trace, v5e chip)"
            ),
            "c_scale_measured": {str(k): v for k, v in (c_scale or {}).items()},
            "measured_points": measured_points
            or "historical fit over L in {1024, 8192} (round 3)",
            "psum_bytes": "4 * (36C^2 + 48C + 2) — pinned by tests/test_collectives_audit.py",
            "links": {k: {"bw_B_per_s": v[0], "latency_s": v[1]} for k, v in _LINKS.items()},
        },
        "headline": {
            "claim": ">= 0.8 efficiency at 2+ hosts (BASELINE config 5)",
            "holds_when": "L/chip >= ~25k landmarks over ICI; >= ~300k over DCN "
                          "(see table: comm is L-independent, compute is linear in L)",
            "dcn_small_L": "windowed-BA-sized problems (L ~ 1e4, the VO "
                           "engine's per-promotion solve) DO NOT scale over "
                           "DCN (0.11-0.5 efficiency at 2-32 chips): only "
                           "global map BA (L >= ~3e5/chip) benefits from "
                           "DCN fan-out; windowed solves stay on one chip "
                           "or ICI.",
        },
        "c_scaling_attribution": attribution,
        "table": table,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    worst_big = min(
        r["efficiency"] for r in table
        if r["link"] == "ici" and r["L"] >= 100_000 and r["chips"] <= 8
    )
    print(json.dumps({"metric": "analytic_ba_efficiency",
                      "ici_L>=1e5_chips<=8_min": worst_big,
                      "rows": len(table), "out": out_path}))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", nargs=2, type=int, default=[512, 512])
    ap.add_argument("--batch", type=int, default=16, help="per-device batch")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--ba", action="store_true", help="also bench distributed BA")
    ap.add_argument("--pgo", action="store_true", help="also bench edge-sharded pose graph")
    ap.add_argument("--poses", type=int, default=256)
    ap.add_argument("--edges", type=int, default=512, help="per device")
    ap.add_argument("--cameras", type=int, default=12)
    ap.add_argument("--landmarks", type=int, default=512, help="per device")
    ap.add_argument(
        "--analytic", action="store_true",
        help="emit the analytic config-5 efficiency table (SCALING_r03.json)",
    )
    args = ap.parse_args()

    if args.analytic:
        analytic_ba_efficiency()
        return 0

    import jax

    n = len(jax.devices())
    sizes = sorted({1, 2, n} & set(range(1, n + 1)))
    h, w = args.image

    results = {}
    for nd in sizes:
        fps = bench_frontend(nd, args.batch, h, w, args.iters)
        results[nd] = fps
        eff = fps / (nd * results[1]) if 1 in results and nd > 1 else 1.0
        print(
            json.dumps(
                {
                    "metric": f"frontend_fps_{h}x{w}",
                    "devices": nd,
                    "value": round(fps, 1),
                    "unit": "frames/s",
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )

    if args.ba:
        for nd in sizes:
            ips = bench_ba(nd, args.cameras, args.landmarks, 10)
            print(
                json.dumps(
                    {
                        "metric": "ba_lm_iterations",
                        "devices": nd,
                        "landmarks": args.landmarks * nd,
                        "cameras": args.cameras,
                        "value": round(ips, 2),
                        "unit": "iters/s",
                    }
                )
            )

    if args.pgo:
        for nd in sizes:
            ips = bench_pgo(nd, args.poses, args.edges, 10)
            print(
                json.dumps(
                    {
                        "metric": "pgo_lm_iterations",
                        "devices": nd,
                        "poses": args.poses,
                        "edges": args.edges * nd,
                        "value": round(ips, 2),
                        "unit": "iters/s",
                    }
                )
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
