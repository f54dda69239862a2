"""One-shot TPU measurement sweep for a returning tunnel session.

Runs, in order (each independently timed, failures don't stop the rest):
  1. a tunnel health probe,
  2. pose-graph LM iteration wall at three sizes (lane solvers),
  3. feature-extraction frames/s (pooled top-k path),
  4. fused G2 front-end frames/s (bench.bench_device),
  5. VO frames/s + ATE and the 8-stream server aggregate.

Usage: python scripts/tpu_session_measure.py [--skip frontend,features,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe() -> bool:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    y = float((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum())
    print(f"probe ok ({y:.0f}) in {time.perf_counter() - t0:.1f}s "
          f"backend={jax.default_backend()}", flush=True)
    return True


def pgo():
    import jax

    from cvsteer_tpu.slam.posegraph import optimize_pose_graph
    from scripts.profile_pgo import make_graph

    for P, E in [(128, 512), (1024, 4096), (4096, 16384)]:
        poses, graph = make_graph(P, E)
        run = jax.jit(lambda ps, g=graph: optimize_pose_graph(
            ps, g, iterations=25, solver="pcg", cg_iterations=25))
        t0 = time.perf_counter()
        out, stats = run(poses)
        float(stats.cost)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        cur = poses
        for _ in range(3):
            cur, stats = run(cur)
        float(stats.cost)
        dt = time.perf_counter() - t0
        print(f"pgo P={P} E={E}: {1e6 * dt / 75:.1f} us/LM-iter "
              f"(compile {comp:.0f}s)", flush=True)


def features():
    import bench

    f = bench.bench_features()
    print(f"features: {f:.1f} frames/s @480x640 b8", flush=True)


def frontend():
    import bench

    v = bench.bench_device(bench._images())
    print(f"frontend: {v:.0f} frames/s @512x512 b64", flush=True)


def vo():
    import bench

    fps, ate = bench.bench_vo()
    print(f"vo: {fps:.1f} frames/s, ate {ate:.4f} m "
          f"(fused keyframe step: 1 track fetch + 1 fused tri+BA fetch)",
          flush=True)
    agg = bench.bench_vo_server(8)
    print(f"vo_server: {agg:.1f} frames/s aggregate over 8 streams "
          f"(2 batched round-trips/step)", flush=True)
    dv_fps, dv_ate = bench.bench_vo_device()
    print(f"vo_device: {dv_fps:.1f} frames/s, ate {dv_ate:.4f} m "
          f"(device-resident map: 1 RTT/frame)", flush=True)
    agg, med, mx = bench.bench_vo_device_server(8, fleet=False)
    print(f"vo_device_server: {agg:.1f} frames/s aggregate over 8 streams "
          f"(per-stream dispatch, 1 round-trip/step; ate med {med:.3f} "
          f"max {mx:.3f})", flush=True)
    for S in (8, 16):
        agg, med, mx = bench.bench_vo_device_server(S, fleet=True)
        print(f"vo_device_fleet: {agg:.1f} frames/s aggregate over {S} "
              f"streams (vmapped: 1 dispatch + 1 fetch/tick; ate med "
              f"{med:.3f} max {mx:.3f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: pgo,features,frontend,vo")
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    probe()
    for name, fn in [
        ("pgo", pgo), ("features", features), ("frontend", frontend), ("vo", vo),
    ]:
        if name in skip:
            continue
        try:
            fn()
        except Exception as e:  # keep sweeping
            print(f"{name} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
