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
    args = ap.parse_args()

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
