"""Time pose-graph optimization on the TPU: per-LM-iteration device cost.

Usage: python scripts/profile_pgo.py [P] [E] [solver]
Chained-dispatch timing (axon tunnel: host loops don't serialize, so
iterations are chained through the carried pose state and one scalar is
fetched at the end).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.posegraph import (
    PoseGraph,
    Poses,
    optimize_pose_graph,
)


def make_graph(P: int, E: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    # ground-truth poses along a noisy circle
    w = rng.normal(0, 0.3, (P, 3)).astype(np.float32)
    t = rng.normal(0, 1.0, (P, 3)).astype(np.float32)
    R = np.asarray(jax.vmap(se3.exp_so3)(jnp.asarray(w)))
    # edges: sequential chain + random extras
    ii = list(range(P - 1)) + list(rng.integers(0, P - 1, E - (P - 1)))
    jj = list(range(1, P)) + [min(i + int(g), P - 1) for i, g in
                              zip(rng.integers(0, P - 1, E - (P - 1)),
                                  rng.integers(2, 10, E - (P - 1)))]
    ii = np.asarray(ii[:E], np.int32)
    jj = np.asarray(jj[:E], np.int32)
    jj = np.where(jj == ii, (jj + 1) % P, jj)
    Ri, ti = R[ii], t[ii]
    Rj, tj = R[jj], t[jj]
    # measured relative pose with noise
    Rz = np.einsum("eab,ecb->eac", Rj, Ri)
    tz = tj - np.einsum("eab,eb->ea", Rz, ti)
    wn = rng.normal(0, 0.01, (E, 3)).astype(np.float32)
    Rz = np.asarray(jax.vmap(se3.exp_so3)(jnp.asarray(wn))) @ Rz
    tz = tz + rng.normal(0, 0.01, (E, 3)).astype(np.float32)
    graph = PoseGraph(
        i=jnp.asarray(ii), j=jnp.asarray(jj),
        R_z=jnp.asarray(Rz), t_z=jnp.asarray(tz),
        weight=jnp.ones(E, jnp.float32),
        fixed=jnp.asarray(np.arange(P) == 0),
    )
    # noisy initial poses
    w0 = w + rng.normal(0, 0.05, (P, 3)).astype(np.float32)
    t0 = t + rng.normal(0, 0.1, (P, 3)).astype(np.float32)
    poses = Poses(R=jnp.asarray(jax.vmap(se3.exp_so3)(jnp.asarray(w0))),
                  t=jnp.asarray(t0))
    return poses, graph


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    solver = sys.argv[3] if len(sys.argv) > 3 else "dense"
    iters = 25
    calls = 4
    poses, graph = make_graph(P, E)
    print(f"backend={jax.default_backend()} P={P} E={E} solver={solver}")

    run = jax.jit(lambda ps: optimize_pose_graph(
        ps, graph, iterations=iters, solver=solver, cg_iterations=25))
    t0 = time.perf_counter()
    out, stats = run(poses)
    float(stats.cost)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"cost {float(stats.initial_cost):.4f} -> {float(stats.cost):.4f}")

    t0 = time.perf_counter()
    ps = poses
    for _ in range(calls):
        ps, stats = run(ps)  # chained through the pose state
    float(stats.cost)
    dt = time.perf_counter() - t0
    n = iters * calls
    print(f"{n} LM iters in {dt:.3f}s = {1e6 * dt / n:.1f} us/iter "
          f"({n / dt:.0f} iters/s)")


if __name__ == "__main__":
    main()
