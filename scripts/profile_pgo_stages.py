"""Isolate pose-graph LM-iteration stage costs on the TPU.

Each stage is repeated UNROLL times INSIDE one jitted dispatch (chained by
a scalar carry) so the ms-scale per-dispatch tunnel overhead divides out;
the reported number is device time per stage evaluation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.slam import posegraph as pg
from scripts.profile_pgo import make_graph

UNROLL = 20
CALLS = 8


def timed(name, fn, poses, graph):
    @jax.jit
    def step(c):
        for _ in range(UNROLL):
            ps = pg.Poses(poses.R + c * 1e-12, poses.t)
            c = c + fn(ps) * 1e-20
        return c

    c = step(jnp.float32(0.0))
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(CALLS):
        c = step(c)
    float(c)
    dt = time.perf_counter() - t0
    print(f"{name:30s} {1e6 * dt / (UNROLL * CALLS):9.1f} us/eval")


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    poses, graph = make_graph(P, E)
    print(f"backend={jax.default_backend()} P={P} E={E} unroll={UNROLL}")
    lam = jnp.float32(1e-4)

    timed("cost (lane residual)", lambda ps: pg.cost(ps, graph), poses, graph)

    def jac(ps):
        Ji, Jj, r = pg._edge_jacobians_lanes(ps, graph)
        return sum(sum(x.sum() for x in row) for row in Ji) + r[0].sum()

    timed("edge jacobians (linearize)", jac, poses, graph)
    timed(
        "dense solve (G + chol)",
        lambda ps: pg._solve_dense_lanes(ps, graph, lam).sum(),
        poses,
        graph,
    )

    n = 6 * P
    A0 = np.random.default_rng(0).normal(size=(n, n)).astype(np.float32)
    A0 = jnp.asarray(A0 @ A0.T + n * np.eye(n, dtype=np.float32))
    timed(
        f"cholesky {n}x{n} alone",
        lambda ps: jnp.linalg.cholesky(A0 + ps.t[0, 0] * 1e-12)[0, 0],
        poses,
        graph,
    )

    for cg in (10, 25):
        timed(
            f"pcg solve (cg={cg})",
            lambda ps, cg=cg: pg._gn_step_matfree(ps, graph, lam, cg, None).sum(),
            poses,
            graph,
        )


if __name__ == "__main__":
    main()
