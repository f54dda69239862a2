"""HLO collectives audit for the distributed solvers (VERDICT r2 item 5).

BASELINE config 5's >= 0.8 scaling-efficiency claim rests on a comm
contract: landmark-sharded BA moves ONE landmark-count-independent psum
of the reduced camera system per LM iteration, and edge-sharded PGO one
[6, P] psum per CG iteration plus one (b, diag) tuple per LM iteration.
These tests compile the real solvers on the 8-device CPU mesh, parse the
optimized HLO, and pin the all-reduce count and payload sizes — so the
contract cannot silently regress. scripts/scaling_bench.py turns the same
numbers into the analytic efficiency table (SCALING_r03.json).
"""

import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

from cvsteer_tpu.parallel.mesh import make_mesh

_SHAPE_RE = re.compile(r"%\S+ = (\([^)]*\)|\S+) all-reduce\(")


def _allreduce_payloads(hlo: str):
    """Element counts of every all-reduce-defining op in optimized HLO."""
    out = []
    for m in _SHAPE_RE.finditer(hlo):
        shapes = re.findall(r"f32\[([\d,]*)\]", m.group(1))
        elems = 0
        for s in shapes:
            n = 1
            for d in filter(None, s.split(",")):
                n *= int(d)
            elems += n
        out.append(elems)
    return sorted(out)


def _compile_ba(C, L, iterations=10):
    from test_ba import _synthetic_ba

    from cvsteer_tpu.parallel.ba_sharded import (
        bundle_adjust_sharded,
        place_ba_inputs,
    )

    problem, gt, init = _synthetic_ba(C=C, L=L, pose_err=0.02, point_err=0.05)
    mesh = make_mesh({"data": 8})
    st, prob, _ = place_ba_inputs(init, problem, mesh)
    fn = jax.jit(
        lambda s, p: bundle_adjust_sharded(s, p, mesh, iterations=iterations)
    )
    return fn.lower(st, prob).compile().as_text()


def test_ba_sharded_one_psum_per_lm_iteration():
    """Exactly one fused reduced-system all-reduce (inside the LM while
    body) + two scalar cost psums; payload = C^2*36 + C*36 + 2*C*6 floats
    regardless of landmark count."""
    C = 6
    expected = C * C * 36 + C * 36 + 2 * C * 6  # S + Jt_bc + b_c + extra diag
    payloads_small = _allreduce_payloads(_compile_ba(C, 64))
    payloads_large = _allreduce_payloads(_compile_ba(C, 512))
    # identical collective structure at 8x the landmarks
    assert payloads_small == payloads_large
    # two scalar cost psums + ONE fused tuple carrying the reduced system
    assert payloads_small[:2] == [1, 1]
    assert len(payloads_small) == 3
    assert payloads_small[2] == expected, payloads_small


def test_pgo_sharded_collectives_are_edge_count_independent():
    """One [6, P] psum per CG iteration + one (b, diag) tuple per LM
    iteration + two scalar psums; payloads scale with poses P, never with
    the sharded edge count E."""
    from cvsteer_tpu.parallel.posegraph_sharded import optimize_pose_graph_sharded
    from cvsteer_tpu.slam.posegraph import PoseGraph, Poses

    P_ = 32

    def compile_pgo(E_):
        rng = np.random.default_rng(0)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (P_, 3, 3)).copy()
        t = rng.normal(0, 0.1, (P_, 3)).astype(np.float32)
        i = rng.integers(0, P_ - 1, E_).astype(np.int32)
        j = np.minimum(i + 1, P_ - 1).astype(np.int32)
        graph = PoseGraph(
            i=jnp.asarray(i), j=jnp.asarray(j),
            R_z=jnp.asarray(
                np.broadcast_to(np.eye(3, dtype=np.float32), (E_, 3, 3)).copy()
            ),
            t_z=jnp.asarray(rng.normal(0, 0.1, (E_, 3)).astype(np.float32)),
            weight=jnp.ones(E_),
            fixed=jnp.asarray(np.arange(P_) == 0),
        )
        mesh = make_mesh({"data": 8})
        fn = jax.jit(
            lambda p, g: optimize_pose_graph_sharded(
                Poses(*p), g, mesh, iterations=5, cg_iterations=10
            )
        )
        return fn.lower((jnp.asarray(R), jnp.asarray(t)), graph).compile().as_text()

    payloads_small = _allreduce_payloads(compile_pgo(128))
    payloads_large = _allreduce_payloads(compile_pgo(1024))
    assert payloads_small == payloads_large  # E-independent
    assert payloads_small[:2] == [1, 1]  # scalar cost psums
    assert 6 * P_ in payloads_small  # CG SpMV psum [6, P]
    assert 6 * P_ + 36 * P_ in payloads_small  # (b, diag) LM tuple
    assert len(payloads_small) == 4
