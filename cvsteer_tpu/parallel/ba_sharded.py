"""Distributed bundle adjustment: landmarks sharded over a mesh axis.

BASELINE config 5's BA half. The Schur trick is naturally landmark-
separable, which makes landmark sharding the right decomposition:

- each device owns an L/n_shards slice of the landmark blocks (H_ll, W,
  b_l) and its share of the observation grid;
- the reduced camera system S [C,6,C,6] (small: C is the window size) is
  assembled with one psum over the landmark axis — this is the
  reduce-scatter/allreduce over ICI mandated by the north star;
- S is solved replicated on every device (cheap), and landmark
  back-substitution happens locally on each shard with zero communication.

Per LM iteration the only collectives are that psum (C^2*36 + C*6 floats)
and a scalar cost psum — communication independent of L, so scaling
efficiency approaches 1 as L grows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvsteer_tpu.slam.ba import BAProblem, BAState, BAStats, bundle_adjust


def pad_landmarks(
    problem: BAProblem, state: BAState, num_shards: int
) -> Tuple[BAProblem, BAState, int]:
    """Pad L up to a multiple of num_shards with masked-out slots."""
    L = state.X.shape[0]
    Lp = -(-L // num_shards) * num_shards
    if Lp == L:
        return problem, state, L
    pad = Lp - L
    problem = problem._replace(
        uv=jnp.pad(problem.uv, ((0, 0), (0, pad), (0, 0))),
        mask=jnp.pad(problem.mask, ((0, 0), (0, pad))),
    )
    # padded landmarks far in front of every camera so z-guards stay happy
    Xp = jnp.pad(state.X, ((0, pad), (0, 0)), constant_values=1.0)
    return problem, state._replace(X=Xp), L


def bundle_adjust_sharded(
    state: BAState,
    problem: BAProblem,
    mesh: Mesh,
    *,
    lm_axis: str = "data",
    iterations: int = 20,
    lam0: float = 1e-4,
) -> Tuple[BAState, BAStats]:
    """Distributed LM bundle adjustment over ``mesh`` (landmark sharding).

    Cameras (R, t) are replicated; X and the observation grid are sharded
    along ``lm_axis``. Results are identical to the single-device
    slam.ba.bundle_adjust (up to reduction-order float differences).
    """
    n_shards = mesh.shape[lm_axis]
    problem, state, L = pad_landmarks(problem, state, n_shards)

    fixed = problem.fixed_cameras
    huber = problem.huber_delta

    def local(uv, mask, R, t, X):
        prob = BAProblem(uv=uv, mask=mask, fixed_cameras=fixed, huber_delta=huber)
        st = BAState(R=R, t=t, X=X)
        return bundle_adjust(
            st, prob, iterations=iterations, lam0=lam0, axis_name=lm_axis
        )

    lm = P(lm_axis)
    obs = P(None, lm_axis)
    rep = P()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, lm_axis, None), obs, rep, rep, P(lm_axis, None)),
        out_specs=(
            BAState(R=rep, t=rep, X=P(lm_axis, None)),
            BAStats(cost=rep, initial_cost=rep, iterations=rep, lambda_final=rep),
        ),
        check_vma=False,
    )
    out_state, stats = fn(problem.uv, problem.mask, state.R, state.t, state.X)
    return out_state._replace(X=out_state.X[:L]), stats


def place_ba_inputs(
    state: BAState, problem: BAProblem, mesh: Mesh, lm_axis: str = "data"
):
    """Pad L to the shard count and device-put BA inputs with the
    distributed sharding (X and observations sharded by landmark).

    Returns (state, problem, original_L) — crop the result's X back with
    ``X[:original_L]`` (bundle_adjust_sharded already does this when it can
    see unpadded inputs; pre-padded inputs pass through unchanged)."""
    problem, state, L = pad_landmarks(problem, state, mesh.shape[lm_axis])
    ns = lambda spec: NamedSharding(mesh, spec)
    state = BAState(
        R=jax.device_put(state.R, ns(P())),
        t=jax.device_put(state.t, ns(P())),
        X=jax.device_put(state.X, ns(P(lm_axis, None))),
    )
    problem = problem._replace(
        uv=jax.device_put(problem.uv, ns(P(None, lm_axis, None))),
        mask=jax.device_put(problem.mask, ns(P(None, lm_axis))),
    )
    return state, problem, L
