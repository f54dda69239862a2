"""Distributed pose-graph optimization: edges sharded over a mesh axis.

BASELINE config 5's pose-graph half (map-block partitioning): each device
owns an E/n slice of the edge list (a map block's constraints); poses are
replicated. The Gauss-Newton system is never materialized — the matrix-free
Jacobi-PCG in slam.posegraph runs with a psum of one [P, 6] vector per CG
iteration as the only per-iteration communication, so scaling efficiency
approaches 1 as edges-per-device grows.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvsteer_tpu.slam.posegraph import PGOStats, PoseGraph, Poses, optimize_pose_graph


def pad_edges(graph: PoseGraph, num_shards: int) -> PoseGraph:
    """Pad the edge list to a shard multiple with weight-0 edges."""
    E = graph.i.shape[0]
    Ep = -(-E // num_shards) * num_shards
    if Ep == E:
        return graph
    pad = Ep - E
    eye = jnp.broadcast_to(jnp.eye(3, dtype=graph.R_z.dtype), (pad, 3, 3))
    return PoseGraph(
        i=jnp.pad(graph.i, (0, pad)),
        j=jnp.pad(graph.j, (0, pad)),
        R_z=jnp.concatenate([graph.R_z, eye]),
        t_z=jnp.pad(graph.t_z, ((0, pad), (0, 0))),
        weight=jnp.pad(graph.weight, (0, pad)),
        fixed=graph.fixed,
    )


def optimize_pose_graph_sharded(
    poses: Poses,
    graph: PoseGraph,
    mesh: Mesh,
    *,
    edge_axis: str = "data",
    iterations: int = 20,
    lam0: float = 1e-6,
    cg_iterations: int = 50,
) -> Tuple[Poses, PGOStats]:
    """Edge-sharded LM-PCG pose-graph optimization over ``mesh``."""
    n = mesh.shape[edge_axis]
    graph = pad_edges(graph, n)
    fixed = graph.fixed

    def local(i, j, R_z, t_z, weight, R, t):
        g = PoseGraph(i=i, j=j, R_z=R_z, t_z=t_z, weight=weight, fixed=fixed)
        return optimize_pose_graph(
            Poses(R, t),
            g,
            iterations=iterations,
            lam0=lam0,
            solver="pcg",
            cg_iterations=cg_iterations,
            axis_name=edge_axis,
        )

    e = P(edge_axis)
    rep = P()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(e, e, P(edge_axis, None, None), P(edge_axis, None), e, rep, rep),
        out_specs=(
            Poses(R=rep, t=rep),
            PGOStats(cost=rep, initial_cost=rep, lambda_final=rep),
        ),
        check_vma=False,
    )
    return fn(graph.i, graph.j, graph.R_z, graph.t_z, graph.weight, poses.R, poses.t)


def place_pose_graph(graph: PoseGraph, mesh: Mesh, edge_axis: str = "data"):
    """Pad + device-put a pose graph with the edge sharding."""
    graph = pad_edges(graph, mesh.shape[edge_axis])
    ns = lambda spec: NamedSharding(mesh, spec)
    return PoseGraph(
        i=jax.device_put(graph.i, ns(P(edge_axis))),
        j=jax.device_put(graph.j, ns(P(edge_axis))),
        R_z=jax.device_put(graph.R_z, ns(P(edge_axis, None, None))),
        t_z=jax.device_put(graph.t_z, ns(P(edge_axis, None))),
        weight=jax.device_put(graph.weight, ns(P(edge_axis))),
        fixed=jax.device_put(graph.fixed, ns(P())),
    )
