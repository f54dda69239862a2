"""Lane-layout Lie math (slam.lie_lanes) vs the stacked se3 reference."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import lie_lanes as ll
from cvsteer_tpu.slam import se3


def _rand_w(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(0, scale, (n, 3)), jnp.float32)


def test_exp_so3_matches_se3():
    rng = np.random.default_rng(0)
    w = _rand_w(rng, 64)
    R_ref = np.asarray(se3.exp_so3(w))
    R_lane = ll.stack_mat(ll.exp_so3([w[:, k] for k in range(3)]))
    np.testing.assert_allclose(np.asarray(R_lane), R_ref, atol=1e-6)


def test_exp_se3_matches_se3():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.8, (64, 6)), jnp.float32)
    R_ref, t_ref = se3.exp_se3(xi)
    R, t = ll.exp_se3([xi[:, k] for k in range(6)])
    np.testing.assert_allclose(np.asarray(ll.stack_mat(R)), np.asarray(R_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ll.stack_vec(t)), np.asarray(t_ref), atol=1e-6)


def test_log_so3_matches_se3_including_near_pi():
    rng = np.random.default_rng(2)
    # generic angles + tiny + near-pi axes
    w = np.concatenate(
        [
            rng.normal(0, 1.0, (48, 3)),
            rng.normal(0, 1e-6, (8, 3)),
            (np.pi - 1e-5)
            * rng.normal(0, 1, (8, 3))
            / np.linalg.norm(rng.normal(0, 1, (8, 3)), axis=1, keepdims=True),
        ]
    ).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    ref = np.asarray(se3.log_so3(R))
    lane = ll.stack_vec(ll.log_so3(ll.mat_lanes(R)))
    np.testing.assert_allclose(np.asarray(lane), ref, atol=1e-5)


def test_matmul_matvec_transpose():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(32, 3, 3)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(32, 3, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    Al, Bl, vl = ll.mat_lanes(A), ll.mat_lanes(B), ll.vec_lanes(v)
    np.testing.assert_allclose(
        np.asarray(ll.stack_mat(ll.matmul(Al, Bl))), np.asarray(A @ B), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ll.stack_vec(ll.matvec(Al, vl))),
        np.asarray((A @ v[..., None])[..., 0]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ll.stack_mat(ll.transpose(Al))),
        np.asarray(jnp.swapaxes(A, -1, -2)),
        atol=0,
    )


def test_onehot_gather_scatter_roundtrip():
    rng = np.random.default_rng(4)
    P, E = 11, 40
    idx = jnp.asarray(rng.integers(0, P, E), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
    S = ll.onehot(idx, P)
    # scatter-add via matmul == np.add.at
    out = np.zeros(P, np.float32)
    np.add.at(out, np.asarray(idx), np.asarray(vals))
    np.testing.assert_allclose(np.asarray(vals @ S), out, atol=1e-5)
    # gather via matmul == indexing (exact: one nonzero per row)
    v = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(S @ v), np.asarray(v)[np.asarray(idx)], atol=0
    )


def test_pad_pose_graph_preserves_cost_and_residuals():
    """Bucket padding (slam.loopclosure._pad_pose_graph) must not change
    the optimization problem: identical cost, residuals on real edges,
    and identical optimized poses on the real prefix."""
    from cvsteer_tpu.slam.loopclosure import _pad_pose_graph
    from cvsteer_tpu.slam.posegraph import (
        PoseGraph,
        Poses,
        cost,
        edge_residuals,
        optimize_pose_graph,
    )

    rng = np.random.default_rng(5)
    P, E = 11, 13
    w = _rand_w(rng, P, 0.3)
    R = se3.exp_so3(w)
    t = jnp.asarray(rng.normal(0, 1, (P, 3)), jnp.float32)
    ii = jnp.asarray(list(range(P - 1)) + [0, 3, 2], jnp.int32)
    jj = jnp.asarray(list(range(1, P)) + [P - 1, 8, 7], jnp.int32)
    Rz, tz = se3.compose(R[jj], t[jj], *se3.invert(R[ii], t[ii]))
    graph = PoseGraph(
        i=ii, j=jj, R_z=Rz, t_z=tz,
        weight=jnp.ones(E), fixed=jnp.asarray(np.arange(P) == 0),
    )
    dw = _rand_w(rng, P, 0.05)
    poses = Poses(R=se3.exp_so3(dw) @ R, t=t + 0.03)

    pposes, pgraph, P_real = _pad_pose_graph(poses, graph)
    assert P_real == P
    assert pgraph.i.shape[0] == 16 and pgraph.fixed.shape[0] == 16

    np.testing.assert_allclose(
        float(cost(pposes, pgraph)), float(cost(poses, graph)), rtol=1e-6
    )
    r = np.asarray(edge_residuals(pposes, pgraph))[:E]
    np.testing.assert_allclose(r, np.asarray(edge_residuals(poses, graph)), atol=1e-6)

    opt_ref, _ = optimize_pose_graph(poses, graph, iterations=8)
    opt_pad, _ = optimize_pose_graph(pposes, pgraph, iterations=8)
    np.testing.assert_allclose(
        np.asarray(opt_pad.R)[:P], np.asarray(opt_ref.R), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(opt_pad.t)[:P], np.asarray(opt_ref.t), atol=1e-5
    )
