"""Pose-graph optimization: odometry chain + loop closures on synthetic graphs."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.posegraph import (
    PoseGraph,
    Poses,
    cost,
    edge_residuals,
    optimize_pose_graph,
    relative_pose,
)


def _circle_trajectory(P, radius=5.0):
    """Ground-truth poses on a circle (world->camera)."""
    Rs, ts = [], []
    for k in range(P):
        ang = 2 * np.pi * k / P
        Rwc = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.0, ang], jnp.float32)))
        c = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0])
        # world->camera: R = Rwc^T, t = -R c
        R = Rwc.T
        ts.append(-R @ c)
        Rs.append(R)
    return Poses(
        R=jnp.asarray(np.stack(Rs), jnp.float32),
        t=jnp.asarray(np.stack(ts), jnp.float32),
    )


def _graph_from_gt(gt: Poses, edges, weight=1.0, meas_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    i = jnp.asarray([a for a, _ in edges], jnp.int32)
    j = jnp.asarray([b for _, b in edges], jnp.int32)
    Rz, tz = relative_pose(gt, i, j)
    if meas_noise:
        dw = jnp.asarray(rng.normal(0, meas_noise, (len(edges), 3)), jnp.float32)
        dv = jnp.asarray(rng.normal(0, meas_noise, (len(edges), 3)), jnp.float32)
        dR, dt = se3.exp_se3(jnp.concatenate([dw, dv], -1))
        Rz, tz = se3.compose(dR, dt, Rz, tz)
    P = gt.R.shape[0]
    fixed = np.zeros(P, bool)
    fixed[0] = True
    return PoseGraph(
        i=i, j=j, R_z=Rz, t_z=tz,
        weight=jnp.full(len(edges), weight, jnp.float32),
        fixed=jnp.asarray(fixed),
    )


def _perturb(poses: Poses, scale, seed=1):
    rng = np.random.default_rng(seed)
    P = poses.R.shape[0]
    xi = rng.normal(0, scale, (P, 6)).astype(np.float32)
    xi[0] = 0  # keep the anchor at ground truth
    dR, dt = se3.exp_se3(jnp.asarray(xi))
    R, t = se3.compose(dR, dt, poses.R, poses.t)
    return Poses(R=R, t=t)


def test_zero_cost_at_ground_truth():
    gt = _circle_trajectory(8)
    graph = _graph_from_gt(gt, [(k, (k + 1) % 8) for k in range(8)])
    assert float(cost(gt, graph)) < 1e-9
    r = np.asarray(edge_residuals(gt, graph))
    assert np.abs(r).max() < 1e-4


def test_chain_converges():
    P = 12
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0), (0, P // 2)]
    graph = _graph_from_gt(gt, edges)
    init = _perturb(gt, 0.05)
    opt, stats = jax.jit(
        lambda p, g: optimize_pose_graph(p, g, iterations=15)
    )(init, graph)
    assert float(stats.cost) < 1e-8
    ang = np.asarray(se3.rotation_geodesic(opt.R, gt.R))
    assert ang.max() < 1e-3
    np.testing.assert_allclose(np.asarray(opt.t), np.asarray(gt.t), atol=5e-3)


def test_loop_closure_corrects_drift():
    """Odometry with accumulated drift + one loop closure: the loop edge
    must pull the chain back toward consistency."""
    P = 16
    gt = _circle_trajectory(P)
    odo = [(k, k + 1) for k in range(P - 1)]
    graph_odo = _graph_from_gt(gt, odo, meas_noise=0.02, seed=3)

    # integrate noisy odometry for the initial guess
    Rs = [np.asarray(gt.R[0])]
    ts = [np.asarray(gt.t[0])]
    for e in range(P - 1):
        Rz = np.asarray(graph_odo.R_z[e])
        tz = np.asarray(graph_odo.t_z[e])
        Rs.append(Rz @ Rs[-1])
        ts.append(Rz @ ts[-1] + tz)
    init = Poses(jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)))

    # add exact loop-closure edges
    loops = [(P - 1, 0), (0, P // 2), (P // 4, 3 * P // 4)]
    graph = _graph_from_gt(gt, odo + loops, seed=3)
    # keep odometry measurement noise on odo edges
    graph = graph._replace(
        R_z=jnp.concatenate([graph_odo.R_z, graph.R_z[len(odo):]]),
        t_z=jnp.concatenate([graph_odo.t_z, graph.t_z[len(odo):]]),
        weight=jnp.concatenate(
            [jnp.ones(len(odo)), 10.0 * jnp.ones(len(loops))]
        ),
    )

    err_before = float(jnp.abs(init.t - gt.t).max())
    opt, stats = optimize_pose_graph(init, graph, iterations=20)
    err_after = float(jnp.abs(opt.t - gt.t).max())
    assert err_after < 0.5 * err_before, f"{err_before} -> {err_after}"
    assert float(stats.cost) < float(cost(init, graph))


def test_masked_padding_edges_ignored():
    P = 6
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)]
    graph = _graph_from_gt(gt, edges)
    # append garbage padding edges with weight 0
    pad = 4
    graph = PoseGraph(
        i=jnp.concatenate([graph.i, jnp.zeros(pad, jnp.int32)]),
        j=jnp.concatenate([graph.j, jnp.full((pad,), P - 1, jnp.int32)]),
        R_z=jnp.concatenate([graph.R_z, jnp.stack([jnp.eye(3)] * pad)]),
        t_z=jnp.concatenate([graph.t_z, 100.0 * jnp.ones((pad, 3))]),
        weight=jnp.concatenate([graph.weight, jnp.zeros(pad)]),
        fixed=graph.fixed,
    )
    init = _perturb(gt, 0.03)
    opt, stats = optimize_pose_graph(init, graph, iterations=15)
    assert float(stats.cost) < 1e-8


def test_pcg_solver_matches_dense():
    P = 12
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0), (0, P // 2)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.01, seed=5)
    init = _perturb(gt, 0.04)

    dense, sd = optimize_pose_graph(init, graph, iterations=15, solver="dense")
    pcg, sp = optimize_pose_graph(
        init, graph, iterations=15, solver="pcg", cg_iterations=80
    )
    assert float(sp.cost) < 1.05 * float(sd.cost) + 1e-10
    ang = np.asarray(se3.rotation_geodesic(pcg.R, dense.R))
    assert ang.max() < 1e-3


def test_pose_graph_sharded_matches_single():
    from cvsteer_tpu.parallel import make_mesh
    from cvsteer_tpu.parallel.posegraph_sharded import (
        optimize_pose_graph_sharded,
        place_pose_graph,
    )

    P = 16
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0), (3, 11), (0, 8)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.01, seed=6)
    init = _perturb(gt, 0.04)

    ref, sref = optimize_pose_graph(
        init, graph, iterations=12, solver="pcg", cg_iterations=60
    )

    mesh = make_mesh({"data": 8})
    placed = place_pose_graph(graph, mesh)  # pads 18 -> 24 edges
    out, stats = jax.jit(
        lambda p, g: optimize_pose_graph_sharded(
            p, g, mesh, iterations=12, cg_iterations=60
        )
    )(init, placed)

    assert float(stats.cost) <= 1.05 * float(sref.cost) + 1e-10
    ang = np.asarray(se3.rotation_geodesic(out.R, ref.R))
    assert ang.max() < 2e-3


def test_lane_jacobians_match_autodiff_reference():
    """The lane-layout linearize Jacobians (posegraph._edge_jacobians_lanes)
    must equal per-edge stacked jacfwd of the textbook residual."""
    from cvsteer_tpu.slam.posegraph import _edge_jacobians_lanes

    P = 9
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0), (2, 6)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.05, seed=7)
    poses = _perturb(gt, 0.1, seed=8)

    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    Ji = np.stack([np.stack([np.asarray(x) for x in row]) for row in Ji])
    Jj = np.stack([np.stack([np.asarray(x) for x in row]) for row in Jj])
    r = np.stack([np.asarray(x) for x in r])  # [6, E]

    zeros = jnp.zeros(6, jnp.float32)

    def _edge_residual(Ri, ti, Rj, tj, Rz, tz):
        Rrel, trel = se3.compose(Rj, tj, *se3.invert(Ri, ti))
        Rz_inv, tz_inv = se3.invert(Rz, tz)
        Re, te = se3.compose(Rz_inv, tz_inv, Rrel, trel)
        return jnp.concatenate([se3.log_so3(Re), te], axis=-1)

    def res_of_perturb(xi_i, xi_j, Ri, ti, Rj, tj, Rz, tz):
        dRi, dti = se3.exp_se3(xi_i)
        dRj, dtj = se3.exp_se3(xi_j)
        Ri_n, ti_n = se3.compose(dRi, dti, Ri, ti)
        Rj_n, tj_n = se3.compose(dRj, dtj, Rj, tj)
        return _edge_residual(Ri_n, ti_n, Rj_n, tj_n, Rz, tz)

    def one(Ri, ti, Rj, tj, Rz, tz):
        f = lambda a, b: res_of_perturb(a, b, Ri, ti, Rj, tj, Rz, tz)
        return (
            jax.jacfwd(f, argnums=0)(zeros, zeros),
            jax.jacfwd(f, argnums=1)(zeros, zeros),
            f(zeros, zeros),
        )

    Ji_ref, Jj_ref, r_ref = jax.vmap(one)(
        poses.R[graph.i], poses.t[graph.i],
        poses.R[graph.j], poses.t[graph.j],
        graph.R_z, graph.t_z,
    )
    # reference layout [E, a, k] -> [a, k, E]
    np.testing.assert_allclose(Ji, np.moveaxis(np.asarray(Ji_ref), 0, -1), atol=2e-5)
    np.testing.assert_allclose(Jj, np.moveaxis(np.asarray(Jj_ref), 0, -1), atol=2e-5)
    np.testing.assert_allclose(r, np.asarray(r_ref).T, atol=1e-6)


def test_pcg_factorized_accumulation_matches_onehot(monkeypatch):
    """Large graphs accumulate CG products via the factorized one-hot
    (E x sqrt(P) operands) instead of the full one-hot matmul; force that path
    on a small graph and check it optimizes to the same solution."""
    from cvsteer_tpu.slam import posegraph as pg

    P = 14
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0), (2, 9), (4, 12)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.01, seed=9)
    init = _perturb(gt, 0.04)

    ref, sref = optimize_pose_graph(
        init, graph, iterations=12, solver="pcg", cg_iterations=60
    )
    monkeypatch.setattr(pg, "_ONEHOT_MAX_ENTRIES", 0)
    # distinct shapes would hit the jit cache; clear so the body retraces
    pg.optimize_pose_graph.clear_cache()
    try:
        out, stats = optimize_pose_graph(
            init, graph, iterations=12, solver="pcg", cg_iterations=60
        )
    finally:
        pg.optimize_pose_graph.clear_cache()
    assert float(stats.cost) < 1.05 * float(sref.cost) + 1e-10
    ang = np.asarray(se3.rotation_geodesic(out.R, ref.R))
    assert ang.max() < 1e-3
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), atol=1e-3)


def test_robust_solver_resists_false_closure():
    """A wrong closure edge warps the plain least-squares solution. A
    convex Huber only caps its influence (the warped solution can stay
    cheaper when the bad edge is heavily weighted); the redescending
    Tukey kernel zeroes gross outliers and must stay near ground truth."""
    P = 14
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(0, P // 2)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.005, seed=11)
    # corrupt the closure: point it at a pose 2m off
    t_bad = np.asarray(graph.t_z).copy()
    t_bad[-1] += np.array([2.0, -1.5, 0.7], np.float32)
    graph = graph._replace(
        t_z=jnp.asarray(t_bad),
        weight=jnp.concatenate([jnp.ones(P - 1), jnp.asarray([5.0])]),
    )
    init = _perturb(gt, 0.03)

    plain, _ = optimize_pose_graph(init, graph, iterations=20)
    robust, _ = optimize_pose_graph(
        init, graph, iterations=20, huber_delta=0.1, robust_kernel="tukey"
    )

    err_plain = float(jnp.abs(plain.t - gt.t).max())
    err_robust = float(jnp.abs(robust.t - gt.t).max())
    assert err_robust < 0.2 * err_plain, f"{err_plain:.3f} -> {err_robust:.3f}"
    assert err_robust < 0.15
    # the false edge ends with ~zero influence: its residual stays large
    r = np.linalg.norm(np.asarray(edge_residuals(robust, graph)), axis=1)
    assert r[-1] > 1.0 and r[:-1].max() < 0.1


def test_huber_pcg_matches_dense():
    P = 12
    gt = _circle_trajectory(P)
    edges = [(k, k + 1) for k in range(P - 1)] + [(P - 1, 0)]
    graph = _graph_from_gt(gt, edges, meas_noise=0.01, seed=12)
    init = _perturb(gt, 0.04)
    dense, sd = optimize_pose_graph(
        init, graph, iterations=15, solver="dense", huber_delta=0.05
    )
    pcg, sp = optimize_pose_graph(
        init, graph, iterations=15, solver="pcg", cg_iterations=80,
        huber_delta=0.05,
    )
    assert float(sp.cost) < 1.05 * float(sd.cost) + 1e-10
    np.testing.assert_allclose(np.asarray(pcg.t), np.asarray(dense.t), atol=2e-3)
