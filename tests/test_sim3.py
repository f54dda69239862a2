"""Sim(3) group ops + scale-drift-aware pose graph."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import se3, sim3
from cvsteer_tpu.slam.posegraph_sim3 import (
    Sim3Graph,
    apply_scale_correction,
    cost,
    edge_residuals,
    optimize_pose_graph_sim3,
)
from cvsteer_tpu.slam.sim3 import Sim3


def _rand_sim3(rng, scale_spread=0.3):
    w = jnp.asarray(rng.normal(0, 0.4, 3), jnp.float32)
    return Sim3(
        s=jnp.exp(jnp.asarray(rng.normal(0, scale_spread), jnp.float32)),
        R=se3.exp_so3(w),
        t=jnp.asarray(rng.normal(0, 1, 3), jnp.float32),
    )


def test_sim3_group_axioms(rng):
    a = _rand_sim3(rng)
    b = _rand_sim3(rng)
    X = jnp.asarray(rng.normal(0, 1, (5, 3)), jnp.float32)

    # (a o b)(x) == a(b(x))
    ab = sim3.compose(a, b)
    y1 = jax.vmap(lambda x: sim3.transform(ab, x))(X)
    y2 = jax.vmap(lambda x: sim3.transform(a, sim3.transform(b, x)))(X)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)

    # a o a^-1 == identity
    e = sim3.compose(a, sim3.invert(a))
    np.testing.assert_allclose(float(e.s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e.R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e.t), 0.0, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(0, 0.5, (8, 7)), jnp.float32)
    back = sim3.log(sim3.exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)


def _chain_world(P, rng, scale_drift=0.0):
    """Ground-truth Sim3 poses along a line; optional per-step scale drift."""
    poses = []
    for k in range(P):
        w = jnp.asarray([0.0, 0.05 * k, 0.0], jnp.float32)
        R = se3.exp_so3(w)
        t = jnp.asarray([0.5 * k, 0.0, 0.1 * k], jnp.float32)
        poses.append(Sim3(s=jnp.asarray(1.0), R=R, t=t))
    return Sim3(
        s=jnp.stack([p.s for p in poses]),
        R=jnp.stack([p.R for p in poses]),
        t=jnp.stack([p.t for p in poses]),
    )


def _graph_from(poses: Sim3, edges, weight=1.0):
    ii = jnp.asarray([a for a, _ in edges], jnp.int32)
    jj = jnp.asarray([b for _, b in edges], jnp.int32)

    def rel(i, j):
        Ti = Sim3(poses.s[i], poses.R[i], poses.t[i])
        Tj = Sim3(poses.s[j], poses.R[j], poses.t[j])
        return sim3.compose(Tj, sim3.invert(Ti))

    rels = [rel(int(a), int(b)) for a, b in edges]
    P = poses.s.shape[0]
    fixed = np.zeros(P, bool)
    fixed[0] = True
    return Sim3Graph(
        i=ii,
        j=jj,
        s_z=jnp.stack([r.s for r in rels]),
        R_z=jnp.stack([r.R for r in rels]),
        t_z=jnp.stack([r.t for r in rels]),
        weight=jnp.full(len(edges), weight),
        fixed=jnp.asarray(fixed),
    )


def test_zero_cost_at_ground_truth(rng):
    gt = _chain_world(8, rng)
    graph = _graph_from(gt, [(k, k + 1) for k in range(7)] + [(0, 4)])
    assert float(cost(gt, graph)) < 1e-10


def test_sim3_graph_corrects_scale_drift(rng):
    """Scale-drifted chain + scale-true loop closure: the SE(3) graph cannot
    fix this; the Sim(3) graph must recover both pose and scale."""
    P = 10
    gt = _chain_world(P, rng)
    edges = [(k, k + 1) for k in range(P - 1)] + [(0, P - 1)]
    graph = _graph_from(gt, edges, weight=1.0)

    # initial estimate: growing scale drift + pose noise
    drift = []
    for k in range(P):
        sig = 0.06 * k  # exp(0.54) ~ 1.7x scale error at the end
        xi = np.concatenate([rng.normal(0, 0.02, 3), rng.normal(0, 0.05, 3), [sig]])
        if k == 0:
            xi[:] = 0.0  # the gauge anchor must sit at ground truth
        drift.append(jnp.asarray(xi, jnp.float32))
    init = sim3.compose(sim3.exp(jnp.stack(drift)), gt)

    s_err_before = float(jnp.abs(jnp.log(init.s / gt.s)).max())
    opt, stats = jax.jit(
        lambda p, g: optimize_pose_graph_sim3(p, g, iterations=25)
    )(init, graph)

    assert float(stats.cost) < 1e-6
    s_err_after = float(jnp.abs(jnp.log(opt.s / gt.s)).max())
    assert s_err_before > 0.5  # the test actually injected scale drift
    assert s_err_after < 0.02, f"scale log-err {s_err_after}"
    ang = np.asarray(se3.rotation_geodesic(opt.R, gt.R))
    assert ang.max() < 0.01
    np.testing.assert_allclose(np.asarray(opt.t), np.asarray(gt.t), atol=0.05)


def test_apply_scale_correction(rng):
    X = jnp.asarray(rng.normal(0, 2, (20, 3)), jnp.float32)
    old = _rand_sim3(rng)
    new = _rand_sim3(rng)
    Xc = jax.vmap(lambda x: sim3.transform(old, x))(X)  # camera frame
    X2 = jax.vmap(lambda x: apply_scale_correction(x, old, new))(X)
    Xc2 = jax.vmap(lambda x: sim3.transform(new, x))(X2)
    np.testing.assert_allclose(np.asarray(Xc2), np.asarray(Xc), rtol=1e-4, atol=1e-4)


def test_close_loops_sim3_no_drift_is_stable():
    """On a consistent (drift-free) landmark-bearing state, Sim(3) closures
    must measure scale ratio ~1 and leave poses essentially unchanged."""
    import sys

    sys.path.insert(0, "tests")
    from test_vo import DESC_DIM, K, N_CAP
    from cvsteer_tpu.features.frontend import Features
    from cvsteer_tpu.geometry.camera import pixels_from_normalized
    from cvsteer_tpu.slam.loopclosure import close_loops_sim3
    from cvsteer_tpu.slam.vo import Keyframe, VOConfig, init_vo

    rng = np.random.default_rng(21)
    n_pts = min(200, N_CAP)
    X = rng.uniform([-2, -1.5, -2], [2, 1.5, 2], (n_pts, 3)).astype(np.float32)
    desc = rng.normal(size=(n_pts, DESC_DIM)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    def lookat(c):
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).T.astype(np.float32)
        return R, (-R @ c).astype(np.float32)

    def render_ordered(R, t):
        """Features in world-point order: feature f <-> landmark f."""
        p = X @ R.T + t
        z = p[:, 2]
        uv = p[:, :2] / np.maximum(z[:, None], 1e-6)
        pix = np.asarray(pixels_from_normalized(jnp.asarray(uv), K))
        vis = (z > 0.5) & (np.abs(uv) < 0.6).all(1)
        yx = np.zeros((N_CAP, 2), np.float32)
        dsc = np.zeros((N_CAP, DESC_DIM), np.float32)
        valid = np.zeros(N_CAP, bool)
        yx[:n_pts] = pix + rng.normal(0, 0.1, pix.shape)
        dsc[:n_pts] = desc
        valid[:n_pts] = vis
        return Features(
            yx=jnp.asarray(yx), score=jnp.asarray(valid, jnp.float32),
            theta=jnp.zeros(N_CAP), level=jnp.zeros(N_CAP, jnp.int32),
            desc=jnp.asarray(dsc), valid=jnp.asarray(valid),
        )

    state = init_vo(VOConfig(intrinsics=K))
    P = 10
    for k in range(P):
        a = 2 * np.pi * (k % (P - 1)) / (P - 1)  # last pose revisits start
        R, t = lookat(np.array([6 * np.sin(a), 0.0, -6 * np.cos(a)]))
        lm_ids = np.arange(N_CAP, dtype=np.int64)
        lm_ids[n_pts:] = -1
        state.keyframes.append(
            Keyframe(index=k, features=render_ordered(R, t), R=R, t=t,
                     landmark_ids=lm_ids)
        )
    state.initialized = True
    state.frame_count = P
    state.landmarks[:n_pts] = X
    state.landmark_valid[:n_pts] = True
    state.num_landmarks = n_pts

    R_before = [kf.R.copy() for kf in state.keyframes]
    t_before = [kf.t.copy() for kf in state.keyframes]
    used = close_loops_sim3(state, min_gap=6, min_inliers=20)
    assert used >= 1

    for kf, R0, t0 in zip(state.keyframes, R_before, t_before):
        ang = float(se3.rotation_geodesic(jnp.asarray(kf.R), jnp.asarray(R0)))
        assert ang < 0.02, f"pose rotated by {ang} with no drift"
        assert np.linalg.norm(kf.t - t0) < 0.1
    # landmarks stay where they were (scale ~1)
    assert np.abs(state.landmarks[:n_pts] - X).max() < 0.2


def test_sim3_closure_edge_measures_scale_drift():
    """Edge construction algebra: with keyframe j's local map at twice
    metric scale (lambda_j = 2, lambda_i = 1), the measured edge must be
    s_z = 2 and t_z = 2 * t_metric — the regression the no-drift test
    cannot see (an inverted ratio passes when s_i == s_j)."""
    import sys

    sys.path.insert(0, "tests")
    from types import SimpleNamespace

    from test_vo import DESC_DIM, K, N_CAP
    from cvsteer_tpu.features.frontend import Features
    from cvsteer_tpu.slam.loopclosure import LoopClosure, sim3_closure_edge
    from cvsteer_tpu.slam.vo import Keyframe, VOConfig, init_vo

    rng = np.random.default_rng(31)
    n_half = 40
    X_i = rng.uniform([-2, -2, 6], [2, 2, 12], (n_half, 3)).astype(np.float32)
    X_j = rng.uniform([-2, -2, 6], [2, 2, 12], (n_half, 3)).astype(np.float32)

    # metric poses
    R_i = np.eye(3, dtype=np.float32)
    t_i = np.zeros(3, np.float32)
    R_rel = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.1, 0.0], jnp.float32)))
    B = 0.8  # metric baseline
    t_rel_metric = (B * np.array([1.0, 0.0, 0.2]) / np.linalg.norm([1.0, 0.0, 0.2])).astype(np.float32)
    R_j = (R_rel @ R_i).astype(np.float32)
    t_j_metric = (R_rel @ t_i + t_rel_metric).astype(np.float32)

    lam = 2.0  # keyframe j's local map scale error

    def dummy_features():
        return Features(
            yx=jnp.zeros((N_CAP, 2)), score=jnp.zeros(N_CAP),
            theta=jnp.zeros(N_CAP), level=jnp.zeros(N_CAP, jnp.int32),
            desc=jnp.zeros((N_CAP, DESC_DIM)), valid=jnp.ones(N_CAP, bool),
        )

    state = init_vo(VOConfig(intrinsics=K))
    ids_i = np.full(N_CAP, -1, np.int64)
    ids_i[:n_half] = np.arange(n_half)
    ids_j = np.full(N_CAP, -1, np.int64)
    ids_j[:n_half] = np.arange(n_half, 2 * n_half)
    state.keyframes.append(
        Keyframe(index=0, features=dummy_features(), R=R_i, t=t_i, landmark_ids=ids_i)
    )
    state.keyframes.append(
        Keyframe(
            index=1, features=dummy_features(),
            R=R_j, t=(lam * t_j_metric).astype(np.float32),  # map-unit pose
            landmark_ids=ids_j,
        )
    )
    state.landmarks[:n_half] = X_i  # i's map: metric
    state.landmarks[n_half : 2 * n_half] = lam * X_j  # j's map: 2x metric
    state.landmark_valid[: 2 * n_half] = True
    state.num_landmarks = 2 * n_half
    state.initialized = True

    # exact unit-baseline two-view result of the metric geometry
    tri = (np.concatenate([X_i, X_j]) @ R_i.T + t_i) / B  # camera-i frame / B
    res = SimpleNamespace(
        R=R_rel,
        t=(t_rel_metric / B).astype(np.float32),  # unit translation
        points=tri.astype(np.float32),
        point_valid=np.ones(2 * n_half, bool),
    )
    c = LoopClosure(i=0, j=1, R=R_rel, t=res.t, num_inliers=80, result=res)

    edge = sim3_closure_edge(state, c)
    assert edge is not None
    s_z, R_z, t_z = edge
    assert abs(s_z - lam) < 0.05, f"s_z {s_z} != {lam}"
    np.testing.assert_allclose(R_z, R_rel, atol=1e-6)
    # t_z = s_j * t_unit = lam * B * t_unit = lam * t_metric
    np.testing.assert_allclose(t_z, lam * t_rel_metric, rtol=0.05)


def test_lane_jacobians_match_autodiff_reference():
    """posegraph_sim3._edge_jacobians_lanes vs per-edge stacked jacfwd of
    the textbook Sim(3) residual (the pre-lane implementation)."""
    import jax

    from cvsteer_tpu.slam import sim3
    from cvsteer_tpu.slam.posegraph_sim3 import _edge_jacobians_lanes

    rng = np.random.default_rng(11)
    P, E = 7, 12
    w = rng.normal(0, 0.4, (P, 3)).astype(np.float32)
    R = np.asarray(jax.vmap(se3.exp_so3)(jnp.asarray(w)))
    poses = Sim3(
        s=jnp.asarray(np.exp(rng.normal(0, 0.2, P)).astype(np.float32)),
        R=jnp.asarray(R),
        t=jnp.asarray(rng.normal(0, 1.0, (P, 3)).astype(np.float32)),
    )
    i = jnp.asarray(rng.integers(0, P, E), jnp.int32)
    j = jnp.asarray((np.asarray(rng.integers(0, P, E)) + 1) % P, jnp.int32)
    wz = rng.normal(0, 0.3, (E, 3)).astype(np.float32)
    graph = Sim3Graph(
        i=i, j=j,
        s_z=jnp.asarray(np.exp(rng.normal(0, 0.2, E)).astype(np.float32)),
        R_z=jnp.asarray(np.asarray(jax.vmap(se3.exp_so3)(jnp.asarray(wz)))),
        t_z=jnp.asarray(rng.normal(0, 1.0, (E, 3)).astype(np.float32)),
        weight=jnp.ones(E),
        fixed=jnp.asarray(np.arange(P) == 0),
    )

    Ji, Jj, r = _edge_jacobians_lanes(poses, graph)
    Ji = np.stack([np.stack([np.asarray(x) for x in row]) for row in Ji])
    Jj = np.stack([np.stack([np.asarray(x) for x in row]) for row in Jj])
    r = np.stack([np.asarray(x) for x in r])  # [7, E]

    zeros = jnp.zeros(7, jnp.float32)

    def _edge_residual(Ti, Tj, Z):
        rel = sim3.compose(Tj, sim3.invert(Ti))
        return sim3.log(sim3.compose(sim3.invert(Z), rel))

    def one(si, Ri, ti, sj, Rj, tj, sz, Rz, tz):
        def f(a, b):
            Ti = sim3.compose(sim3.exp(a), Sim3(si, Ri, ti))
            Tj = sim3.compose(sim3.exp(b), Sim3(sj, Rj, tj))
            return _edge_residual(Ti, Tj, Sim3(sz, Rz, tz))

        return (
            jax.jacfwd(f, argnums=0)(zeros, zeros),
            jax.jacfwd(f, argnums=1)(zeros, zeros),
            f(zeros, zeros),
        )

    Ji_ref, Jj_ref, r_ref = jax.vmap(one)(
        poses.s[graph.i], poses.R[graph.i], poses.t[graph.i],
        poses.s[graph.j], poses.R[graph.j], poses.t[graph.j],
        graph.s_z, graph.R_z, graph.t_z,
    )
    np.testing.assert_allclose(Ji, np.moveaxis(np.asarray(Ji_ref), 0, -1), atol=3e-5)
    np.testing.assert_allclose(Jj, np.moveaxis(np.asarray(Jj_ref), 0, -1), atol=3e-5)
    np.testing.assert_allclose(r, np.asarray(r_ref).T, atol=1e-5)


def test_sim3_pcg_solver_matches_dense(rng):
    """The matrix-free Jacobi-PCG Sim(3) solver (campaign-scale closure
    events; the dense [7P, 7P] Cholesky is cubic in P) must reproduce the
    dense solution on a drifted chain + loop."""
    P = 24
    gt = _chain_world(P, rng)
    edges = [(k, k + 1) for k in range(P - 1)] + [(0, P - 1), (3, 17)]
    graph = _graph_from(gt, edges, weight=1.0)
    drift = []
    for k in range(P):
        xi = np.concatenate(
            [rng.normal(0, 0.02, 3), rng.normal(0, 0.04, 3), [0.03 * k]]
        )
        if k == 0:
            xi[:] = 0.0
        drift.append(jnp.asarray(xi, jnp.float32))
    init = sim3.compose(sim3.exp(jnp.stack(drift)), gt)

    dense, sd = optimize_pose_graph_sim3(
        init, graph, iterations=20, solver="dense"
    )
    pcg, sp = optimize_pose_graph_sim3(
        init, graph, iterations=20, solver="pcg", cg_iterations=100
    )
    assert float(sp.cost) < 1.05 * float(sd.cost) + 1e-9
    ang = np.asarray(se3.rotation_geodesic(pcg.R, dense.R))
    assert ang.max() < 2e-3
    np.testing.assert_allclose(
        np.asarray(pcg.s), np.asarray(dense.s), rtol=5e-3
    )
