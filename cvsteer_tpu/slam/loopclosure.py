"""Loop-closure detection and pose-graph correction for VO.

Completes the SLAM loop (BASELINE config 5): candidate keyframes are found
by global descriptor similarity (mean phase descriptor per keyframe — a
tiny bag-of-features signature), verified geometrically with the two-view
RANSAC pipeline, and accepted closures become pose-graph edges. The graph
(odometry chain + closures) is optimized with slam.posegraph and the
corrected keyframe poses written back.

Scale note: a monocular closure edge's translation has unknown scale; the
relative translation is rescaled to match the current pose estimates'
baseline norm, so the closure corrects drift in direction/rotation while
staying consistent with the map's gauge.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cvsteer_tpu.slam.posegraph import (
    PoseGraph,
    Poses,
    edge_residuals,
    optimize_pose_graph,
)
from cvsteer_tpu.slam.twoview import two_view_pose_from_features
from cvsteer_tpu.slam.vo import VOState

# Signatures are pure functions of a keyframe's immutable features and are
# cached on the Keyframe object itself (Keyframe.signature) so the cache's
# lifetime is tied to the owning keyframe — no global dict to leak or to
# serve stale entries after id() reuse.


class LoopClosure(NamedTuple):
    i: int  # older keyframe index (into state.keyframes)
    j: int  # newer keyframe index
    R: np.ndarray  # relative rotation camera-i -> camera-j
    t: np.ndarray  # relative translation, rescaled to trajectory units
    num_inliers: int
    result: object = None  # the verifying TwoViewResult (unit-baseline pose)


def keyframe_signature(features) -> np.ndarray:
    """Global descriptor: mean of valid local descriptors, L2-normalized."""
    desc = np.asarray(features.desc)
    valid = np.asarray(features.valid)
    if valid.sum() == 0:
        return np.zeros(desc.shape[-1], np.float32)
    sig = desc[valid].mean(axis=0)
    n = np.linalg.norm(sig)
    return (sig / n if n > 1e-9 else sig).astype(np.float32)


import functools


from cvsteer_tpu.slam.vo_core import closure_candidates, signature_device


@jax.jit
def _sig_row_jit(desc, valid):
    return signature_device(desc, valid)


@jax.jit
def _sig_set_row_jit(sigs, row, k):
    return sigs.at[k].set(row, mode="drop")


@functools.partial(jax.jit, static_argnames=("top",))
def _sig_query_jit(sigs, desc, valid, j, min_gap, top):
    """One-dispatch candidate query for keyframe index ``j`` (the shared
    rule vo_core.closure_candidates; caller fetches the two [top] outputs)."""
    return closure_candidates(
        sigs, signature_device(desc, valid), j, min_gap=min_gap, top=top
    )


class SignatureIndex:
    """Device-resident keyframe signature index for closure detection.

    Replaces the round-3 host-numpy scan (VERDICT r3 item 3): signatures
    live in one ``[capacity, D]`` device array, new keyframes are added by
    an in-place row scatter (no fetch), and detection is one
    ``[K, D] @ [D]`` matvec + top-k — one dispatch + one ~24-byte fetch,
    cost independent of the keyframe count. Keyframes beyond ``capacity``
    are not indexed (detection still runs against the first ``capacity``).

    NOTE the standalone :meth:`query` still pays one tunnel RTT (~25 ms
    measured); the device engine avoids even that by computing the same
    candidates INSIDE the per-frame fused step (slam.vo_device carries the
    store in DeviceMap and returns candidates in StepOut).
    """

    def __init__(self, dim: int, capacity: int = 4096):
        self.capacity = int(capacity)
        self.sigs = jnp.zeros((self.capacity, dim), jnp.float32)
        self.n = 0  # keyframes indexed so far (== next row)

    def extend(self, keyframes) -> None:
        """Index ``keyframes[self.n:]`` (one tiny dispatch per new row).

        Keyframes beyond ``capacity`` are NOT indexed (the scatter drops
        out-of-range rows): detection keeps working against the first
        ``capacity`` keyframes, so loops onto EARLY map regions still
        close, but revisits of late regions are silently undetectable —
        warn LOUDLY once when the run crosses the cliff (policy: raise
        VOConfig.loop_sig_capacity for full-sequence detection; memory is
        capacity x D x 4 bytes — 4096 x 48 = 768 KB)."""
        if len(keyframes) > self.capacity and self.n <= self.capacity:
            import warnings

            warnings.warn(
                f"SignatureIndex full: {len(keyframes)} keyframes > "
                f"capacity {self.capacity}; keyframes beyond capacity are "
                "not indexed for closure detection (loops onto them will "
                "not be found). Raise VOConfig.loop_sig_capacity.",
                RuntimeWarning,
                stacklevel=3,
            )
        for k in range(self.n, len(keyframes)):
            f = keyframes[k].features
            self.sigs = _sig_set_row_jit(
                self.sigs, _sig_row_jit(f.desc, f.valid), jnp.int32(k)
            )
        self.n = len(keyframes)

    def query(self, features, *, min_gap: int, top: int):
        """(idx [top], score [top]) numpy — newest keyframe (row n-1)
        against rows [0, (n-1) - min_gap]. Rows beyond that carry -inf."""
        idx, score = jax.device_get(
            _sig_query_jit(
                self.sigs, features.desc, features.valid,
                jnp.int32(self.n - 1), jnp.int32(min_gap), top=top,
            )
        )
        return np.asarray(idx), np.asarray(score)


def state_signature_index(state: VOState) -> SignatureIndex:
    """The state's lazily built+extended signature index."""
    idx = getattr(state, "sig_index", None)
    if idx is None:
        D = int(state.keyframes[-1].features.desc.shape[-1])
        cap = getattr(state.config, "loop_sig_capacity", 4096)
        idx = SignatureIndex(D, capacity=cap)
        state.sig_index = idx
    idx.extend(state.keyframes)
    return idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "intrinsics", "match_ratio", "ransac_hypotheses",
        "ransac_threshold_px",
    ),
)
def _verify_candidates_jit(
    fa_stack, fb, key, *, intrinsics, match_ratio, ransac_hypotheses,
    ransac_threshold_px,
):
    """Geometric verification of M closure candidates in ONE dispatch.

    ``fa_stack``: Features with a leading candidate axis [M, ...]; ``fb``
    the newest keyframe's features. ``intrinsics`` is static (a hashable
    NamedTuple of floats, preserving the distortion branch). The round-2
    path verified candidates sequentially — one full dispatch + fetch RTT
    per candidate, ~3 RTTs per closure event through the tunnel; vmapping
    the identical fixed-shape pipeline makes the event cost
    candidate-count-independent (measured in bench.bench_closure_event).
    """

    def one(fa, k):
        return two_view_pose_from_features(
            fa, fb, intrinsics,
            match_ratio=match_ratio,
            ransac_hypotheses=ransac_hypotheses,
            ransac_threshold_px=ransac_threshold_px,
            key=k,
        )

    keys = jax.random.split(key, fa_stack.yx.shape[0])
    return jax.vmap(one)(fa_stack, keys)


#: keyframes per closure-gate REGION bucket (closure_gate / the rejection
#: cooldown): candidates within the same bucket count as the same place
GATE_REGION_KF = 8


def closure_gate(
    state: VOState, cand_idx, scores, *, min_gap: int, threshold: float
) -> bool:
    """Cheap pre-event gate: should this promotion PAY a closure event?

    Runs on already-fetched candidate arrays (no device work) BEFORE the
    expensive part — the device engine's state sync and the vmapped
    geometric verification. Three rules:

    1. threshold + separation: at least one candidate must clear the
       signature-cosine threshold at ``min_gap`` keyframes of separation
       (the round-4 rule);
    2. temporal consistency (VOConfig.loop_consistency): the top
       candidate must point at the same map region (GATE_REGION_KF
       buckets) for N consecutive promotions — single-promotion hits on
       self-similar texture are overwhelmingly geometry-rejected
       (measured city loop: ~700 ms of rejected verification on nearly
       every promotion);
    3. rejection cooldown (VOConfig.loop_reject_cooldown): a region
       whose verification just failed is not re-verified for M keyframes.

    Mutates state.loop_streak; the caller owning verification updates
    state.loop_reject_until on rejection (find_loop_closures does)."""
    j = len(state.keyframes) - 1
    cand = [
        int(i) for i, s in zip(cand_idx, scores)
        if s >= threshold and 0 <= i <= j - min_gap
    ]
    if not cand:
        state.loop_streak = (-1, 0)
        return False
    region = cand[0] // GATE_REGION_KF
    last, streak = state.loop_streak
    streak = streak + 1 if region == last else 1
    state.loop_streak = (region, streak)
    if streak < getattr(state.config, "loop_consistency", 1):
        return False
    if j <= state.loop_reject_until.get(region, -1):
        return False
    return True


def find_loop_closures(
    state: VOState,
    *,
    min_gap: int = 6,
    signature_threshold: float = 0.75,
    min_inliers: int = 25,
    max_candidates: int = 3,
    key: Optional[jax.Array] = None,
    candidates=None,
) -> List[LoopClosure]:
    """Detect verified closures between the newest keyframe and older ones.

    ``min_gap`` keyframes of separation avoids trivial neighbors; candidate
    ranking by signature cosine (a loose prefilter — the geometric
    verification below is the real gate); verification of all surviving
    candidates via ONE vmapped two-view dispatch (_verify_candidates_jit).

    Detection is device-resident (round 4): ``candidates`` — (idx, score)
    arrays — normally arrive PRE-COMPUTED from the device engine's fused
    per-frame step (slam.vo_device carries the signature store in
    DeviceMap, so detection rides a dispatch that happens anyway: zero
    marginal round-trips, cost independent of the keyframe count). Without
    them, the state's :class:`SignatureIndex` answers in one dispatch +
    one ~24-byte fetch — the round-3 host-numpy scan (and its per-keyframe
    descriptor fetches) is gone.
    """
    kfs = state.keyframes
    j = len(kfs) - 1
    if j < min_gap:
        return []
    if key is None:
        key = jax.random.key(j)

    if candidates is None:
        index = state_signature_index(state)
        cand_idx, scores = index.query(
            kfs[j].features, min_gap=min_gap, top=max_candidates
        )
        # the device engine gates BEFORE its state sync (vo_device
        # .complete calls closure_gate on the in-step candidates and only
        # then enters the event); the host path gates here, before the
        # verification dispatch
        if not closure_gate(
            state, cand_idx, scores,
            min_gap=min_gap, threshold=signature_threshold,
        ):
            return []
    else:
        cand_idx, scores = (np.asarray(a) for a in candidates)

    cand = [
        int(i) for i, s in zip(cand_idx[:max_candidates], scores)
        if s >= signature_threshold and 0 <= i <= j - min_gap
    ]
    if not cand:
        return []

    K = state.config.intrinsics
    # same inlier criterion as the rest of the VO pipeline
    thresh_px = ransac_threshold_px(state)
    # pad to a fixed batch (repeat slot 0): one compiled shape per
    # max_candidates value instead of one per surviving-candidate count
    n_real = len(cand)
    cand_pad = cand + [cand[0]] * (max_candidates - n_real)
    fa_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[kfs[i].features for i in cand_pad]
    )
    batched = _verify_candidates_jit(
        fa_stack, kfs[j].features, key,
        intrinsics=K,
        match_ratio=state.config.match_ratio,
        ransac_hypotheses=state.config.ransac_hypotheses,
        ransac_threshold_px=round(float(thresh_px), 6),
    )
    batched = jax.tree.map(np.asarray, batched)  # ONE fetch for all M

    closures: List[LoopClosure] = []
    for m, i in enumerate(cand[:n_real]):
        res = jax.tree.map(lambda x: x[m], batched)
        n_inl = int(res.num_inliers)
        if n_inl < min_inliers:
            continue
        t = np.asarray(res.t) * _closure_scale(state, i, res)
        closures.append(
            LoopClosure(
                i=i, j=j, R=np.asarray(res.R), t=t, num_inliers=n_inl, result=res
            )
        )
    if not closures:
        cd = getattr(state.config, "loop_reject_cooldown", 0)
        if cd:
            for i in set(c // GATE_REGION_KF for c in cand[:n_real]):
                state.loop_reject_until[i] = j + cd
    return closures


def ransac_threshold_px(state: VOState) -> float:
    """The configured Sampson threshold (normalized units) in pixels."""
    K = state.config.intrinsics
    return float(np.sqrt(state.config.ransac_threshold)) * 0.5 * (K.fx + K.fy)


def _side_scale(state: VOState, k: int, depths_tri: np.ndarray) -> Optional[float]:
    """Scale of keyframe k's local map relative to the closure's
    unit-baseline triangulation: median(map depth) / median(tri depth)."""
    kf = state.keyframes[k]
    lm = kf.landmark_ids[kf.landmark_ids >= 0]
    if lm.size < 10 or depths_tri.size < 10:
        return None
    Xw = state.landmarks[lm]
    d_map = (Xw @ kf.R.T + kf.t)[:, 2]
    d_map = d_map[d_map > 1e-3]
    d_tri = depths_tri[depths_tri > 1e-6]
    if d_map.size < 10 or d_tri.size < 10:
        return None
    return float(np.median(d_map) / np.median(d_tri))


def closure_scales(
    state: VOState, c_i: int, c_j: int, res
) -> Tuple[Optional[float], Optional[float]]:
    """(s_i, s_j): each keyframe's local-map scale w.r.t. the closure's
    unit-baseline triangulation. Their ratio s_j / s_i is the relative
    scale drift a Sim(3) closure edge constrains; equality means no drift."""
    tri = np.asarray(res.points)[np.asarray(res.point_valid)]
    if tri.shape[0] < 10:
        return None, None
    s_i = _side_scale(state, c_i, tri[:, 2])
    # the same points seen from camera j: X_j = R X_i + t (unit baseline)
    tri_j = tri @ np.asarray(res.R).T + np.asarray(res.t)
    s_j = _side_scale(state, c_j, tri_j[:, 2])
    return s_i, s_j


def sim3_closure_edge(state: VOState, c: LoopClosure):
    """The Sim(3) edge (s_z, R_z, t_z) a verified closure contributes.

    Derivation (map-unit coordinates, X^map = lambda * X^metric with
    lambda_k keyframe k's local scale): the metric relation
    X_j = R X_i + B t_unit becomes
    X_j^map = (lambda_j/lambda_i) R X_i^map + lambda_j B t_unit.
    With s_k = _side_scale = lambda_k * B, the measured i->j similarity is

        s_z = s_j / s_i,   R_z = R,   t_z = s_j * t_unit.

    Returns None when either side lacks landmark depth support.
    """
    res = c.result
    if res is None:
        return None
    s_i, s_j = closure_scales(state, c.i, c.j, res)
    if s_j is None or s_j <= 0:
        return None
    if s_i is None or s_i <= 0:
        # the OLDER side lost its landmark links: slot reuse invalidates
        # out-of-window observation tables over long runs (sync stamps
        # stale generations to -1), so lap-1 keyframes eventually carry
        # no depth support — the r5 campaign rejected every revisit
        # closure at this stage. The newer side still anchors the metric
        # baseline; relative scale 1 is the right prior (exact under an
        # active ground prior, unbiased otherwise).
        return 1.0, np.asarray(res.R), np.asarray(res.t) * s_j
    s_z = s_j / s_i
    lo, hi = getattr(state.config, "loop_scale_band", (0.5, 2.0))
    if lo > 0 and not (lo <= s_z <= hi):
        # implausible measured relative scale: the old side's depth
        # support mixes epochs (its pose is frozen at-time while the
        # landmarks kept moving under ground/BA corrections), and a
        # near-zero-baseline revisit triangulates at noise depths. The
        # r5 campaign measured s_z down to 0.009 on TRUE revisits; the
        # solver satisfied the edge by warping the map (d_center 139 m,
        # node scales 0.14-15.7). Discard the measurement for the
        # unit-scale prior, as in the no-support branch above.
        from cvsteer_tpu.slam.vo import _diag

        _diag(state, ev="closure_edge_clamp", s_z=round(float(s_z), 4))
        s_z = 1.0
    return s_z, np.asarray(res.R), np.asarray(res.t) * s_j


def _closure_scale(state: VOState, i: int, res) -> float:
    """Metric scale of a closure's unit translation.

    Preferred: ratio of the map's median landmark depth in keyframe i to
    the median depth of the closure's own triangulated points (which live
    at ||t||=1 scale). Fallback when keyframe i carries no landmarks: the
    current pose estimates' baseline (biased by exactly the drift being
    corrected, but the only signal available)."""
    kf = state.keyframes[i]
    lm = kf.landmark_ids[kf.landmark_ids >= 0]
    tri = np.asarray(res.points)[np.asarray(res.point_valid)]
    if lm.size >= 10 and tri.shape[0] >= 10:
        Xw = state.landmarks[lm]
        depth_map = (Xw @ kf.R.T + kf.t)[:, 2]
        depth_map = depth_map[depth_map > 1e-3]
        depth_tri = tri[:, 2]
        depth_tri = depth_tri[depth_tri > 1e-6]
        if depth_map.size >= 10 and depth_tri.size >= 10:
            return float(np.median(depth_map) / np.median(depth_tri))
    ci = -kf.R.T @ kf.t
    kj = state.keyframes[-1]
    cj = -kj.R.T @ kj.t
    return max(float(np.linalg.norm(cj - ci)), 1e-6)


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_pose_graph(poses, graph) -> Tuple[object, object, int]:
    """Pad poses/edges to power-of-two buckets (compile-once shapes).

    The jitted optimizer retraces per (P, E) shape; over a long run every
    new keyframe or closure count would otherwise recompile (seconds per
    shape). Padding poses are fixed identities touched by no edge (the
    gauge mask gives them exact identity rows); padding edges are
    weight-0 identity self-loops at pose 0 (zero residual, masked).

    Handles both (Poses, PoseGraph) and (Sim3, Sim3Graph) — the Sim(3)
    variants carry the extra unit-scale fields ``s`` / ``s_z``.
    Returns (poses, graph, P_real).
    """
    P = poses.R.shape[0]
    E = graph.i.shape[0]
    Pp, Ep = _bucket(P), _bucket(E)
    if Pp == P and Ep == E:
        return poses, graph, P
    pp, ep = Pp - P, Ep - E
    eyeP = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (pp, 3, 3)))
    eyeE = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (ep, 3, 3)))
    pkw = dict(
        R=jnp.concatenate([poses.R, eyeP]),
        t=jnp.concatenate([poses.t, jnp.zeros((pp, 3), jnp.float32)]),
    )
    if hasattr(poses, "s"):
        pkw["s"] = jnp.concatenate([poses.s, jnp.ones(pp, poses.s.dtype)])
    gkw = dict(
        i=jnp.concatenate([graph.i, jnp.zeros(ep, graph.i.dtype)]),
        j=jnp.concatenate([graph.j, jnp.zeros(ep, graph.j.dtype)]),
        R_z=jnp.concatenate([graph.R_z, eyeE]),
        t_z=jnp.concatenate([graph.t_z, jnp.zeros((ep, 3), jnp.float32)]),
        weight=jnp.concatenate([graph.weight, jnp.zeros(ep, jnp.float32)]),
        fixed=jnp.concatenate([graph.fixed, jnp.ones(pp, bool)]),
    )
    if hasattr(graph, "s_z"):
        gkw["s_z"] = jnp.concatenate([graph.s_z, jnp.ones(ep, jnp.float32)])
    return type(poses)(**pkw), type(graph)(**gkw), P


def build_keyframe_graph(
    state: VOState,
    closures: List[LoopClosure],
    *,
    closure_weight: float = 5.0,
) -> Tuple[Poses, PoseGraph]:
    """Odometry chain (from current keyframe poses) + closure edges."""
    kfs = state.keyframes
    P = len(kfs)
    poses = Poses(
        R=jnp.asarray(np.stack([kf.R for kf in kfs])),
        t=jnp.asarray(np.stack([kf.t for kf in kfs])),
    )

    ii, jj, Rz, tz, w = [], [], [], [], []
    for k in range(P - 1):
        Rrel = kfs[k + 1].R @ kfs[k].R.T
        trel = kfs[k + 1].t - Rrel @ kfs[k].t
        ii.append(k)
        jj.append(k + 1)
        Rz.append(Rrel)
        tz.append(trel)
        w.append(1.0)
    for c in closures:
        ii.append(c.i)
        jj.append(c.j)
        Rz.append(c.R)
        tz.append(c.t)
        w.append(closure_weight)

    fixed = np.zeros(P, bool)
    fixed[0] = True
    graph = PoseGraph(
        i=jnp.asarray(ii, jnp.int32),
        j=jnp.asarray(jj, jnp.int32),
        R_z=jnp.asarray(np.stack(Rz), jnp.float32),
        t_z=jnp.asarray(np.stack(tz), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
        fixed=jnp.asarray(fixed),
    )
    return poses, graph


def close_loops(
    state: VOState,
    *,
    min_gap: int = 6,
    min_inliers: int = 25,
    iterations: int = 15,
    closure_weight: float = 10.0,
    max_closure_residual: float = 0.1,
    dense_solver_max_poses: int = 64,
    huber_delta: float = 0.0,
    robust_kernel: str = "tukey",
    candidates=None,
    signature_threshold: float = 0.75,
) -> int:
    """Detect closures, optimize the keyframe pose graph, write poses back.

    Returns the number of accepted closures (0 = nothing changed).

    ``huber_delta`` > 0 additionally arms the solver-level robust kernel
    (default 'tukey': gross outlier edges get zero influence) underneath
    the rejection loop below.

    False-positive protection: after a trial optimization, a closure is
    inconsistent if either its own residual stays above
    ``max_closure_residual`` (6-vector norm: radians + trajectory units) or
    the odometry chain had to bend beyond that bound to absorb it (a
    heavily weighted false closure pushes its own residual down while
    warping the chain — the warp is the tell). Inconsistent closures are
    dropped (worst first) and the graph re-optimized; if none survive the
    state is left untouched. Landmarks are corrected rigidly per anchoring
    keyframe (first observer) so the map follows the trajectory.
    """
    closures = find_loop_closures(
        state, min_gap=min_gap, min_inliers=min_inliers,
        candidates=candidates, signature_threshold=signature_threshold,
    )
    if not closures:
        return 0

    n_odo = len(state.keyframes) - 1
    solver = "dense" if len(state.keyframes) <= dense_solver_max_poses else "pcg"
    # odometry edges legitimately carry the drift being redistributed;
    # allow them a larger bend before suspecting the closures
    odo_bound = 3.0 * max_closure_residual

    # Dropped closures are masked to weight 0 rather than removed: the
    # graph keeps ONE static shape across retry rounds, so the jitted
    # optimizer compiles once per closure attempt instead of once per
    # round (trace+compile of the lane solver is seconds on CPU).
    poses, graph0 = build_keyframe_graph(
        state, closures, closure_weight=closure_weight
    )
    poses, graph0, P_real = _pad_pose_graph(poses, graph0)
    n_clo = len(closures)
    w0 = np.asarray(graph0.weight)
    active = np.ones(n_clo, bool)
    while active.any():
        w = w0.copy()
        w[n_odo : n_odo + n_clo][~active] = 0.0
        graph = graph0._replace(weight=jnp.asarray(w))
        opt, _ = optimize_pose_graph(
            poses, graph, iterations=iterations, solver=solver,
            huber_delta=huber_delta, robust_kernel=robust_kernel,
        )
        res = np.linalg.norm(np.asarray(edge_residuals(opt, graph)), axis=-1)
        odo_res, clo_res = res[:n_odo], res[n_odo : n_odo + n_clo]
        bad = (clo_res >= max_closure_residual) & active
        if not bad.any() and (n_odo == 0 or odo_res.max() < odo_bound):
            break
        if bad.any():
            active &= ~bad
        else:
            # chain warped without any closure admitting fault: drop the
            # active closure with the largest residual and retry
            worst = int(np.argmax(np.where(active, clo_res, -np.inf)))
            active[worst] = False
    if not active.any():
        return 0
    closures = [c for c, a in zip(closures, active) if a]

    # rigid per-keyframe landmark correction: X' = T_new^{-1} T_old X,
    # batched per anchor keyframe
    old = [(kf.R.copy(), kf.t.copy()) for kf in state.keyframes]
    Rn = np.asarray(opt.R)[:P_real]
    tn = np.asarray(opt.t)[:P_real]

    anchor = _landmark_anchors(state)
    for k in np.unique(anchor[anchor >= 0]):
        sel = np.nonzero(anchor == k)[0]
        Ro, to = old[k]
        Xc = state.landmarks[sel] @ Ro.T + to  # camera frame (invariant)
        state.landmarks[sel] = (Xc - tn[k]) @ Rn[k]

    for k, kf in enumerate(state.keyframes):
        kf.R, kf.t = Rn[k], tn[k]
    return len(closures)


def _landmark_anchors(state: VOState) -> np.ndarray:
    """[capacity] first-observer keyframe index per landmark slot (-1 =
    none). Sized by the full slot capacity, NOT num_landmarks: under the
    device engine's slot reuse, occupied slots are not a contiguous prefix
    and num_landmarks is an occupancy count."""
    n_lm = state.landmarks.shape[0]
    anchor = np.full(n_lm, -1, np.int64)
    for k in reversed(range(len(state.keyframes))):  # first observer wins
        ids = state.keyframes[k].landmark_ids
        ids = ids[(ids >= 0) & (ids < n_lm)]
        anchor[ids] = k
    return anchor


def close_loops_sim3(
    state: VOState,
    *,
    min_gap: int = 6,
    min_inliers: int = 25,
    iterations: int = 20,
    closure_weight: float = 10.0,
    max_closure_residual: float = 0.1,
    huber_delta: float = 0.0,
    robust_kernel: str = "tukey",
    candidates=None,
    signature_threshold: float = 0.75,
) -> int:
    """Scale-drift-aware loop closure: Sim(3) pose graph over keyframes.

    Each closure edge carries the relative map scale measured from the
    depth ratios of the closure's own triangulation against both
    keyframes' landmark maps (sim3_closure_edge; the same TwoViewResult
    that passed geometric verification is reused — no re-run). Odometry
    edges carry scale 1. False-positive protection mirrors
    :func:`close_loops`: closures whose post-optimization residual exceeds
    ``max_closure_residual`` (or that bend the odometry chain beyond 3x
    that bound) are dropped and the graph re-optimized. After
    optimization, poses are re-metricated back to SE(3): each pose's
    recovered scale folds into its translation and its anchored landmarks
    move by the inverse similarity (all reprojections invariant).
    """
    from cvsteer_tpu.slam.posegraph_sim3 import (
        Sim3Graph,
        edge_residuals as sim3_edge_residuals,
        optimize_pose_graph_sim3,
    )
    from cvsteer_tpu.slam.sim3 import Sim3

    from cvsteer_tpu.slam.vo import _diag

    closures = find_loop_closures(
        state, min_gap=min_gap, min_inliers=min_inliers,
        candidates=candidates, signature_threshold=signature_threshold,
    )
    if not closures:
        _diag(state, ev="closure_reject", stage="verify")
        return 0
    edges = [(c, sim3_closure_edge(state, c)) for c in closures]
    edges = [(c, e) for c, e in edges if e is not None]
    if not edges:
        _diag(state, ev="closure_reject", stage="edge_scale")
        return 0

    kfs_all = state.keyframes
    P_all = len(kfs_all)
    edges_orig = [(c.i, c.j) for c, _ in edges]  # pre-remap, for diag
    # SKELETON pose graph (round 5): at campaign scale a full-history
    # solve is both SLOW (the dense [7P]^2 Cholesky is cubic; the PCG
    # alternative under-converges on chain-conditioned graphs at
    # cg_iterations any wall-clock budget allows) and unnecessary — the
    # correction field varies smoothly along the chain. Solve over every
    # ``stride``-th keyframe plus all closure endpoints (<= ~SK_MAX
    # nodes, dense Cholesky, fully converged), then propagate each
    # skipped keyframe by composing its STORED relative pose onto its
    # skeleton predecessor's Sim(3) correction — the standard
    # hierarchical pose-graph design, and the same first-order local
    # propagation finalize() applies to non-keyframe trajectory entries.
    SK_MAX = 250  # P_pad stays in the 256 bucket (dense ~1 s/solve)
    if P_all > SK_MAX:
        stride = -(-P_all // SK_MAX)
        sk = sorted(
            set(range(0, P_all, stride)) | {P_all - 1}
            | {c.i for c in closures} | {c.j for c in closures}
        )
    else:
        sk = list(range(P_all))
    sk_of = {k: n for n, k in enumerate(sk)}
    kfs = [kfs_all[k] for k in sk]
    edges = [
        (c._replace(i=sk_of[c.i], j=sk_of[c.j]), e) for c, e in edges
    ]
    P = len(kfs)
    poses = Sim3(
        s=jnp.ones(P),
        R=jnp.asarray(np.stack([kf.R for kf in kfs])),
        t=jnp.asarray(np.stack([kf.t for kf in kfs])),
    )
    fixed = np.zeros(P, bool)
    fixed[0] = True
    n_odo = P - 1
    odo_bound = 3.0 * max_closure_residual

    def build(edge_list):
        ii, jj, sz, Rz, tz, w = [], [], [], [], [], []
        for k in range(n_odo):
            Rrel = kfs[k + 1].R @ kfs[k].R.T
            ii.append(k)
            jj.append(k + 1)
            sz.append(1.0)
            Rz.append(Rrel)
            tz.append(kfs[k + 1].t - Rrel @ kfs[k].t)
            w.append(1.0)
        for c, (s_z, R_z, t_z) in edge_list:
            ii.append(c.i)
            jj.append(c.j)
            sz.append(s_z)
            Rz.append(R_z)
            tz.append(t_z)
            w.append(closure_weight)
        return Sim3Graph(
            i=jnp.asarray(ii, jnp.int32),
            j=jnp.asarray(jj, jnp.int32),
            s_z=jnp.asarray(sz, jnp.float32),
            R_z=jnp.asarray(np.stack(Rz), jnp.float32),
            t_z=jnp.asarray(np.stack(tz), jnp.float32),
            weight=jnp.asarray(w, jnp.float32),
            fixed=jnp.asarray(fixed),
        )

    # weight-0 masking instead of graph rebuilds + bucket padding: one
    # static shape, one compile of the jitted Sim(3) optimizer per bucket
    # (see close_loops / _pad_pose_graph)
    poses, graph0, P_real = _pad_pose_graph(poses, build(edges))
    n_clo = len(edges)
    w0 = np.asarray(graph0.weight)
    active = np.ones(n_clo, bool)
    while active.any():
        w = w0.copy()
        w[n_odo : n_odo + n_clo][~active] = 0.0
        graph = graph0._replace(weight=jnp.asarray(w))
        # large graphs take the matrix-free PCG: the dense [7P, 7P]
        # Cholesky is cubic in the padded pose count (measured 6-11 s per
        # closure event at P~512 on the v5e; minutes at P=2048), while
        # PCG stays O(E*49) per CG iteration — campaign-scale events
        # remain subsecond
        P_pad = int(graph0.fixed.shape[0])
        opt, stats = optimize_pose_graph_sim3(
            poses, graph, iterations=iterations,
            huber_delta=huber_delta, robust_kernel=robust_kernel,
            solver="pcg" if P_pad > 256 else "dense",
            cg_iterations=100,
        )
        if not bool(np.isfinite(float(stats.cost))):
            return 0
        res = np.linalg.norm(np.asarray(sim3_edge_residuals(opt, graph)), axis=-1)
        odo_res, clo_res = res[:n_odo], res[n_odo : n_odo + n_clo]
        bad = (clo_res >= max_closure_residual) & active
        if not bad.any() and (n_odo == 0 or odo_res.max() < odo_bound):
            break
        if bad.any():
            active &= ~bad
        else:
            worst = int(np.argmax(np.where(active, clo_res, -np.inf)))
            active[worst] = False
    if not active.any():
        _diag(
            state, ev="closure_reject", stage="post_solve",
            n_verified=n_clo,
            clo_res=[round(float(x), 4) for x in clo_res[:8]],
            odo_res_max=round(float(odo_res.max()), 4) if n_odo else 0.0,
            bar=max_closure_residual,
        )
        return 0
    edges_orig = [e for e, a in zip(edges_orig, active) if a]
    edges = [e for e, a in zip(edges, active) if a]

    # write back: landmarks move with their anchor's inverse-similarity
    # correction (camera-frame coords invariant); poses re-metricate by
    # folding the recovered scale into translation
    old = [(kf.R.copy(), kf.t.copy()) for kf in state.keyframes]
    sn = np.asarray(opt.s)[:P_real]
    Rn = np.asarray(opt.R)[:P_real]
    tn = np.asarray(opt.t)[:P_real]
    # global scale-sanity gate (belt to the edge-level band clamp): a
    # legitimate closure on a scale-anchored map redistributes percent-
    # level drift — recovered node scales outside the configured band
    # mean the solver satisfied a broken constraint by warping the map
    # (the r5 campaign's 0.14-15.7 node-scale event). Residual checks
    # miss this: a smooth warp keeps every edge residual small.
    lo_b, hi_b = getattr(state.config, "loop_scale_band", (0.5, 2.0))
    if lo_b > 0 and (sn.min() < lo_b or sn.max() > hi_b):
        _diag(
            state, ev="closure_reject", stage="scale_sanity",
            sn_min=round(float(sn.min()), 4),
            sn_max=round(float(sn.max()), 4),
        )
        return 0
    if P_all > len(sk):
        # expand skeleton corrections to every keyframe: T_k_new =
        # Z_(k|a) o T_a_new with Z the STORED relative pose to the
        # skeleton predecessor a (x -> s R x + t convention, so the
        # local offset re-metricates by the node's recovered scale —
        # exactly how solved nodes are treated)
        sk_arr = np.asarray(sk)
        sn_f = np.ones(P_all, np.float32)
        Rn_f = np.stack([o[0] for o in old]).astype(np.float32)
        tn_f = np.stack([o[1] for o in old]).astype(np.float32)
        for k in range(P_all):
            a_pos = int(np.searchsorted(sk_arr, k, side="right")) - 1
            a = int(sk_arr[max(a_pos, 0)])
            n = sk_of[a]
            if k == a:
                sn_f[k], Rn_f[k], tn_f[k] = sn[n], Rn[n], tn[n]
                continue
            Ra_o, ta_o = old[a]
            Rz = old[k][0] @ Ra_o.T
            tz = old[k][1] - Rz @ ta_o
            sn_f[k] = sn[n]
            Rn_f[k] = Rz @ Rn[n]
            # t of (Z o A): x -> Rz(s_a Ra' x + ta') + tz; the local
            # offset tz re-metricates by 1/s_a with the node (the whole
            # local map around ``a`` carries the same recovered scale)
            tn_f[k] = Rz @ tn[n] + tz
        sn, Rn, tn = sn_f, Rn_f, tn_f

    anchor = _landmark_anchors(state)
    for k in np.unique(anchor[anchor >= 0]):
        sel = np.nonzero(anchor == k)[0]
        Ro, to = old[k]
        Xc = state.landmarks[sel] @ Ro.T + to  # camera-frame, invariant
        # X' = T_new^{-1} Xc with T_new = (s, R, t): X' = R^T (Xc - t) / s
        state.landmarks[sel] = ((Xc - tn[k]) @ Rn[k]) / sn[k]

    c_old = np.stack([-(o[0].T @ o[1]) for o in old])
    for k, kf in enumerate(state.keyframes):
        kf.R, kf.t = Rn[k], (tn[k] / sn[k]).astype(np.float32)
    # solve diagnostics (r5): what the accepted event DID — recovered
    # scale range, worst keyframe displacement, and each surviving
    # edge's (s_z, |t_z|) against the pre/post loop gap it closed
    c_new = np.stack([
        -(kf.R.T @ kf.t) for kf in state.keyframes
    ])
    ed_diag = []
    for (i0, j0), (c_r, (s_z, _R_z, t_z)) in zip(edges_orig, edges):
        ed_diag.append({
            "i": int(i0), "j": int(j0), "s_z": round(float(s_z), 4),
            "t_z": round(float(np.linalg.norm(t_z)), 3),
            "gap_pre": round(float(np.linalg.norm(c_old[i0] - c_old[j0])), 3),
            "gap_post": round(float(np.linalg.norm(c_new[i0] - c_new[j0])), 3),
        })
    _diag(
        state, ev="closure_solve",
        sn_min=round(float(sn.min()), 4), sn_max=round(float(sn.max()), 4),
        d_center_max=round(float(
            np.linalg.norm(c_new - c_old, axis=1).max()), 3),
        edges=ed_diag,
    )
    return len(edges)
