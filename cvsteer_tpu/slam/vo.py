"""Monocular visual odometry: keyframing + windowed Schur BA (BASELINE config 4).

Host-driven loop (keyframe decisions are control flow) around jitted device
steps: feature matching, essential RANSAC two-view init, motion-only pose
refinement (PnP), triangulation, and windowed bundle adjustment. The image
front-end is pluggable: ``process_image`` runs
cvsteer_tpu.features.extract_features; ``process_frame`` accepts Features
directly (synthetic feature streams in tests use this seam).

Pose convention: T_k = (R_k, t_k), world -> camera-k. Scale is fixed by the
two-view initialization baseline (||t|| = 1), as is standard for monocular.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.features.frontend import Features, FrontendConfig, extract_features
from cvsteer_tpu.features.matching import match_descriptors
from cvsteer_tpu.geometry.camera import Intrinsics
from cvsteer_tpu.geometry.epipolar import ransac_essential
from cvsteer_tpu.geometry.pose import recover_pose, triangulate
from cvsteer_tpu.slam import se3
from cvsteer_tpu.slam.ba import BAProblem, BAState, bundle_adjust, refine_pose
from cvsteer_tpu.slam import vo_core
from cvsteer_tpu.utils.precision import precise


#: consecutive lost frames (no reloc) before the engine restarts its map
REBOOT_AFTER_LOST = 5

# ground-prior control constants: single home is vo_core (the device-side
# controller shares them); re-exported here for the host law + tests
GROUND_DEADBAND = vo_core.GROUND_DEADBAND
GROUND_GAIN = vo_core.GROUND_GAIN
GROUND_MAX_STEP = vo_core.GROUND_MAX_STEP
GROUND_FAR = vo_core.GROUND_FAR
GROUND_MAX_STEP_FAR = vo_core.GROUND_MAX_STEP_FAR


class VOConfig(NamedTuple):
    intrinsics: Intrinsics = Intrinsics(500.0, 500.0, 320.0, 240.0)
    frontend: FrontendConfig = FrontendConfig()
    match_ratio: float = 0.85
    # Median |x1 - x2| (normalized) required to initialize. 0.015 accepted
    # near-degenerate bootstrap pairs whose essential matrix is barely
    # constrained in the t-direction — measured round 3 as 0.02-vs-0.14 ATE
    # platform flips and occasional 0.1+ outliers even in exact arithmetic;
    # 0.03 delays init by a frame or two and held every synthetic stream
    # <= 0.021 ATE across 32 seeds on both CPU and TPU.
    min_parallax: float = 0.03
    init_min_inliers: int = 30
    track_min_landmarks: int = 40  # below this -> new keyframe
    kf_max_gap: int = 10  # force a keyframe every N frames
    # flow-driven keyframe promotion (0 = off): promote when the MEDIAN
    # image displacement of matched keyframe features exceeds this many
    # pixels — i.e. when parallax has actually accumulated, instead of on
    # a fixed frame gap. Longer straight-line gaps mean longer
    # triangulation baselines (the forward-motion fresh-depth bias that
    # drives monocular scale decay shrinks quadratically with ray angle),
    # while turns auto-promote densely from rotational flow. kf_max_gap
    # stays as the backstop.
    kf_min_flow_px: float = 0.0
    window: int = 8  # BA window (keyframes)
    ba_iterations: int = 12
    huber_delta: float = 4e-3
    ransac_hypotheses: int = 512
    ransac_threshold: float = 1e-5
    max_landmarks: int = 4096
    # minimum ray angle (degrees) between the two observing views for a
    # fresh landmark to register — the monocular scale-stability guard
    # (vo_core.triangulation_gate): kills near-epipole, parallax-free
    # triangulations under forward motion. 0 disables. Default 0.35 is the
    # measured sweet spot on the city-loop probes (1.0 starves the
    # forward-motion corridor whose content is mostly sub-degree).
    tri_min_ray_angle_deg: float = 0.35
    loop_closure: bool = False  # detect + correct loops at each new keyframe
    # Sim(3) closure graph: corrects monocular scale drift, not just
    # rotation/translation drift (slam.loopclosure.close_loops_sim3)
    loop_closure_sim3: bool = False
    loop_min_gap: int = 6  # keyframes of separation before closures apply
    loop_min_inliers: int = 25
    # device-resident signature index (closure detection): keyframe row
    # capacity of the [K, D] store; keyframes beyond it are not indexed
    loop_sig_capacity: int = 4096
    # closure candidates verified per event (fixed-shape top-k)
    loop_max_candidates: int = 3
    # signature-cosine prefilter: candidates below this never reach
    # geometric verification (and — device engine — below it the closure
    # event is skipped entirely: no state sync, no verification dispatch)
    loop_signature_threshold: float = 0.75
    # after an ACCEPTED closure, suppress further closure attempts for
    # this many keyframes: revisiting a corrected region re-detects the
    # same loop every promotion, and each accepted event is a full
    # pose-graph solve (long-run serving hygiene; 0 = off)
    loop_cooldown: int = 0
    # require the top closure candidate to point at the same map REGION
    # (8-keyframe buckets) for this many CONSECUTIVE promotions before
    # paying the verification event (state sync + vmapped RANSAC + PGO).
    # Self-similar streetscapes keep single-promotion signature hits above
    # threshold that geometry then rejects — measured on the city loop:
    # a ~700 ms rejected event on nearly EVERY promotion (the campaign
    # throughput killer). Temporal consistency is the standard fix
    # (ORB-SLAM's covisibility-consistent groups). 1 = verify on first
    # detection (round-4 behavior).
    loop_consistency: int = 1
    # after a REJECTED verification, suppress re-verifying the same
    # candidate region for this many keyframes (0 = off). Bounds the
    # rejected-event rate on perceptually-aliased maps.
    loop_reject_cooldown: int = 0
    # solver-level robust kernel width for the closure pose graph (0 = off;
    # loopclosure defaults the kernel to redescending tukey)
    loop_robust_delta: float = 0.0
    # plausibility band for a Sim(3) closure edge's MEASURED relative
    # scale s_j/s_i. The old-side scale mixes epochs over long runs
    # (frozen at-time keyframe pose x current landmark positions) and a
    # near-zero-baseline revisit triangulates at noise depths — the r5
    # campaign measured s_z = 0.009 on a true revisit and the solver
    # warped the whole map 139 m to satisfy it. Outside the band the
    # measurement is discarded for the unit-scale prior (exact under an
    # active ground prior; VO scale drift is percent-level, never 2x).
    loop_scale_band: Tuple[float, float] = (0.5, 2.0)
    # constant-velocity PnP initialization: helps under fast motion, but the
    # extrapolation amplifies tracking noise on easy sequences — opt-in
    motion_model: bool = False
    # track against the device-resident per-landmark descriptor store
    # instead of only the last keyframe's features (slam.vo_device only):
    # landmarks observed by ANY window keyframe stay trackable, which
    # survives feature dropout and viewpoint change that break
    # single-keyframe matching. The host engine ignores this flag.
    track_local_map: bool = False
    # Projective rescue of associations the mutual-ratio match dropped
    # (vo_core.guided_rescue): after the first PnP, unmatched landmark-
    # bearing keyframe features accept the mutually-best frame feature
    # within rescue_radius_px of their landmark's projection whose
    # descriptor cosine clears rescue_min_cos, then a short re-refine
    # runs on the merged set. Cuts landmark churn (the monocular scale-
    # collapse driver measured on the city loop: ~50% of tracked
    # landmarks re-triangulated every keyframe without it). 0 disables.
    rescue_radius_px: float = 12.0
    rescue_min_cos: float = 0.6
    # Kinematic speed prior (opt-in; (0, 0) = off): on keyframe
    # promotion, the new inter-keyframe baseline is clamped into
    # [lo, hi] x rolling-median(last speed_prior_window accepted
    # baselines); the promotion increment (pose + this promotion's FRESH
    # landmarks, rescaled about the previous keyframe center) is
    # corrected to the clamp. Monocular scale drift is a multiplicative
    # random walk with occasional runaways (measured city-loop collapse:
    # 75x in 25 frames); for platforms with bounded acceleration
    # (vehicles, handheld video) this bounds the per-window drift to
    # ~log(hi) without touching healthy operation (normal per-keyframe
    # variation is +-30%, drift ~0.1%/keyframe).
    speed_prior_band: Tuple[float, float] = (0.0, 0.0)
    speed_prior_window: int = 64
    # Ground-plane height prior (0 = off): the camera's height above the
    # ground plane in METERS. For ground vehicles / rigs at fixed height
    # this is an ABSOLUTE per-promotion scale reference — the standard
    # automotive monocular-VO scale anchor: the median camera-frame
    # height of bottom-of-image tracked landmarks measures the map's
    # current metric scale every frame (vo_core.ground_height_obs), so a
    # scale controller can hold map units == meters against the slow
    # multiplicative drift that no RELATIVE band can stop (measured city
    # loop: -0.46 %/keyframe from fresh-triangulation depth bias —
    # scripts/probe_tri_bias.py). Corrections apply to the promotion
    # increment (pose + fresh landmarks) within GROUND_DEADBAND /
    # GROUND_MAX_STEP; two-view init rescales the whole fresh map.
    ground_height_m: float = 0.0

    @property
    def rescue_radius_norm(self) -> float:
        """Rescue radius in normalized camera units (static jit constant)."""
        f = 0.5 * (self.intrinsics.fx + self.intrinsics.fy)
        return float(self.rescue_radius_px) / max(f, 1e-6)

    @property
    def kf_min_flow_norm(self) -> float:
        """Flow-promotion threshold in normalized units (static constant)."""
        f = 0.5 * (self.intrinsics.fx + self.intrinsics.fy)
        return float(self.kf_min_flow_px) / max(f, 1e-6)


@dataclasses.dataclass
class Keyframe:
    index: int  # frame index
    features: Features
    R: np.ndarray  # [3, 3] world->camera
    t: np.ndarray  # [3]
    landmark_ids: np.ndarray  # [N] int64, -1 = feature has no landmark
    # slot-generation stamps paired with landmark_ids (device engine only:
    # slam.vo_device reuses culled slots, and a stamp mismatch marks an id
    # whose slot now holds a DIFFERENT landmark). None on host-engine
    # keyframes — the host loop clears culled ids synchronously instead.
    landmark_gens: Optional[np.ndarray] = None
    # landmark ids freshly TRIANGULATED at this keyframe's promotion
    # (recorded at registration — the only reliable source: fresh ids are
    # registered into the PREVIOUS keyframe's table too, so recomputing
    # them later from observation tables finds nothing). Consumed by the
    # speed prior's increment rescale. None = no fresh registrations.
    fresh_ids: Optional[np.ndarray] = None
    # lazily computed global descriptor (loopclosure.keyframe_signature);
    # lives on the keyframe so its lifetime is tied to the owning object
    signature: Optional[np.ndarray] = None
    # device mirror of this keyframe's landmark positions per feature slot,
    # (track_version, X [N, 3] jax, sel [N] jax) — rebuilt when the map
    # changes (see _kf_track_cache); lives on the keyframe for lifetime
    track_cache: Optional[tuple] = None
    # host mirror (x_norm [N, 2] np, valid [N] np) of the immutable feature
    # pixels — features never change after keyframe creation, so this is
    # fetched once; windowed BA over an 8-keyframe window otherwise costs
    # 16 blocking device fetches per keyframe on a remote device
    host_cache: Optional[tuple] = None


@dataclasses.dataclass
class VOState:
    config: VOConfig
    keyframes: List[Keyframe] = dataclasses.field(default_factory=list)
    landmarks: Optional[np.ndarray] = None  # [max_landmarks, 3]
    landmark_valid: Optional[np.ndarray] = None  # [max_landmarks]
    num_landmarks: int = 0
    trajectory: List[Tuple[int, np.ndarray, np.ndarray]] = dataclasses.field(
        default_factory=list
    )  # (frame_idx, R, t)
    # parallel to ``trajectory``: None for keyframe entries, else
    # (ref_kf_frame, R_rel, t_rel, prev_kf_frame, b_old) — the pose
    # RELATIVE to the reference keyframe at track time plus the local
    # baseline then, so finalize() can re-anchor non-keyframe poses onto
    # closure-corrected keyframes (with first-order local scale); without
    # this, a Sim(3) loop correction leaves 2/3 of the trajectory in the
    # pre-correction frame and the full-trajectory ATE explodes
    traj_ref: List[Optional[tuple]] = dataclasses.field(default_factory=list)
    initialized: bool = False
    frame_count: int = 0
    # bumped whenever landmark positions / keyframe poses mutate (BA, loop
    # closure, initialization) — invalidates per-keyframe track caches
    track_version: int = 0
    # consecutive frames with < 8 tracked landmarks and no relocalization;
    # at REBOOT_AFTER_LOST the engine re-bootstraps a fresh map
    lost_streak: int = 0
    # rolling accepted per-frame SPEEDS (inter-keyframe baseline / frame
    # gap, map units/frame) — recorded at EVERY promotion; consumed by the
    # speed prior's band clamp and by scale-continuous re-initialization
    # (_try_initialize): monocular scale is arbitrary per two-view init,
    # so a re-bootstrap would otherwise start a fresh scale REGIME (the
    # round-4 campaign's 0.04x-2x segment profile)
    kf_baselines: List[float] = dataclasses.field(default_factory=list)
    # diagnostic event log (None = off): engines append small dicts
    # ({"ev": "kf"|"init"|"reboot"|"reseed"|"reloc"|"closure"|
    # "speed_prior", "f": frame, ...}) when a list is installed here.
    # Not checkpointed; costs nothing when None.
    diag: Optional[list] = dataclasses.field(default=None, repr=False)
    # lazily built device-resident SignatureIndex (slam.loopclosure);
    # NOT checkpointed — rebuilt from keyframe features after a restore
    sig_index: Optional[object] = dataclasses.field(default=None, repr=False)
    # closure-event gate bookkeeping (loopclosure.closure_gate): the
    # (region, streak) of the last promotion's top candidate, and
    # region -> keyframe-index cooldowns after rejected verifications.
    # Not checkpointed (a restore restarts the streak — safe).
    loop_streak: Tuple[int, int] = (-1, 0)
    loop_reject_until: dict = dataclasses.field(default_factory=dict)
    # rolling ground-height observations (ground prior smoothing): the
    # per-promotion median-of-5 tames the +-10 % single-frame observation
    # noise that otherwise ripples the scale controller
    ground_hist: List[float] = dataclasses.field(default_factory=list)

    def poses(self) -> Tuple[np.ndarray, np.ndarray]:
        """Trajectory as (R [F, 3, 3], t [F, 3])."""
        Rs = np.stack([p[1] for p in self.trajectory])
        ts = np.stack([p[2] for p in self.trajectory])
        return Rs, ts


def init_vo(config: VOConfig = VOConfig()) -> VOState:
    state = VOState(config=config)
    state.landmarks = np.zeros((config.max_landmarks, 3), np.float32)
    state.landmark_valid = np.zeros(config.max_landmarks, bool)
    return state


# Compile-once device steps (VERDICT r1 item 2): every per-frame jax call in
# the VO loop goes through a cached jit with static shapes, so after warmup a
# run performs zero recompiles and a bounded number of device dispatches per
# frame.


@functools.partial(jax.jit, static_argnames=("ratio",))
@precise
def _match_jit(desc_a, valid_a, desc_b, valid_b, ratio):
    # valid is recoverable host-side as index >= 0: one fetched array
    # instead of two (each blocking fetch costs a full RTT on remote-device
    # setups)
    m = match_descriptors(desc_a, valid_a, desc_b, valid_b, ratio=ratio)
    return m.index


@functools.partial(
    jax.jit, static_argnames=("iterations", "huber_delta", "lam0")
)
@precise
def _refine_pose_jit(X, uv, sel, R0, t0, *, iterations, huber_delta, lam0=1e-4):
    R, t, inl = refine_pose(
        X, uv, sel, R0, t0,
        iterations=iterations, huber_delta=huber_delta, lam0=lam0,
    )
    # fold the inlier count on-device: one device_get per refinement
    return R, t, jnp.sum(inl)



@functools.partial(
    jax.jit,
    static_argnames=(
        "ratio", "iterations", "huber_delta", "min_track", "dual_init",
        "dist", "rescue_radius", "rescue_min_cos", "kf_min_flow",
        "ground_prior",
    ),
)
@precise
def _track_fused_jit(
    desc_a, valid_a, X_slots, sel_slots, yx_a, yx_b, desc_b, valid_b,
    R0, t0, R1, t1, K4,
    *, ratio, iterations, huber_delta, min_track, dual_init, dist,
    rescue_radius=0.0, rescue_min_cos=0.6, kf_min_flow=0.0,
    ground_prior=False,
):
    """The whole steady-state tracking step in ONE dispatch / ONE fetch.

    Match to the keyframe, gather the matched features' normalized pixels,
    pair them with the keyframe-slot landmark mirror (X_slots/sel_slots,
    prebuilt on device per keyframe), run the motion-only PnP refinement,
    and — when ``dual_init`` — refine from both the motion-model prediction
    (R0, t0) and the keyframe pose (R1, t1), selecting on-device exactly as
    the old host retry did (fall back when the prediction yields < min_track
    inliers and the keyframe init does better). On a remote/tunneled device
    every separate blocking fetch costs a full RTT; this folds the previous
    3-4 fetches per frame (match index, feature pixels, refinement, content
    check) into one.
    """
    idx = match_descriptors(desc_a, valid_a, desc_b, valid_b, ratio=ratio).index
    use = (idx >= 0) & sel_slots
    # normalized pixels of EVERY new-frame slot: rides home with the track
    # fetch so a keyframe promotion needs no separate pixel round-trip
    uv_all = jnp.stack(
        [(yx_b[:, 1] - K4[2]) / K4[0], (yx_b[:, 0] - K4[3]) / K4[1]], -1
    )
    if any(float(d) != 0.0 for d in dist):  # static branch
        from cvsteer_tpu.geometry.camera import undistort_normalized

        uv_all = undistort_normalized(uv_all, dist)
    uv = jnp.where(use[:, None], uv_all[jnp.maximum(idx, 0)], 0.0)
    Ra, ta, na = vo_core.pnp_dual_refine(
        X_slots, uv, use, R0, t0, R1, t1,
        iterations=iterations, huber_delta=huber_delta,
        min_track=min_track, dual_init=dual_init,
    )
    if float(rescue_radius) > 0.0:  # static branch (see vo_core)
        idx = vo_core.guided_rescue(
            desc_a, valid_a, X_slots, sel_slots, desc_b, valid_b,
            uv_all, idx, Ra, ta,
            radius_norm=rescue_radius, min_sim=rescue_min_cos,
        )
        use = (idx >= 0) & sel_slots
        uv = jnp.where(use[:, None], uv_all[jnp.maximum(idx, 0)], 0.0)
        Ra, ta, na = vo_core.pnp_dual_refine(
            X_slots, uv, use, Ra, ta, R1, t1,
            iterations=max(iterations // 2, 4), huber_delta=huber_delta,
            min_track=min_track, dual_init=False,
        )
    # median matched-feature flow (normalized units) for the flow-driven
    # keyframe policy — rides home with the same fetch; see the device
    # twin in vo_device._track_phase
    if float(kf_min_flow) > 0.0:  # static branch
        uv_kf = jnp.stack(
            [(yx_a[:, 1] - K4[2]) / K4[0], (yx_a[:, 0] - K4[3]) / K4[1]], -1
        )
        if any(float(d) != 0.0 for d in dist):  # static branch
            from cvsteer_tpu.geometry.camera import undistort_normalized

            uv_kf = undistort_normalized(uv_kf, dist)
        matched = (idx >= 0) & valid_a
        disp = jnp.linalg.norm(
            uv_kf - uv_all[jnp.maximum(idx, 0)], axis=-1
        )
        d_m = jnp.where(matched, disp, jnp.inf)
        cnt = jnp.sum(matched.astype(jnp.int32))
        flow = jnp.where(
            cnt > 0, jnp.sort(d_m)[jnp.maximum(cnt // 2, 0)], 0.0
        )
    else:
        flow = jnp.float32(0.0)
    if ground_prior:  # static branch — vo_device._track_phase is the twin
        ground_h = vo_core.ground_height_obs(
            X_slots, use, yx_b[jnp.maximum(idx, 0), 0], Ra, ta, K4[3]
        )
    else:
        ground_h = jnp.float32(0.0)
    return (
        Ra, ta, na, idx, jnp.sum(valid_b), uv_all, valid_b, flow, ground_h
    )


def _kf_track_cache(state: VOState, kf: Keyframe):
    """Device mirror of ``kf``'s per-slot landmark positions.

    Rebuilt when state.track_version moves (BA, loop closure, or
    initialization mutated the map); otherwise the cached device arrays are
    reused so tracking never re-uploads or re-gathers landmarks."""
    if kf.track_cache is None or kf.track_cache[0] != state.track_version:
        ids = kf.landmark_ids
        sel = ids >= 0
        X = np.zeros((ids.shape[0], 3), np.float32)
        X[sel] = state.landmarks[ids[sel]]
        kf.track_cache = (
            state.track_version, jnp.asarray(X), jnp.asarray(sel)
        )
    return kf.track_cache[1], kf.track_cache[2]


def _match(state: VOState, fa: Features, fb: Features):
    idx = np.asarray(
        _match_jit(fa.desc, fa.valid, fb.desc, fb.valid, ratio=state.config.match_ratio)
    )
    return idx, idx >= 0


def _norm_pts(state: VOState, feats: Features) -> np.ndarray:
    """Normalized (undistorted) pixels, computed host-side (tiny array;
    avoids a device round-trip per frame)."""
    from cvsteer_tpu.geometry.camera import undistort_normalized_np

    K = state.config.intrinsics
    yx = np.asarray(feats.yx, np.float32)
    x = (yx[..., 1] - K.cx) / K.fx
    y = (yx[..., 0] - K.cy) / K.fy
    xy = np.stack([x, y], -1)
    if K.has_distortion:
        xy = undistort_normalized_np(xy, K.dist)
    return xy


def _kf_host_cache(state: VOState, kf: Keyframe):
    """(x_norm, valid) host mirrors of a keyframe's immutable features."""
    if kf.host_cache is None:
        kf.host_cache = (
            _norm_pts(state, kf.features),
            np.asarray(kf.features.valid),
        )
    return kf.host_cache


def _try_initialize(state: VOState, feats: Features) -> bool:
    """Two-view initialization against the current BOOTSTRAP keyframe.

    For a fresh state that is keyframe 0; after a persistent-loss
    re-bootstrap (_rebootstrap) it is the re-seeded LAST keyframe — using
    keyframes[0] there matched the current frame against imagery from
    thousands of frames ago and initialization never completed (the
    round-4 city-loop stall). The recovered relative pose and the
    triangulated points are composed onto the bootstrap keyframe's pose,
    which is the identity for a fresh state."""
    kf0 = state.keyframes[-1]
    idx, valid = _match(state, kf0.features, feats)
    if valid.sum() < state.config.init_min_inliers:
        # forward motion accumulates parallax slowly and the reference
        # goes stale (feature churn) before parallax arrives: re-seed the
        # bootstrap keyframe with the CURRENT frame so the init pair is
        # always matchable. Guards: (a) never seed a featureless frame
        # (a blank bootstrap reference strands initialization — the same
        # n_valid >= 16 rule _decide_keyframe applies), and (b) REPLACE a
        # previous failed re-seed (a bootstrap keyframe that registered no
        # landmarks) instead of appending — a blackout stretch otherwise
        # grows one keyframe per frame, permanently consuming
        # loop_sig_capacity rows and distorting window/min_gap semantics.
        if int(np.asarray(feats.valid).sum()) < 16:
            return False
        _diag(state, ev="reseed")
        if len(state.keyframes) >= 2 and not (kf0.landmark_ids >= 0).any():
            state.keyframes.pop()
        n = feats.yx.shape[0]
        state.keyframes.append(
            Keyframe(
                state.frame_count, feats, kf0.R.copy(), kf0.t.copy(),
                np.full(n, -1, np.int64),
            )
        )
        return False

    x0 = _norm_pts(state, kf0.features)
    x1 = _norm_pts(state, feats)
    pts0 = x0
    pts1 = x1[np.maximum(idx, 0)]
    parallax = np.linalg.norm(pts0 - pts1, axis=-1)
    med_par = np.median(parallax[valid])
    if med_par < state.config.min_parallax:
        return False

    res = ransac_essential(
        jnp.asarray(pts0),
        jnp.asarray(pts1),
        jnp.asarray(valid),
        jax.random.key(state.frame_count),
        num_hypotheses=state.config.ransac_hypotheses,
        inlier_threshold=state.config.ransac_threshold,
    )
    if int(res.num_inliers) < state.config.init_min_inliers:
        return False
    pose = recover_pose(res.E, jnp.asarray(pts0), jnp.asarray(pts1), res.inliers)

    good = np.asarray(pose.cheirality)
    # pose/points are relative to kf0; compose onto kf0's world pose
    # (identity for a fresh state, the reboot anchor otherwise)
    X_c0 = np.asarray(pose.points)
    n_new = int(good.sum())
    if n_new < state.config.init_min_inliers:
        return False

    # SCALE-CONTINUOUS re-initialization: recover_pose's baseline is the
    # essential decomposition's unit vector — arbitrary map scale. For a
    # FRESH map that defines the gauge; after a re-bootstrap it would
    # start a new, unrelated scale REGIME (the round-4 campaign profile:
    # segments at 0.04x..2x of global scale = one regime per re-init).
    # When a speed history exists, rescale the init increment so the
    # bootstrap baseline matches rolling-median-speed x frames-elapsed —
    # the new map continues the old map's scale to median accuracy.
    s_init = 1.0
    med = median_speed(state)
    if med is not None and med > 1e-12:
        s_init = med * max(state.frame_count - kf0.index, 1)
    if state.config.ground_height_m > 0:
        # absolute anchor: set the init gauge from the ground plane (map
        # units == meters from frame one); overrides the speed history
        v = np.asarray(kf0.features.yx)[:, 0]
        y_c = X_c0[:, 1]
        sel = (
            good & (v > 1.25 * state.config.intrinsics.cy)
            & (y_c > 1e-3) & (X_c0[:, 2] > 1e-3)
        )
        if sel.sum() >= 8:
            # dominant-height cluster, as in vo_core.ground_height_obs
            pair = (
                (np.abs(y_c[None, :] - y_c[:, None]) < 0.08 * y_c[:, None])
                & sel[None, :] & sel[:, None]
            )
            band = pair[np.argmax(pair.sum(1))]
            if band.sum() >= 8:
                h_raw = float(y_c[band].mean())
                if h_raw > 1e-9:
                    s_init = state.config.ground_height_m / h_raw
    X_c0 = X_c0 * s_init
    X = (X_c0 - kf0.t) @ kf0.R  # R0^T (X - t0): camera-0 -> world
    _diag(
        state, ev="init", kf0_frame=int(kf0.index), n_inliers=n_new,
        scale=s_init,
    )

    # register landmarks into the first free slots (for a fresh host state
    # that is the contiguous tail, so ids match the old monotone counter;
    # under the device engine's slot reuse it is the correct allocator)
    lm_ids_kf0 = kf0.landmark_ids.copy()
    feat_ids0 = np.nonzero(good)[0]
    new_ids = np.nonzero(~state.landmark_valid)[0][:n_new]
    state.landmarks[new_ids] = X[feat_ids0]
    state.landmark_valid[new_ids] = True
    state.num_landmarks = int(state.landmark_valid.sum())
    lm_ids_kf0[feat_ids0] = new_ids
    kf0.landmark_ids = lm_ids_kf0

    # new keyframe: T_new = T_rel o T_kf0
    lm_ids = np.full(feats.yx.shape[0], -1, np.int64)
    lm_ids[idx[feat_ids0]] = new_ids
    R_rel = np.asarray(pose.R)
    t_rel = np.asarray(pose.t) * s_init  # same gauge as the scaled points
    R = (R_rel @ kf0.R).astype(np.float32)
    t = (R_rel @ kf0.t + t_rel).astype(np.float32)
    state.keyframes.append(
        Keyframe(state.frame_count, feats, R, t, lm_ids,
                 fresh_ids=new_ids.astype(np.int64))
    )
    state.trajectory.append((state.frame_count, R, t))
    state.traj_ref.append(None)  # keyframe entry: anchored to itself
    state.initialized = True
    state.track_version += 1  # fresh landmark registrations
    # seed the speed history with the init pair's implied per-frame speed
    # (== the rolling median when continuity applied; the fresh-map gauge
    # speed otherwise) so re-inits hold scale even before 8 promotions
    state.kf_baselines.append(
        s_init / max(state.frame_count - kf0.index, 1)
    )
    return True




def _append_traj(state: "VOState", R, t) -> None:
    """Trajectory append + relative-to-keyframe anchor (VOState.traj_ref).

    Stores (ref_kf_frame, R_rel, t_rel, prev_kf_frame, b_old): the pose
    relative to the CURRENT reference keyframe plus the inter-keyframe
    baseline at append time, so finalize() re-anchors this entry onto the
    keyframe's FINAL (closure-corrected) pose with a first-order local
    scale correction b_new/b_old."""
    R = np.asarray(R, np.float32)
    t = np.asarray(t, np.float32)
    state.trajectory.append((state.frame_count, R, t))
    if not state.keyframes:
        state.traj_ref.append(None)
        return
    kf = state.keyframes[-1]
    R_rel = (R @ kf.R.T).astype(np.float32)
    t_rel = (t - R_rel @ kf.t).astype(np.float32)
    prev = state.keyframes[-2] if len(state.keyframes) >= 2 else None
    if prev is not None:
        c0 = -kf.R.T @ kf.t
        c1 = -prev.R.T @ prev.t
        b_old = float(np.linalg.norm(c0 - c1))
        pidx = prev.index
    else:
        b_old, pidx = 0.0, -1
    state.traj_ref.append((kf.index, R_rel, t_rel, pidx, b_old))

def _predict_pose(state: VOState):
    """Constant-velocity prediction: apply the last inter-frame motion to
    the latest pose. Better PnP initialization than the last keyframe's
    pose when motion per frame is large; falls back to the keyframe pose
    when the recent trajectory looks unstable (non-finite or large jump),
    so a bad track cannot feed back into diverging predictions."""
    kf = state.keyframes[-1]
    if len(state.trajectory) < 2:
        return kf.R, kf.t
    _, R1, t1 = state.trajectory[-1]
    _, R0, t0 = state.trajectory[-2]
    if not (np.isfinite(R1).all() and np.isfinite(t1).all()
            and np.isfinite(R0).all() and np.isfinite(t0).all()):
        return kf.R, kf.t
    # relative motion frame-(k-1) -> frame-k, applied once more
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    # guard: reject implausible per-frame motion (bounds shared with the
    # device twin — vo_core.predict_const_velocity)
    cos = np.clip(0.5 * (np.trace(R_rel) - 1.0), -1.0, 1.0)
    if (
        np.degrees(np.arccos(cos)) > vo_core.MAX_PRED_ROT_DEG
        or np.linalg.norm(t_rel) > vo_core.MAX_PRED_SHIFT
    ):
        return kf.R, kf.t
    return (R_rel @ R1).astype(np.float32), (R_rel @ t1 + t_rel).astype(np.float32)


def _track_issue(state: VOState, feats: Features):
    """Dispatch the fused tracking step WITHOUT fetching.

    Returns the un-fetched device tuple; pair with :func:`_track_complete`.
    The split lets a server batch many streams' dispatches before paying a
    single fetch round-trip (slam.vo_server)."""
    kf = state.keyframes[-1]
    X_dev, sel_dev = _kf_track_cache(state, kf)

    Rp, tp = _predict_pose(state) if state.config.motion_model else (kf.R, kf.t)
    dual = state.config.motion_model and not (
        np.array_equal(Rp, kf.R) and np.array_equal(tp, kf.t)
    )
    K = state.config.intrinsics
    return _track_fused_jit(
        kf.features.desc, kf.features.valid, X_dev, sel_dev,
        kf.features.yx, feats.yx, feats.desc, feats.valid,
        jnp.asarray(Rp), jnp.asarray(tp),
        jnp.asarray(kf.R), jnp.asarray(kf.t),
        jnp.asarray([K.fx, K.fy, K.cx, K.cy], jnp.float32),
        ratio=state.config.match_ratio,
        iterations=10,
        huber_delta=state.config.huber_delta,
        min_track=state.config.track_min_landmarks,
        dual_init=dual,
        dist=tuple(K.dist),
        rescue_radius=state.config.rescue_radius_norm,
        rescue_min_cos=state.config.rescue_min_cos,
        kf_min_flow=state.config.kf_min_flow_norm,
        ground_prior=state.config.ground_height_m > 0,
    )


def _track_complete(state: VOState, fetched):
    """Host-side tail of the tracking step from a FETCHED result tuple.

    Returns (R, t, n_tracked, idx, valid, n_valid, x_new, fvalid, flow):
    x_new/fvalid are the new frame's normalized pixels and feature
    validity, fetched alongside the track result (a keyframe promotion
    consumes them without another round-trip); flow is the median
    matched-feature displacement for the flow-driven keyframe policy."""
    kf = state.keyframes[-1]
    R, t, n, idx, n_valid, uv_all, valid_b, flow, ground_h = fetched
    n_tracked = int(n)
    idx = np.asarray(idx)
    if not (np.isfinite(R).all() and np.isfinite(t).all()):
        R, t, n_tracked = kf.R.copy(), kf.t.copy(), 0
    return (
        np.asarray(R), np.asarray(t), n_tracked, idx, idx >= 0,
        int(n_valid), np.asarray(uv_all, np.float32), np.asarray(valid_b),
        float(flow), float(ground_h),
    )


def _track(state: VOState, feats: Features):
    """Match to the last keyframe's landmark-bearing features; PnP refine.

    One fused device dispatch and one blocking fetch (_track_fused_jit).
    Returns (R, t, n_tracked, idx, valid, n_valid_features, x_new, fvalid)
    — the last two are the frame's normalized pixels / validity, carried
    home with the same fetch for a potential keyframe promotion."""
    return _track_complete(state, jax.device_get(_track_issue(state, feats)))


def _track_against(state: VOState, feats: Features, kf: Keyframe):
    """PnP of ``feats`` against an arbitrary keyframe's landmarks.

    Returns (R, t, n_inliers, idx, valid) like _track but initialized from
    that keyframe's pose — the relocalization primitive.
    """
    idx, valid = _match(state, kf.features, feats)
    use = valid & (kf.landmark_ids >= 0)
    lm_ids = np.where(use, kf.landmark_ids, -1)
    n = len(idx)
    X = np.zeros((n, 3), np.float32)
    sel = lm_ids >= 0
    X[sel] = state.landmarks[lm_ids[sel]]
    uv_all = _norm_pts(state, feats)
    uv = np.zeros((n, 2), np.float32)
    uv[sel] = uv_all[np.maximum(idx, 0)[sel]]
    R, t, n = jax.device_get(
        _refine_pose_jit(
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(sel),
            jnp.asarray(kf.R), jnp.asarray(kf.t),
            iterations=12, huber_delta=state.config.huber_delta,
        )
    )
    return R, t, int(n), idx, valid


def _relocalize(state: VOState, feats: Features, *, max_candidates: int = 3):
    """Tracking-loss recovery: PnP against the best-matching keyframes.

    Candidates ranked by global descriptor signature (shared with
    slam.loopclosure); the first candidate whose motion-only BA keeps
    enough inliers wins. Returns (R, t, n_inliers, idx, valid, kf_index)
    or None.
    """
    from cvsteer_tpu.slam.loopclosure import keyframe_signature

    sig = keyframe_signature(feats)
    lm_bearing = [
        (k, kf) for k, kf in enumerate(state.keyframes)
        if (kf.landmark_ids >= 0).sum() >= 8
    ]
    if not lm_bearing:
        return None

    def kf_sig(kf: Keyframe) -> np.ndarray:
        # cache on the keyframe (features are immutable): without this,
        # every relocalization re-fetched every keyframe's descriptors
        if kf.signature is None:
            kf.signature = keyframe_signature(kf.features)
        return kf.signature

    ranked = sorted(
        lm_bearing, key=lambda e: -float(np.dot(kf_sig(e[1]), sig))
    )
    for k, kf in ranked[:max_candidates]:
        R, t, n_inl, idx, valid = _track_against(state, feats, kf)
        if n_inl >= max(8, state.config.track_min_landmarks // 2):
            return R, t, n_inl, idx, valid, k
    return None


def _kf_inherit(state: VOState, feats: Features, idx, valid, ref_kf):
    """Host phase: landmark-id inheritance from the reference keyframe.

    Returns (kf_prev, lm_ids, fresh) — no device interaction."""
    kf_prev = state.keyframes[-1] if ref_kf is None else state.keyframes[ref_kf]
    n = feats.yx.shape[0]
    lm_ids = np.full(n, -1, np.int64)
    prev_has = kf_prev.landmark_ids >= 0
    inherit = valid & prev_has
    lm_ids[np.maximum(idx, 0)[inherit]] = kf_prev.landmark_ids[inherit]
    fresh = valid & ~prev_has
    return kf_prev, lm_ids, fresh


def _kf_fused_jit_body(
    R_pad, t_pad, X_pad, uv, mask_old, pot_mask, fixed,
    P1, P2, x_prev, x_new_m, fresh, n_room, *, iterations, huber_delta,
    tri_angle=1.0,
):
    """Triangulation + cheirality/capacity gating + windowed BA + per-
    landmark mean reprojection error, all in ONE dispatch.

    The round-1..2 keyframe path paid three blocking fetches
    (triangulation, then BA after host-side registration); on a
    remote/tunneled device each fetch is a full RTT. Here the candidate
    landmarks ride along as extra masked columns of the BA grid: the
    device triangulates all F candidate slots, gates them (cheirality in
    both views, bounds, capacity rank via cumsum — the same
    first-n_room-in-slot-order rule the host used), and the accepted ones
    join the window BA immediately. The host registers ids from the
    fetched ``ok`` mask afterwards — same ids, same end state, one fetch.
    """
    Xc = triangulate(P1, P2, x_prev, x_new_m)  # [F, 3]
    ok = fresh & vo_core.triangulation_gate(Xc, P1, P2, tri_angle)
    ok = ok & (jnp.cumsum(ok.astype(jnp.int32)) <= n_room)
    Lp = mask_old.shape[1]
    X = X_pad.at[Lp:].set(jnp.where(ok[:, None], Xc, 0.0))
    mask = jnp.concatenate([mask_old, pot_mask & ok[None, :]], axis=1)
    problem = BAProblem(
        uv=uv, mask=mask, fixed_cameras=fixed, huber_delta=huber_delta
    )
    final, _ = bundle_adjust(
        BAState(R=R_pad, t=t_pad, X=X), problem, iterations=iterations
    )
    mean_err = vo_core.masked_mean_reproj(final, problem)
    return final.R, final.t, final.X, mean_err, ok, Xc


_kf_fused_jit = functools.partial(
    jax.jit, static_argnames=("iterations", "huber_delta", "tri_angle")
)(precise(_kf_fused_jit_body))


@functools.partial(jax.jit, static_argnames=("iterations", "huber_delta"))
@precise
def _ba_only_jit(R_pad, t_pad, X_pad, uv, mask, fixed, *, iterations, huber_delta):
    """Windowed BA + per-landmark mean error, no candidate columns — the
    cheaper dispatch when triangulation is skipped (landmark budget full
    or too few fresh matches): the fused kernel would otherwise drag F
    feature-capacity dead columns through every LM iteration."""
    problem = BAProblem(
        uv=uv, mask=mask, fixed_cameras=fixed, huber_delta=huber_delta
    )
    final, _ = bundle_adjust(
        BAState(R=R_pad, t=t_pad, X=X_pad), problem, iterations=iterations
    )
    mean_err = vo_core.masked_mean_reproj(final, problem)
    return final.R, final.t, final.X, mean_err


def _kf_append(state: VOState, feats: Features, R, t, lm_ids, x_new, fvalid=None):
    kf_new = Keyframe(state.frame_count, feats, R, t, lm_ids)
    if fvalid is None:
        fvalid = np.asarray(feats.valid)  # host mirror: one fetch
    kf_new.host_cache = (x_new, fvalid)
    state.keyframes.append(kf_new)


def _add_keyframe(
    state: VOState, feats: Features, R, t, idx, valid, ref_kf=None,
    x_new=None, fvalid=None,
):
    """Promote the current frame: inherit landmark ids, triangulate new
    landmarks, and run windowed BA — ONE fused dispatch + ONE fetch
    (_kf_fused_jit); the new frame's pixels/validity normally arrive with
    the TRACK fetch (x_new/fvalid), so promotion adds exactly one
    round-trip. The batched server (slam.vo_server) runs the same
    issue/complete phases with the fetch grouped across streams."""
    if x_new is None:
        x_new = _norm_pts(state, feats)  # fallback fetch (direct callers)
    handles, ctx = _kf_fused_issue(
        state, feats, R, t, idx, valid, ref_kf, x_new, fvalid
    )
    _kf_fused_complete(
        state, jax.device_get(handles) if handles is not None else None, ctx
    )


# Landmark-count buckets for the windowed BA: L is padded up to one of these
# so jit compiles at most len(_BA_L_BUCKETS) x 1 window-shape variants over a
# whole run (VERDICT r1 item 2: zero recompiles after warmup).
_BA_L_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _kf_fused_issue(
    state: VOState, feats, R, t, idx, valid, ref_kf, x_new, fvalid=None
):
    """Host assembly + dispatch of the fused keyframe step (un-fetched).

    Returns (handles, ctx); handles is None when neither BA nor
    triangulation has enough support (the keyframe is still appended by
    _kf_fused_complete with inherited ids only). Grid layout: cameras
    padded to ``cfg.window`` (the new frame is the last real camera),
    landmark columns = [bucket-padded window landmarks | F candidate
    slots] where F is the feature capacity — candidate columns are masked
    on-device by the triangulation gate.
    """
    cfg = state.config
    kf_prev, lm_ids, fresh = _kf_inherit(state, feats, idx, valid, ref_kf)
    skip_tri = fresh.sum() < 8 or state.num_landmarks >= cfg.max_landmarks
    fresh_eff = fresh & (not skip_tri)

    window = state.keyframes[-(cfg.window - 1):] if cfg.window > 1 else []
    C = len(window) + 1
    c_new = C - 1

    id_arrays = [kf.landmark_ids[kf.landmark_ids >= 0] for kf in window]
    id_arrays.append(lm_ids[lm_ids >= 0])
    lm_set = np.unique(np.concatenate(id_arrays))
    if lm_set.size < 8 and skip_tri:
        return None, (kf_prev, lm_ids, fresh, idx, x_new, fvalid, feats, R, t)

    max_bucket = _BA_L_BUCKETS[-1]
    if lm_set.size > max_bucket:
        # keep the most-observed landmarks (ties: lowest id)
        counts = np.zeros(lm_set.size, np.int64)
        for kf in window:
            ids = kf.landmark_ids[kf.landmark_ids >= 0]
            counts += np.isin(lm_set, ids)
        counts += np.isin(lm_set, lm_ids[lm_ids >= 0])
        order = np.argsort(-counts, kind="stable")[:max_bucket]
        lm_set = np.sort(lm_set[order])
    L = lm_set.size
    Lp = next(b for b in _BA_L_BUCKETS if b >= L)
    Cp = cfg.window
    F = fresh.shape[0]

    uv = np.zeros((Cp, Lp + F, 2), np.float32)
    mask_old = np.zeros((Cp, Lp), bool)
    for c, kf in enumerate(window):
        x, fv = _kf_host_cache(state, kf)
        sel = (kf.landmark_ids >= 0) & fv & np.isin(kf.landmark_ids, lm_set)
        loc = np.searchsorted(lm_set, kf.landmark_ids[sel])
        uv[c, loc] = x[sel]
        mask_old[c, loc] = True
    # the new frame's row: inherited observations (ids known pre-fetch)
    sel_new = (lm_ids >= 0) & np.isin(lm_ids, lm_set)
    loc = np.searchsorted(lm_set, lm_ids[sel_new])
    uv[c_new, loc] = x_new[sel_new]
    mask_old[c_new, loc] = True

    # candidate columns: observed by kf_prev (when in the window) and the
    # new frame; masked on-device by the triangulation gate
    x_prev_all = _kf_host_cache(state, kf_prev)[0]
    x_new_all = x_new[np.maximum(idx, 0)]
    pot = np.zeros((Cp, F), bool)
    uv[c_new, Lp:] = x_new_all
    pot[c_new] = fresh_eff
    for c, kf in enumerate(window):
        if kf is kf_prev:
            uv[c, Lp:] = x_prev_all
            pot[c] = fresh_eff
            break

    fixed = np.ones(Cp, bool)  # padding cameras held fixed
    fixed[:C] = False
    fixed[0] = True
    if Cp > 1:
        # monocular gauge: also freeze the second camera to pin scale
        fixed[1] = True

    R_pad = np.broadcast_to(np.eye(3, dtype=np.float32), (Cp, 3, 3)).copy()
    t_pad = np.zeros((Cp, 3), np.float32)
    if window:
        R_pad[: C - 1] = np.stack([kf.R for kf in window])
        t_pad[: C - 1] = np.stack([kf.t for kf in window])
    R_pad[c_new] = np.asarray(R, np.float32)
    t_pad[c_new] = np.asarray(t, np.float32)
    X_pad = np.zeros((Lp + F, 3), np.float32)
    X_pad[:L] = state.landmarks[lm_set]

    if skip_tri:
        # no candidates: the lean BA-only dispatch (no F dead columns)
        handles = _ba_only_jit(
            jnp.asarray(R_pad), jnp.asarray(t_pad), jnp.asarray(X_pad[:Lp]),
            jnp.asarray(uv[:, :Lp]), jnp.asarray(mask_old),
            jnp.asarray(fixed),
            iterations=cfg.ba_iterations, huber_delta=cfg.huber_delta,
        )
    else:
        P1 = np.concatenate(
            [kf_prev.R, kf_prev.t[:, None]], 1
        ).astype(np.float32)
        P2 = np.concatenate(
            [np.asarray(R, np.float32), np.asarray(t, np.float32)[:, None]], 1
        )
        n_room = np.int32(cfg.max_landmarks - state.num_landmarks)
        handles = _kf_fused_jit(
            jnp.asarray(R_pad), jnp.asarray(t_pad), jnp.asarray(X_pad),
            jnp.asarray(uv), jnp.asarray(mask_old), jnp.asarray(pot),
            jnp.asarray(fixed), jnp.asarray(P1), jnp.asarray(P2),
            jnp.asarray(x_prev_all), jnp.asarray(x_new_all),
            jnp.asarray(fresh_eff), jnp.asarray(n_room),
            iterations=cfg.ba_iterations, huber_delta=cfg.huber_delta,
            tri_angle=cfg.tri_min_ray_angle_deg,
        )
    ctx = (
        window, lm_set, L, Lp, kf_prev, lm_ids, fresh, idx, x_new, fvalid,
        feats, R, t, lm_set.size >= 8, not skip_tri,
    )
    return handles, ctx


def _kf_fused_complete(state: VOState, fetched, ctx):
    """Register FETCHED candidates, append the keyframe, write back BA
    results, cull irreconcilable landmarks.

    ``ba_valid`` (from ctx): when the window carried < 8 landmarks the BA
    solve is under-constrained — candidates are registered from the RAW
    triangulation and poses/old landmarks are left untouched (the pre-
    fusion behavior, where _windowed_ba_issue declined such windows)."""
    cfg = state.config
    if fetched is None:
        kf_prev, lm_ids, fresh, idx, x_new, fvalid, feats, R, t = ctx
        _kf_append(state, feats, R, t, lm_ids, x_new, fvalid)
        return
    (window, lm_set, L, Lp, kf_prev, lm_ids, fresh, idx, x_new, fvalid,
     feats, R, t, ba_valid, has_cands) = ctx
    if has_cands:
        Rs, ts, X, mean_err, ok, Xc = (np.asarray(a) for a in fetched)
    else:
        Rs, ts, X, mean_err = (np.asarray(a) for a in fetched)
        ok, Xc = np.zeros(0, bool), None

    # register accepted candidates (ids in slot order == device cumsum rank)
    ok_slots = np.nonzero(ok)[0]
    new_ids = np.empty(0, np.int64)
    if ok_slots.size:
        # first free slots (== the old arange(num_landmarks, ...) on a pure
        # host state; correct when culled slots have left holes — VOState
        # mirrors of the device engine reuse slots, so num_landmarks is an
        # occupancy COUNT, not an allocation watermark)
        new_ids = np.nonzero(~state.landmark_valid)[0][: ok_slots.size]
        src = X[Lp + ok_slots] if ba_valid else Xc[ok_slots]
        state.landmarks[new_ids] = src
        state.landmark_valid[new_ids] = True
        state.num_landmarks = int(state.landmark_valid.sum())
        kf_prev.landmark_ids[ok_slots] = new_ids
        lm_ids[np.maximum(idx, 0)[ok_slots]] = new_ids

    _kf_append(state, feats, R, t, lm_ids, x_new, fvalid)
    state.keyframes[-1].fresh_ids = new_ids.astype(np.int64)
    if not ba_valid:
        state.track_version += 1  # fresh registrations moved the map
        return
    for c, kf in enumerate(window + [state.keyframes[-1]]):
        kf.R, kf.t = Rs[c], ts[c]
    state.landmarks[lm_set] = X[:L]

    # Cull landmarks the optimizer could not reconcile: mean reprojection
    # error beyond 3x the Huber width across their window observations
    # (mean_err computed on-device — part of the single fetch).
    bar = vo_core.cull_bar(cfg.huber_delta)
    bad_global = set(int(g) for g in lm_set[np.nonzero(mean_err[:L] > bar)[0]])
    if ok_slots.size:
        bad_cand = mean_err[Lp + ok_slots] > bar
        bad_global |= set(int(g) for g in new_ids[bad_cand])
    if bad_global:
        state.landmark_valid[list(bad_global)] = False
        for kf in state.keyframes:
            drop = np.isin(kf.landmark_ids, list(bad_global))
            kf.landmark_ids[drop] = -1
    state.track_version += 1  # poses, landmark positions, and culls moved


def process_frame(state: VOState, feats: Features) -> VOState:
    """Advance VO by one frame of features."""
    if not state.keyframes:
        n = feats.yx.shape[0]
        state.keyframes.append(
            Keyframe(
                state.frame_count,
                feats,
                np.eye(3, dtype=np.float32),
                np.zeros(3, np.float32),
                np.full(n, -1, np.int64),
            )
        )
        state.trajectory.append(
            (state.frame_count, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        )
        state.traj_ref.append(None)  # bootstrap keyframe entry
        state.frame_count += 1
        return state

    if not state.initialized:
        if not _try_initialize(state, feats):
            # hold pose at last keyframe until baseline appears
            kf = state.keyframes[-1]
            _append_traj(state, kf.R, kf.t)
        state.frame_count += 1
        return state

    return _post_track(state, feats, *_track(state, feats))


def _decide_keyframe(
    state: VOState, feats: Features, R, t, n_tracked, idx, valid, n_valid,
    flow=0.0,
):
    """Relocalization fallback + trajectory append + keyframe decision.

    Returns (R, t, idx, valid, ref_kf) when the frame should become a
    keyframe, else None. Does NOT advance frame_count."""
    ref_kf = None
    if n_tracked < 8:
        # tracking lost against the current keyframe: relocalize globally
        reloc = _relocalize(state, feats)
        if reloc is not None:
            R, t, n_tracked, idx, valid, ref_kf = reloc
            _diag(state, ev="reloc", ref_kf=int(ref_kf), n=int(n_tracked))
    if n_tracked < 8:
        # LOST (relocalization failed too). The PnP pose behind (R, t) is
        # a fit on < 8 associations — garbage. It must neither enter the
        # trajectory nor, critically, become a KEYFRAME: a garbage-pose
        # keyframe re-anchors the map at an arbitrary pose AND scale, and
        # tracking then continues happily against it — the round-4
        # campaign's discrete scale-regime failure (measured: a 1-inlier
        # promotion with baseline 42.8 at a scene cut, after which the
        # map ran at 0.6x the previous scale with no reboot ever firing).
        # Hold the last keyframe pose; after REBOOT_AFTER_LOST frames
        # re-bootstrap (scale-continuous re-init preserves the gauge).
        state.lost_streak += 1
        _diag(state, ev="lost", n=int(n_tracked), streak=state.lost_streak)
        kf = state.keyframes[-1]
        _append_traj(state, kf.R, kf.t)
        # n_valid >= 16: never re-bootstrap onto a featureless frame (a
        # blank bootstrap keyframe would strand initialization)
        if state.lost_streak >= REBOOT_AFTER_LOST and n_valid >= 16:
            # persistent loss with no relocalization match: the map is
            # unrecoverable from here (e.g. the landmark store starved or
            # the scene changed completely). Re-bootstrap a FRESH map
            # anchored at the last keyframe pose — the engine keeps
            # serving instead of appending a frozen pose forever (the
            # round-4 city-loop zombie failure), and the scale-continuous
            # re-init carries the map scale across the reset.
            _rebootstrap(state, feats)
        return None
    state.lost_streak = 0
    _append_traj(state, R, t)

    gap = state.frame_count - state.keyframes[-1].index
    flow_thresh = state.config.kf_min_flow_norm
    needs_kf = (
        n_tracked < state.config.track_min_landmarks
        or gap >= state.config.kf_max_gap
        or (flow_thresh > 0.0 and flow > flow_thresh)
    )
    # never promote a degenerate frame (blackout/blur): a featureless
    # keyframe would become the tracking reference and strand the VO
    # (n_valid came back in the fused track fetch — no extra RTT)
    has_content = n_valid >= 16
    if needs_kf and has_content:
        return R, t, idx, valid, ref_kf
    return None


def _rebootstrap(state: VOState, feats: Features) -> None:
    """Restart the map after persistent tracking loss (lost_streak).

    Appends ``feats`` as a fresh bootstrap keyframe at the last keyframe
    pose and drops back to the two-view initialization state; existing
    keyframes/trajectory/landmarks stay for output and later loop
    closure. The next frames run the normal init machinery."""
    kf = state.keyframes[-1]
    n = feats.yx.shape[0]
    state.keyframes.append(
        Keyframe(
            state.frame_count, feats, kf.R.copy(), kf.t.copy(),
            np.full(n, -1, np.int64),
        )
    )
    state.initialized = False
    state.lost_streak = 0
    state.track_version += 1
    _diag(state, ev="reboot", n_kf=len(state.keyframes))


def _diag(state: VOState, **ev) -> None:
    """Append a diagnostic event when VOState.diag is installed."""
    if state.diag is not None:
        ev.setdefault("f", state.frame_count)
        state.diag.append(ev)


def median_speed(state: VOState) -> Optional[float]:
    """Rolling-median per-frame speed (map units/frame) over the last
    ``speed_prior_window`` accepted promotions; None below 8 samples."""
    hist = state.kf_baselines
    if len(hist) < 8:
        return None
    return float(np.median(hist[-state.config.speed_prior_window:]))


def apply_speed_prior(state: VOState, fresh_ids=None) -> bool:
    """Record the newest keyframe's per-frame speed; when the kinematic
    band (VOConfig.speed_prior_band) is enabled, clamp the baseline into
    [lo, hi] x rolling-median-speed x frame-gap first. Returns True when
    a correction applied.

    On violation, the promotion INCREMENT is rescaled about the previous
    keyframe's center: the new pose moves to the clamped baseline and
    ``fresh_ids`` landmarks (this promotion's fresh triangulations, whose
    depths encode the bad baseline) rescale with it; pre-existing
    landmarks keep their positions. The rolling median then absorbs the
    corrected value, bounding cumulative runaway drift per window.

    Speeds (baseline / frame gap) rather than raw baselines make the
    history gap-policy-independent: parallax-driven keyframing promotes
    at variable gaps, and a vehicle's bounded acceleration bounds speed,
    not inter-keyframe distance."""
    if len(state.keyframes) < 2:
        return False
    lo, hi = state.config.speed_prior_band
    if state.config.ground_height_m > 0:
        # governor precedence: the ground prior is an ABSOLUTE reference;
        # the speed band is RELATIVE (rolling median) and encodes drifted
        # scale, so stacking them makes the band fight every ground
        # correction (measured: 33 clamps collapsed a ground-held run to
        # 0.03x). With ground active the speed prior records only.
        hi = 0.0
    kf, prev = state.keyframes[-1], state.keyframes[-2]
    gap = max(kf.index - prev.index, 1)
    c_prev = -prev.R.T @ prev.t
    c_new = -kf.R.T @ kf.t
    b = float(np.linalg.norm(c_new - c_prev))
    med = median_speed(state)
    corrected = False
    if hi > 0 and med is not None:
        b_cl = float(np.clip(b, lo * med * gap, hi * med * gap))
        if b > 1e-12 and abs(b_cl - b) > 1e-9 * med:
            r = b_cl / b
            c_corr = c_prev + (c_new - c_prev) * r
            kf.t = (-kf.R @ c_corr).astype(np.float32)
            if fresh_ids is not None and len(fresh_ids):
                X = state.landmarks[fresh_ids]
                state.landmarks[fresh_ids] = (
                    c_prev + (X - c_prev) * r
                ).astype(np.float32)
            state.trajectory[-1] = (state.frame_count, kf.R.copy(), kf.t.copy())
            state.track_version += 1
            _diag(state, ev="speed_prior", b=b, b_clamped=b_cl, gap=gap)
            b = b_cl
            corrected = True
    hist = state.kf_baselines
    hist.append(b / gap)
    if len(hist) > 4 * state.config.speed_prior_window:
        del hist[: -2 * state.config.speed_prior_window]
    return corrected


def ground_violation(config: VOConfig, h_obs: float) -> bool:
    """Does a height observation warrant a ground-prior correction?
    Pure host arithmetic — the fleet uses it to decide whether a promoted
    row needs its map gathered at all (deadband hits cost nothing)."""
    target = config.ground_height_m
    if target <= 0.0 or h_obs <= 1e-9:
        return False
    return abs(np.log(target / float(h_obs))) >= GROUND_DEADBAND


def smoothed_ground(state: VOState, h_obs: float) -> float:
    """Record a ground-height observation; return the rolling median-of-3
    the controller corrects against (balances the +-10-20 % single-frame
    cluster noise against control lag — longer medians measurably
    oscillated; see GROUND_GAIN)."""
    state.ground_hist.append(float(h_obs))
    del state.ground_hist[:-9]
    return float(np.median(state.ground_hist[-3:]))


def ground_correction_ratio(config: VOConfig, h_sm: float):
    """The shared control law: smoothed height observation -> scale step.

    Returns the per-promotion correction ratio r (apply as a similarity
    about the newest camera center), or None inside the deadband.
    Proportional on the LOG error with gain GROUND_GAIN, capped at
    GROUND_MAX_STEP near convergence and GROUND_MAX_STEP_FAR while far
    (the init transient). Both engines' controllers call this."""
    target = config.ground_height_m
    if target <= 0.0 or h_sm <= 1e-9:
        return None
    e = float(np.log(target / h_sm))
    if abs(e) < GROUND_DEADBAND:
        return None
    cap = GROUND_MAX_STEP_FAR if abs(e) > GROUND_FAR else GROUND_MAX_STEP
    return float(np.exp(np.clip(GROUND_GAIN * e, -cap, cap)))


def apply_ground_prior(state: VOState, h_obs: float) -> bool:
    """Hold map scale to the ground-plane reference (config.ground_height_m).

    ``h_obs``: the fused track step's median camera-frame height of
    bottom-of-image tracked landmarks (vo_core.ground_height_obs), in map
    units. When it deviates from the rig's known height by more than
    GROUND_DEADBAND (log-ratio), the WHOLE live map — every keyframe pose
    and every live landmark — is rescaled about the newest camera center
    by r = clamp(target / h_obs, 1 +- GROUND_MAX_STEP).

    A global similarity is a GAUGE transform of the reprojection
    objective: every residual is exactly invariant, so windowed BA cannot
    fight the correction (rescaling only the promotion increment, by
    contrast, leaves the new pose constrained by old-scale landmarks and
    the next BA largely reverts it). Scaling about the newest center
    keeps the current pose fixed — no trajectory jump — and finalize()
    re-anchors non-keyframe trajectory entries onto the corrected
    keyframe poses exactly as it does after a Sim(3) loop closure."""
    target = state.config.ground_height_m
    if target <= 0.0 or h_obs <= 1e-9 or not state.keyframes:
        return False
    r = ground_correction_ratio(
        state.config, smoothed_ground(state, h_obs)
    )
    if r is None:
        return False
    kf = state.keyframes[-1]
    c0 = -kf.R.T @ kf.t
    # rescale ONLY what windowed BA sees: the window keyframes + the live
    # map. Out-of-window keyframes keep their at-time poses — corrections
    # must not rewrite history (rescaling every keyframe compounded the
    # per-correction product into the EARLY trajectory: measured 2.4x
    # inflation of the first segments over a 76-correction run); global
    # reconciliation across epochs is the loop closures' job.
    for k in state.keyframes[-state.config.window:]:
        c = c0 + ((-k.R.T @ k.t) - c0) * r
        k.t = (-k.R @ c).astype(np.float32)
    live = state.landmark_valid
    state.landmarks[live] = (
        c0 + (state.landmarks[live] - c0) * r
    ).astype(np.float32)
    state.track_version += 1
    state.trajectory[-1] = (state.frame_count, kf.R.copy(), kf.t.copy())
    _diag(state, ev="ground", h=float(h_obs), r=r)
    return True


def _fresh_ids_of_last_kf(state: VOState) -> np.ndarray:
    """This promotion's fresh triangulations (Keyframe.fresh_ids).

    Recorded at registration time — an observation-table recomputation
    cannot work, because fresh ids are registered into the PREVIOUS
    keyframe's table in the same promotion (both engines) and so appear
    'already seen' immediately."""
    ids = state.keyframes[-1].fresh_ids
    return ids if ids is not None else np.empty(0, np.int64)


def _keyframe_epilogue(state: VOState, ground_h: float = 0.0) -> None:
    """Loop closure + trajectory sync after a keyframe's windowed BA."""
    if state.config.ground_height_m > 0 and ground_h > 0:
        # absolute scale first, so the speed prior records corrected speeds
        apply_ground_prior(state, ground_h)
    if state.config.speed_prior_band[1] > 0:
        apply_speed_prior(state, fresh_ids=_fresh_ids_of_last_kf(state))
    else:
        apply_speed_prior(state)  # record-only: feeds scale-continuous init
    if state.config.loop_closure:
        import time as _time

        from cvsteer_tpu.slam.loopclosure import close_loops, close_loops_sim3

        closer = (
            close_loops_sim3 if state.config.loop_closure_sim3 else close_loops
        )
        t0 = _time.perf_counter()
        n_closed = closer(
            state,
            min_gap=state.config.loop_min_gap,
            min_inliers=state.config.loop_min_inliers,
            huber_delta=state.config.loop_robust_delta,
            signature_threshold=state.config.loop_signature_threshold,
        )
        if state.diag is not None:
            _diag(
                state, ev="closure", accepted=int(n_closed or 0),
                K=len(state.keyframes),
                solve_ms=round((_time.perf_counter() - t0) * 1e3, 2),
            )
        state.track_version += 1  # closure may rewrite poses + landmarks
    kf = state.keyframes[-1]
    # the windowed BA just refined this pose — reflect it in the trajectory
    state.trajectory[-1] = (state.frame_count, kf.R.copy(), kf.t.copy())
    if state.traj_ref:
        state.traj_ref[-1] = None  # keyframe entry: anchored to itself


def _post_track(
    state: VOState, feats: Features, R, t, n_tracked, idx, valid, n_valid,
    x_new=None, fvalid=None, flow=0.0, ground_h=0.0,
) -> VOState:
    """Everything after the fused tracking fetch: relocalization fallback,
    trajectory append, keyframe promotion, loop closure. Shared by the
    sequential loop (process_frame) and the batched server (vo_server).
    ``x_new``/``fvalid`` (from the track fetch) spare the promotion its
    pixel round-trip."""
    req = _decide_keyframe(
        state, feats, R, t, n_tracked, idx, valid, n_valid, flow=flow
    )
    if req is not None:
        R2, t2, idx2, valid2, ref_kf = req
        _add_keyframe(
            state, feats, R2, t2, idx2, valid2, ref_kf=ref_kf,
            x_new=x_new, fvalid=fvalid,
        )
        _keyframe_epilogue(state, ground_h=ground_h)
        if state.diag is not None and len(state.keyframes) >= 2:
            kf, prev = state.keyframes[-1], state.keyframes[-2]
            _diag(
                state, ev="kf", n_kf=len(state.keyframes),
                b=float(np.linalg.norm(-kf.R.T @ kf.t + prev.R.T @ prev.t)),
                gap=int(kf.index - prev.index), n_tracked=int(n_tracked),
                reason=(
                    "track"
                    if n_tracked < state.config.track_min_landmarks
                    else "gap"
                ),
                fresh=int(
                    (kf.landmark_ids >= 0).sum()
                    - np.isin(
                        kf.landmark_ids, prev.landmark_ids[
                            prev.landmark_ids >= 0
                        ]
                    ).sum()
                ),
            )
    state.frame_count += 1
    return state


def finalize(state: VOState) -> VOState:
    """Propagate the latest keyframe refinements into the trajectory.

    Keyframe entries take their keyframes' final poses. Non-keyframe
    entries are RE-ANCHORED onto their reference keyframe's final pose via
    the relative pose stored at track time (VOState.traj_ref), with the
    relative translation scaled by the local inter-keyframe baseline ratio
    b_new/b_old — so Sim(3) loop-closure corrections (rotation,
    translation AND scale) propagate to the whole trajectory instead of
    only its keyframe third.
    """
    by_frame = {kf.index: kf for kf in state.keyframes}
    refs = state.traj_ref
    for i, (f, R, t) in enumerate(state.trajectory):
        if f in by_frame:
            kf = by_frame[f]
            state.trajectory[i] = (f, kf.R.copy(), kf.t.copy())
            continue
        if i < len(refs) and refs[i] is not None:
            ref, R_rel, t_rel, pidx, b_old = refs[i]
            kf = by_frame.get(ref)
            if kf is None:
                continue  # reference culled: keep the tracked pose
            s = 1.0
            pkf = by_frame.get(pidx)
            if pkf is not None and b_old > 1e-9:
                c0 = -kf.R.T @ kf.t
                c1 = -pkf.R.T @ pkf.t
                s = float(
                    np.clip(np.linalg.norm(c0 - c1) / b_old, 1e-3, 1e3)
                )
            Rn = (R_rel @ kf.R).astype(np.float32)
            tn = (R_rel @ kf.t + s * t_rel).astype(np.float32)
            state.trajectory[i] = (f, Rn, tn)
    return state


@functools.partial(jax.jit, static_argnames=("cfg",))
def _extract_features_jit(image, cfg: FrontendConfig):
    # accept uint8 and cast ON DEVICE: callers ship camera frames over
    # the tunnel at 1 byte/px instead of 4 (the host->device image
    # transfer was ~30 ms/frame of the campaign loop as float32)
    return extract_features(image.astype(jnp.float32), cfg=cfg)


def process_image(state: VOState, image: jax.Array) -> VOState:
    feats = _extract_features_jit(image, state.config.frontend)
    return process_frame(state, feats)
