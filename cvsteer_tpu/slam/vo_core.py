"""Shared VO numeric core: the single home of every rule both engines apply.

The host-driven loop (slam.vo) and the device-resident engine
(slam.vo_device) implement the same per-frame numerics with different data
plumbing (host numpy tables + fused jit calls vs a device pytree carry).
Round 3's fleet-tail fixes (HIGHEST-precision jit boundaries, SVD refit,
MSAC tie-breaks) had to be applied in both files; this module extracts the
shared rules so the next numerics fix is a ONE-place edit (VERDICT r3
item 8). Host-twin tests (tests/test_vo_device.py) keep guarding parity.

Contents:
- :func:`pnp_dual_refine` — motion-only PnP with the dual-initialization
  select (prediction vs keyframe pose) both tracking steps run.
- :func:`triangulation_gate` — cheirality + bounds acceptance for fresh
  landmark candidates (the depth/coordinate constants live here).
- :func:`masked_mean_reproj` — per-landmark-column mean reprojection error
  of a BA solution (the culling signal).
- :func:`cull_bar` — the reprojection-error culling threshold rule.
- :func:`predict_const_velocity` — constant-velocity pose extrapolation
  with the shared plausibility guards (jnp; the host loop's numpy twin in
  slam.vo uses the same MAX_* constants).

Reference analog: none — the reference is a single-image filter library
(SURVEY.md scope note); these rules belong to the north-star SLAM
superstructure (BASELINE configs 4-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvsteer_tpu.slam.ba import refine_pose
from cvsteer_tpu.slam.ba import residuals as ba_residuals

# --- shared constants -------------------------------------------------------

#: minimum triangulated depth (in either view) for a landmark candidate
MIN_TRI_DEPTH = 1e-3
#: maximum |coordinate| for a triangulated landmark (rejects near-infinity
#: points from near-parallel rays)
MAX_LM_COORD = 1e4
#: constant-velocity guard: reject per-frame rotations beyond this
MAX_PRED_ROT_DEG = 30.0
#: constant-velocity guard: reject per-frame translations beyond this
MAX_PRED_SHIFT = 10.0

# --- ground-prior control law (see slam.vo.apply_ground_prior) -------------
#: ignore scale errors below this log-ratio
GROUND_DEADBAND = 0.015
#: proportional gain on the log-scale error (half gain: full-gain
#: corrections limit-cycled +-15 % against the +-10-20 % observation noise)
GROUND_GAIN = 0.5
#: per-promotion step cap near convergence (log-ratio)
GROUND_MAX_STEP = 0.05
#: FAR regime threshold and its larger step cap (init transient crawl-out)
GROUND_FAR = 0.15
GROUND_MAX_STEP_FAR = 0.15


def ground_controller(h_obs, do_obs, hist, *, target):
    """Device-side ground-prior step: (hist', r).

    ``h_obs`` this frame's height observation (0 = none), ``do_obs``
    whether to record it (promotion with a valid cluster), ``hist [3]``
    the rolling observation window carried in the device state. Returns
    the updated window and the correction ratio r to apply as a
    similarity about the newest camera center (1.0 inside the deadband
    or while the window is cold). jnp twin of the host law
    (slam.vo.ground_correction_ratio + smoothed_ground); keeping it in
    the fused step makes a correction ZERO extra dispatches and exactly
    frame-aligned (the host-driven variant is one event dispatch and one
    frame stale)."""
    hist2 = jnp.where(
        do_obs, jnp.roll(hist, 1).at[0].set(h_obs), hist
    )
    h_sm = jnp.sort(hist2)[1]  # median of 3; 0 while any slot is cold
    e = jnp.where(
        h_sm > 1e-9, jnp.log(target / jnp.maximum(h_sm, 1e-9)), 0.0
    )
    cap = jnp.where(
        jnp.abs(e) > GROUND_FAR, GROUND_MAX_STEP_FAR, GROUND_MAX_STEP
    )
    r = jnp.exp(jnp.clip(GROUND_GAIN * e, -cap, cap))
    apply = do_obs & (jnp.abs(e) >= GROUND_DEADBAND)
    return hist2, jnp.where(apply, r, 1.0)


def pnp_dual_refine(
    X, uv, use, Rp, tp, R1, t1,
    *, iterations, huber_delta, min_track, dual_init, lam0=1e-4,
):
    """Motion-only PnP with the shared dual-initialization select.

    Refines from the prediction (Rp, tp); when ``dual_init`` (static) also
    refines from the reference pose (R1, t1) and falls back to it on-device
    exactly as the original host retry did: when the prediction yields
    < ``min_track`` inliers and the reference init does better. Returns
    (R, t, n_inliers). Both engines' tracking steps call this
    (slam/vo.py::_track_fused_jit, slam/vo_device.py::_track_phase).
    """
    R, t, inl = refine_pose(
        X, uv, use, Rp, tp,
        iterations=iterations, huber_delta=huber_delta, lam0=lam0,
    )
    n = jnp.sum(inl)
    if dual_init:  # static branch
        Rb, tb, ib = refine_pose(
            X, uv, use, R1, t1,
            iterations=iterations, huber_delta=huber_delta, lam0=lam0,
        )
        nb = jnp.sum(ib)
        pick_b = (n < min_track) & (nb > n)
        R = jnp.where(pick_b, Rb, R)
        t = jnp.where(pick_b, tb, t)
        n = jnp.where(pick_b, nb, n)
    return R, t, n


def guided_rescue(
    desc_a, valid_a, X_slots, sel_slots, desc_b, valid_b, uv_all,
    idx, R, t, *, radius_norm, min_sim,
):
    """Projective rescue of unmatched landmark-bearing keyframe features.

    The mutual-ratio match (features.matching.match_descriptors) drops
    ambiguous pairs; on self-similar texture this turns over ~half the
    tracked landmarks every keyframe, and every re-triangulation re-draws
    its depth from the noise-truncated low-parallax distribution — the
    measured city-loop scale collapse (-0.8 %/keyframe from ~50 % churn x
    ~1.5 % fresh-depth near-bias, compounding to e^-8 over 4,200 frames;
    scripts/probe_tri_bias.py). Rescue pass, as in standard projective
    local-map search: project each unmatched keyframe feature's landmark
    with the refined pose (R, t) and accept the MUTUALLY-best frame
    feature within ``radius_norm`` of the projection whose descriptor
    cosine clears ``min_sim`` — the spatial gate replaces the ratio test,
    which inside a small window rejects only true self-similarity.

    ``idx [A]``: ratio-test match (keyframe feature -> frame feature index
    or -1). Rescues never displace ratio matches or already-claimed frame
    features. Returns the merged ``idx2 [A]``.
    """
    B = desc_b.shape[0]
    claimed = jnp.zeros((B,), bool).at[
        jnp.where(idx >= 0, idx, B)
    ].set(True, mode="drop")
    p = X_slots @ R.T + t
    z = p[:, 2]
    uv_pred = p[:, :2] / jnp.maximum(z[:, None], 1e-6)
    elig_a = valid_a & sel_slots & (idx < 0) & (z > MIN_TRI_DEPTH)
    elig_b = valid_b & ~claimed
    d2 = jnp.sum(
        (uv_pred[:, None, :] - uv_all[None, :, :]) ** 2, -1
    )  # [A, B]
    sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    ok = (
        elig_a[:, None] & elig_b[None, :]
        & (d2 < radius_norm * radius_norm) & (sim > min_sim)
    )
    s = jnp.where(ok, sim, -2.0)
    best_j = jnp.argmax(s, axis=1)  # [A]
    best_i = jnp.argmax(s, axis=0)  # [B]
    hit = jnp.take_along_axis(s, best_j[:, None], 1)[:, 0] > -2.0
    mutual = best_i[best_j] == jnp.arange(s.shape[0])
    rescued = hit & mutual
    return jnp.where(rescued, best_j, idx)


def triangulation_gate(Xc, P1, P2, min_ray_angle_deg: float = 1.0):
    """Acceptance mask for triangulated candidates: positive depth in BOTH
    views, bounded coordinates, and sufficient RAY ANGLE between the two
    observing views. ``Xc [F, 3]`` in the projection frame; P1/P2 are
    [3, 4] world->camera projection matrices.

    The ray-angle gate is the monocular scale-stability guard (round 4):
    under forward motion the epipole sits mid-image, and points near it
    triangulate with ~zero parallax — their depths are noise-dominated
    and systematically biased, and feeding them to PnP collapses the map
    scale within tens of keyframes (measured on the city-loop sequence:
    est/gt step ratio 1.2 -> 0.0 in 70 frames without the gate). Lateral
    motion is unaffected (typical ray angles are degrees). Set
    ``min_ray_angle_deg=0`` to disable (static; compile-time constant).
    """
    z1 = Xc @ P1[2, :3] + P1[2, 3]
    z2 = Xc @ P2[2, :3] + P2[2, 3]
    ok = (
        (z1 > MIN_TRI_DEPTH)
        & (z2 > MIN_TRI_DEPTH)
        & (jnp.abs(Xc) < MAX_LM_COORD).all(1)
    )
    if float(min_ray_angle_deg) > 0.0:  # static branch
        C1 = -P1[:3, :3].T @ P1[:3, 3]
        C2 = -P2[:3, :3].T @ P2[:3, 3]
        r1 = Xc - C1
        r2 = Xc - C2
        cos = jnp.sum(r1 * r2, -1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
        )
        ok = ok & (cos < jnp.cos(jnp.deg2rad(min_ray_angle_deg)))
    return ok


def ground_height_obs(X, use, v_pix, R, t, cy, *, min_pts=8):
    """Median camera-frame height of bottom-of-image tracked landmarks.

    The ground-plane scale observation (standard automotive monocular-VO
    scale anchoring: the camera's height above the road is rig-constant,
    so the median y_c of ground landmarks measures the map's CURRENT
    metric scale every frame — an ABSOLUTE reference that, unlike any
    relative band, cannot drift with the map). For a roll/pitch-free rig
    every ground point satisfies y_c == cam_height exactly, independent
    of depth; moderate pitch adds a depth-dependent term the median
    tolerates. Selection: tracked associations whose observing pixel sits
    in the bottom of the image (v > 1.25 * cy, i.e. the bottom ~37% for a
    centered principal point), with positive height and depth.

    ``X [A, 3]`` slot landmark positions, ``use [A]`` tracked-inlier
    mask, ``v_pix [A]`` the observing pixel's row in the CURRENT frame,
    (R, t) the refined pose. Returns the height of the dominant
    consistent-height cluster, or 0.0 when fewer than ``min_pts`` points
    support it (caller skips the update). Shared by both engines' fused
    track steps.

    Cluster, not median: the below-horizon region also contains WALL
    points below camera height, whose y_c spreads over (0, h] and drags
    a plain median low (measured: a 0.76x steady-state scale error on
    the city loop). Ground points all share y_c == h exactly, so the
    MODE of the height distribution is the ground: each point votes for
    the points within a +-8 % relative band of its own height, the
    best-supported point wins, and the estimate is the mean of its band
    ([A, A] mask matmul — one MXU op at A <= 1024)."""
    p = X @ R.T + t
    y = p[:, 1]
    sel = (
        use & (v_pix > 1.25 * cy) & (y > 1e-3) & (p[:, 2] > MIN_TRI_DEPTH)
    )
    pair_ok = (
        (jnp.abs(y[None, :] - y[:, None]) < 0.08 * y[:, None])
        & sel[None, :] & sel[:, None]
    )
    score = jnp.sum(pair_ok.astype(jnp.float32), axis=1)  # [A] votes
    best = jnp.argmax(score)
    band = pair_ok[best]
    cnt = jnp.sum(band.astype(jnp.float32))
    h = jnp.sum(jnp.where(band, y, 0.0)) / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt >= min_pts, h, 0.0)


def masked_mean_reproj(final, problem):
    """[L] mask-weighted mean reprojection-error norm per landmark column
    of a BA solution — the shared culling signal (zero where unobserved)."""
    r, _w = ba_residuals(final, problem)
    rn = jnp.linalg.norm(r, axis=-1)
    m = problem.mask.astype(rn.dtype)
    obs = m.sum(axis=0)
    return jnp.where(obs > 0, (rn * m).sum(axis=0) / jnp.maximum(obs, 1.0), 0.0)


def cull_bar(huber_delta) -> float:
    """Reprojection-error culling threshold: 3x the Huber width, floored.
    (Python floats; evaluated at trace time — both engines' rule.)"""
    return 3.0 * max(float(huber_delta), 1e-4)


def signature_device(desc, valid):
    """Keyframe global-descriptor signature: mean of valid local
    descriptors, L2-normalized — computed on device (no fetch). The numpy
    twin is slam.loopclosure.keyframe_signature; the device engine's
    in-step closure detection (slam.vo_device) and the host
    SignatureIndex (slam.loopclosure) both call this."""
    cnt = jnp.sum(valid.astype(jnp.float32))
    s = jnp.sum(jnp.where(valid[..., None], desc, 0.0), axis=-2)
    s = s / jnp.maximum(cnt, 1.0)
    n = jnp.linalg.norm(s)
    return jnp.where(n > 1e-9, s / jnp.maximum(n, 1e-30), s)


def closure_candidates(sigs, sig_new, j, *, min_gap, top):
    """Top-``top`` closure candidate rows for a NEW keyframe that will
    take index ``j``, against signature-store rows [0, j - min_gap].
    Returns (idx [top], score [top]); masked rows score -inf. The shared
    detection rule of the in-step device path and the host index query."""
    s = sigs @ sig_new
    rows = jnp.arange(sigs.shape[0])
    s = jnp.where(rows <= j - min_gap, s, -jnp.inf)
    score, idx = jax.lax.top_k(s, top)
    return idx, score


def predict_const_velocity(R1, t1, R0, t0, traj_n, kfR, kft):
    """Constant-velocity pose extrapolation with plausibility guards.

    Applies the last inter-frame motion once more; falls back to the
    keyframe pose (kfR, kft) when fewer than two finite trajectory entries
    exist or the implied per-frame motion exceeds the MAX_PRED_* bounds
    (a bad track must not feed back into diverging predictions). jnp
    implementation used by the device engine; slam.vo._predict_pose is the
    numpy twin over host mirrors and shares the constants.
    """
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    cos = jnp.clip(0.5 * (jnp.trace(R_rel) - 1.0), -1.0, 1.0)
    fin = (
        jnp.isfinite(R1).all() & jnp.isfinite(t1).all()
        & jnp.isfinite(R0).all() & jnp.isfinite(t0).all()
    )
    ok = (
        (traj_n >= 2) & fin
        & (jnp.degrees(jnp.arccos(cos)) <= MAX_PRED_ROT_DEG)
        & (jnp.linalg.norm(t_rel) <= MAX_PRED_SHIFT)
    )
    Rp = jnp.where(ok, R_rel @ R1, kfR)
    tp = jnp.where(ok, R_rel @ t1 + t_rel, kft)
    return Rp, tp
