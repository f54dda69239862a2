"""KITTI-00-scale full-stack SLAM run -> SLAM_r04.json (VERDICT r3 item 1).

BASELINE configs 4-5 name TUM-RGBD / KITTI; the container has no network
egress (the fetch attempt is re-run and logged into the artifact), so this
drives the FULL production stack at KITTI-00 scale on the prescribed
fallback: the real-texture synthetic city loop (cvsteer_tpu.io.synth) —
thousands of frames, 1,000+ keyframes, street-revisit loop closures.

The run exercises every serving-path subsystem end to end, on the real
TPU chip when available:
- image front-end (fused Pallas feature kernel) per frame,
- the device-resident VO engine (one dispatch + one fetch per frame),
- in-step closure detection (signature store in DeviceMap) + vmapped
  geometric verification + Sim(3) pose-graph optimization at P >= 1,000,
- landmark store growth + culling at Lmax = 65,536,
- a MID-RUN checkpoint and a separate resume leg that restores it and
  keeps tracking.

The ATE gate follows tests/test_cli_vo.py's geometry-derived bound, with
every input MEASURED FROM THE RUN (sigma_px from keyframe reprojection
residuals, N_lm from per-frame PnP inlier counts, Z from landmark depths,
B_kf from ground-truth keyframe baselines) instead of assumed constants.

Usage: python scripts/slam_scale_run.py [--frames 2400] [--platform cpu]
       [--output SLAM_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log_fetch_attempt() -> dict:
    """Re-attempt the real-dataset fetch's DNS step and record the result."""
    host = "cvg.cit.tum.de"
    t0 = time.time()
    try:
        socket.setdefaulttimeout(10)
        addr = socket.gethostbyname(host)
        return {"attempted": True, "host": host, "resolved": addr,
                "note": "network reachable — run scripts/fetch_datasets.sh"}
    except OSError as e:
        return {
            "attempted": True, "host": host, "resolved": None,
            "error": f"{type(e).__name__}: {e}",
            "elapsed_s": round(time.time() - t0, 2),
            "note": "no egress; falling back to the real-texture synthetic "
                    "city loop (cvsteer_tpu.io.synth.CityLoop)",
        }


def _summarize_diag(diag) -> dict:
    """Event summary for the artifact: counts per event class, every
    closure event with its measured sync/solve cost (VERDICT r4 item 6),
    and the scale-governor correction stats."""
    diag = diag or []
    by = {}
    for e in diag:
        by.setdefault(e["ev"], []).append(e)
    grounds = by.get("ground", [])
    rejects = by.get("closure_reject", [])
    return {
        "counts": {k: len(v) for k, v in by.items()},
        "closure_reject_stages": {
            st: sum(1 for e in rejects if e["stage"] == st)
            for st in ("verify", "edge_scale", "post_solve", "scale_sanity")
        },
        "closure_events": [
            {"f": e["f"], "accepted": e["accepted"], "K": e["K"],
             "sync_ms": e.get("sync_ms"), "solve_ms": e.get("solve_ms")}
            for e in by.get("closure", [])
        ],
        # what each ACCEPTED solve did: recovered scale range, worst
        # keyframe displacement, per-edge gap closed (loopclosure diag)
        "closure_solves": [
            {k: e[k] for k in
             ("f", "sn_min", "sn_max", "d_center_max", "edges")}
            for e in by.get("closure_solve", [])
        ],
        "ground_corrections": {
            "n": len(grounds),
            "r_min": round(min(e["r"] for e in grounds), 4) if grounds else None,
            "r_max": round(max(e["r"] for e in grounds), 4) if grounds else None,
        },
        "speed_prior_clamps": len(by.get("speed_prior", [])),
        "lost_frames": len(by.get("lost", [])),
        "reboots": len(by.get("reboot", [])),
        "relocalizations": len(by.get("reloc", [])),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2400)
    ap.add_argument("--laps", type=float, default=None,
                    help="default scales with --frames to hold the "
                    "canonical 0.194 m/frame (1.75 laps at 4200 frames); "
                    "a short trial otherwise drives proportionally "
                    "FASTER around the same circuit and measures a "
                    "different, much harder problem")
    ap.add_argument("--output", default="SLAM_r04.json")
    ap.add_argument("--platform", default="default",
                    help="'cpu' forces the CPU backend (smoke runs)")
    ap.add_argument("--checkpoint-dir", default="/tmp/slam_scale_ckpt")
    ap.add_argument("--chunk", type=int, default=4,
                    help="frames per fused device dispatch (lax.scan "
                    "chunk; 1 = per-frame stepping). The tunnel charges "
                    "~90 ms of dispatch+fetch overhead per frame "
                    "sequentially; chunking divides it by N")
    ap.add_argument("--resume-frames", type=int, default=200)
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvsteer_tpu.geometry.camera import Intrinsics
    from cvsteer_tpu.io.synth import CityLoop
    from cvsteer_tpu.slam import vo as hostvo
    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.vo import VOConfig
    from cvsteer_tpu.slam.vo_device import DeviceVO
    from cvsteer_tpu.utils.checkpoint import SlamCheckpointer
    from cvsteer_tpu.utils.profiling import device_memory_stats

    fetch = log_fetch_attempt()
    print(f"dataset fetch: {fetch}", file=sys.stderr)

    from cvsteer_tpu.features.frontend import FrontendConfig

    if args.laps is None:
        args.laps = 1.75 * args.frames / 4200.0
    seq = CityLoop(n_frames=args.frames, laps=args.laps)
    fx, fy, cx, cy = seq.intrinsics4
    # Tuned on 250-frame probes (round 4): upright descriptors (roll-
    # stable driving rig; theta jitter was the dominant decorrelation),
    # ratio 0.80, 25 BA iterations (BA fights the forward-motion scale
    # shrink), 0.35 deg triangulation ray-angle gate.
    # Round-4 scale-drift campaign (probe_tri_bias + the cliff probes):
    # guided rescue at 8 px (halves the healthy-regime decay), window 12,
    # gap 3, and tri gate 0.7 deg — the last one is the CLIFF guard: at
    # 0.35 the end-of-street approach (all features near the FOE) admits
    # a generation of noise-shell triangulations and the map scale
    # collapses 75x in ~25 frames (measured frames 412-439); 0.7 blocks
    # the shell with no measurable cost on healthy ground (ATE 1.17 vs
    # 1.13 on the early window) while 1.2 starves tracking outright.
    # Round-5 config. The round-4 campaign failed its gate on monocular
    # scale instability (SLAM_r04.json: ATE 36.6 vs bound 5.8, scale
    # regimes 0.04x-2x); the diagnosis (scripts/probe_scale_campaign.py,
    # probe_tri_bias.py) found three mechanisms, each now countered:
    #  1. garbage keyframes promoted during tracking loss re-anchored the
    #     map at arbitrary scale -> promotion now requires a sane track
    #     (vo._decide_keyframe), re-inits are scale-continuous;
    #  2. a smooth -0.46 %/keyframe multiplicative decay from fresh-
    #     triangulation depth bias -> the ground-plane height prior
    #     (ground_height_m; the rig height is part of config 4/5's
    #     calibration, as in automotive monocular VO) holds absolute
    #     scale with gauge-exact window rescales;
    #  3. rejected ~700 ms closure verifications nearly every promotion
    #     -> temporal-consistency gate + rejected-region cooldown.
    # Keyframing stays at gap 3: the 600-frame A/B (probe_scale_campaign)
    # measured ATE 0.61 m at gap 3 + ground prior vs 10.6 m at
    # flow-driven gap<=12 — sparse keyframes starve both tracking (53/86
    # track-loss promotions) and the ground observation itself (needs
    # >= 8 bottom-image tracked inliers), so dense cadence WINS once the
    # ground prior owns scale. The speed prior records only (governor
    # precedence — vo.apply_speed_prior) and re-arms if ground is off.
    cfg = VOConfig(
        intrinsics=Intrinsics(fx, fy, cx, cy),
        frontend=FrontendConfig(upright_desc=True),
        kf_max_gap=3,
        window=12,
        track_min_landmarks=40,
        min_parallax=0.03,
        match_ratio=0.80,
        ba_iterations=25,
        tri_min_ray_angle_deg=0.7,
        rescue_radius_px=8.0,
        max_landmarks=262144,
        loop_closure=True,
        loop_closure_sim3=True,
        loop_min_gap=50,
        loop_cooldown=25,
        loop_sig_capacity=4096,
        loop_signature_threshold=0.8,
        loop_consistency=2,
        loop_reject_cooldown=15,
        ground_height_m=1.5,
        speed_prior_band=(0.5, 2.0),
    )
    from cvsteer_tpu.utils.profiling import MemoryHighWater

    vo = DeviceVO(cfg)
    vo.state.diag = []  # event log: closures, ground/speed corrections
    ckpt = SlamCheckpointer(args.checkpoint_dir)
    ckpt_frame = args.frames // 2
    highwater = MemoryHighWater()

    n_tracked_hist = []
    promoted_frames = []
    # host-side per-phase profile (VERDICT r4 item 4): where each frame's
    # wall time goes — render / feature dispatch / step dispatch / fetch /
    # host completion (promotions, closures, priors live inside complete)
    phase = {"render": 0.0, "features": 0.0, "issue": 0.0,
             "fetch": 0.0, "complete": 0.0, "bootstrap": 0.0}
    ckpt_s = 0.0
    t_run0 = time.perf_counter()

    # Chunked stepping (VERDICT r4 item 4): N frames per fused device
    # dispatch via lax.scan (vo_device._device_step_n). Sequentially the
    # tunnel charges ~90 ms of dispatch+fetch overhead per frame
    # (measured r5 trial: 113 ms/frame total, RTT-bound); a chunk pays it
    # once per N frames, and the NEXT chunk's host render + feature
    # dispatch overlap the current chunk's device time — no reordering of
    # VO operations, so no pipeline hazards. Per-frame host completion
    # runs from the stacked StepOut rows; bootstrap and loss-recovery
    # frames take the sequential host path.
    from cvsteer_tpu.slam.vo_device import _LazyFeatureRows

    chunk = max(int(args.chunk), 1)

    from concurrent.futures import ThreadPoolExecutor

    render_pool = ThreadPoolExecutor(1)
    render_fut = {}  # k0 -> Future of [span, H, W] uint8

    def render_async(k0, span):
        if k0 not in render_fut:
            render_fut[k0] = render_pool.submit(
                lambda: np.stack(
                    [seq.render(k0 + j) for j in range(span)]
                )
            )

    def render_feats(k0, span):
        # rendering runs on a worker thread (numpy/cv2 release the GIL),
        # so it overlaps the main thread's blocking RPC waits; here we
        # only collect + dispatch the feature extraction
        t0 = time.perf_counter()
        render_async(k0, span)
        imgs = render_fut.pop(k0).result()
        phase["render"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        fb = hostvo._extract_features_jit(
            jnp.asarray(imgs), cfg.frontend  # uint8: 1 byte/px on the wire
        )
        phase["features"] += time.perf_counter() - t0
        return fb

    k = 0
    prefetched = None  # (k0, span, Features batch) for the NEXT chunk
    while k < args.frames:
        if vo.map is None:
            # bootstrap / recovery: one frame at a time on the host path
            if prefetched is not None:
                k0, span, fb = prefetched
                rows = _LazyFeatureRows(fb.yx, fb.desc, fb.valid)
                t0 = time.perf_counter()
                for j in range(span):
                    vo.process_frame(rows[j])
                phase["bootstrap"] += time.perf_counter() - t0
                prefetched = None
                k = k0 + span
                continue
            fb = render_feats(k, 1)
            rows = _LazyFeatureRows(fb.yx, fb.desc, fb.valid)
            t0 = time.perf_counter()
            vo.process_frame(rows[0])
            phase["bootstrap"] += time.perf_counter() - t0
            k += 1
            continue
        if prefetched is None:
            span = min(chunk, args.frames - k)
            if span < chunk:
                print(f"dropping {span}-frame tail (< chunk)", file=sys.stderr)
                break
            prefetched = (k, span, render_feats(k, span))
        k0, span, fb = prefetched
        prefetched = None
        t0 = time.perf_counter()
        handle = vo.issue_chunk(fb.yx, fb.desc, fb.valid)
        phase["issue"] += time.perf_counter() - t0
        # overlap: the chunk-after-next starts RENDERING on the worker
        # thread now; the next chunk's feature dispatch rides under the
        # in-flight chunk's device time and fetch RTT
        if k0 + span + 2 * chunk <= args.frames:
            render_async(k0 + span + chunk, chunk)
        if k0 + span + chunk <= args.frames:
            prefetched = (
                k0 + span, chunk, render_feats(k0 + span, chunk)
            )
        t0 = time.perf_counter()
        fetched = jax.device_get(handle)
        phase["fetch"] += time.perf_counter() - t0
        rows = _LazyFeatureRows(fb.yx, fb.desc, fb.valid)
        t0 = time.perf_counter()
        done = vo.complete_chunk(rows, fetched)
        for j in range(done):
            n_tracked_hist.append(int(fetched.n_tracked[j]))
            if bool(fetched.promoted[j]):
                promoted_frames.append(k0 + j)
        for j in range(done, span):  # loss/bootstrap fallback (rare)
            vo.process_frame(rows[j])
        phase["complete"] += time.perf_counter() - t0
        k = k0 + span
        if k > ckpt_frame and ckpt_s == 0.0:
            t0 = time.perf_counter()
            ckpt_frame = k - 1  # actual boundary (chunk-aligned)
            ckpt.save(ckpt_frame, vo.sync_host())
            ckpt_s = time.perf_counter() - t0
            highwater.sample()
        if k % 200 < chunk:
            highwater.sample()
            el = time.perf_counter() - t_run0
            print(
                f"[{k}/{args.frames}] kf={len(vo.state.keyframes)} "
                f"lm={vo.state.num_landmarks} closures={vo.closures_accepted} "
                f"{k/el:.1f} f/s", file=sys.stderr,
            )
    wall_s = time.perf_counter() - t_run0
    highwater.sample()
    mem = highwater.peak
    render_s = phase["render"]

    state = vo.finalize()
    gt_R, gt_t = seq.gt_arrays()
    ids = [f for f, _, _ in state.trajectory]
    Rs, ts = state.poses()
    ate = float(ate_rmse(Rs, ts, gt_R[ids], gt_t[ids], align_scale=True))
    # map-units -> meters scale from the same Sim(3) alignment the ATE
    # uses (monocular scale is arbitrary; measured depths need meters)
    from cvsteer_tpu.slam.evaluate import camera_centers, umeyama

    s_align, _, _ = umeyama(
        camera_centers(Rs, ts), camera_centers(gt_R[ids], gt_t[ids])
    )

    # ---- diagnostics: keyframe-only ATE + local-scale profile -----------
    # (attributes a full-trajectory failure: keyframe-graph drift vs
    # non-keyframe propagation vs scale collapse)
    kf_R_all = np.stack([kf.R for kf in state.keyframes])
    kf_t_all = np.stack([kf.t for kf in state.keyframes])
    kf_idx_all = [kf.index for kf in state.keyframes]
    kf_ate = float(ate_rmse(
        kf_R_all, kf_t_all, gt_R[kf_idx_all], gt_t[kf_idx_all],
        align_scale=True,
    ))
    c_kf_est = camera_centers(kf_R_all, kf_t_all)
    c_kf_gt = camera_centers(gt_R[kf_idx_all], gt_t[kf_idx_all])
    d_est = np.linalg.norm(np.diff(c_kf_est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(c_kf_gt, axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-12)
    nseg = max(len(ratio) // 12, 1)
    scale_profile = [
        round(float(np.median(ratio[i:i + nseg]) * s_align), 4)
        for i in range(0, len(ratio) - nseg + 1, nseg)
    ]

    # ---- measured bound inputs (no assumed constants) -------------------
    # sigma_px / Z: reprojection residuals of keyframe landmarks.
    # CONSISTENT-EPOCH subset only: ground-prior corrections rescale the
    # live map + WINDOW poses and deliberately leave older keyframes at
    # their at-time poses (history is not rewritten), so old-keyframe x
    # current-landmark residuals mix epochs and are meaningless — the
    # r5 first run measured sigma_px 13.9 px that way and inflated the
    # bound 150x. Tracking noise is stationary; the last 2 windows of
    # keyframes (poses and landmarks in the same epoch after the final
    # sync) estimate it correctly.
    res_px, depths = [], []
    for kf in state.keyframes[-2 * cfg.window:]:
        sel = kf.landmark_ids >= 0
        if sel.sum() < 8:
            continue
        X = state.landmarks[kf.landmark_ids[sel]]
        p = X @ kf.R.T + kf.t
        ok = p[:, 2] > 1e-3
        if not ok.any():
            continue
        u = fx * p[ok, 0] / p[ok, 2] + cx
        v = fy * p[ok, 1] / p[ok, 2] + cy
        yx = np.asarray(kf.features.yx)[sel][ok]
        r = np.hypot(u - yx[:, 1], v - yx[:, 0])
        res_px.extend(r[r < 20.0])  # exclude gross mismatches
        depths.extend(p[ok, 2])
    sigma_px = float(np.median(res_px)) if res_px else 1.0
    # depths are MAP units; the bound's Z is meters
    Z = float(np.median(depths) * s_align) if depths else 8.0
    N_lm = float(np.mean(n_tracked_hist)) if n_tracked_hist else 40.0
    kf_ids = [kf.index for kf in state.keyframes]
    centers = np.einsum("kij,kj->ki", gt_R[kf_ids].transpose(0, 2, 1), -gt_t[kf_ids])
    B_kf = float(np.median(np.linalg.norm(np.diff(centers, axis=0), axis=1)))
    hops = max(len(state.keyframes) - 1, 1)
    per_hop = sigma_px / fx * Z**2 / (max(B_kf, 1e-6) * np.sqrt(max(N_lm, 1.0)))
    bound = float(3.0 * np.sqrt(hops) * per_hop)

    # ---- resume leg -----------------------------------------------------
    from cvsteer_tpu.slam.vo import init_vo

    vo2 = DeviceVO(cfg)
    restored = ckpt.restore(init_vo(cfg))
    vo2.adopt(restored)
    resumed_tracked = 0
    n_res = min(args.resume_frames, args.frames - ckpt_frame - 1)
    for k in range(ckpt_frame + 1, ckpt_frame + 1 + n_res):
        img = seq.render(k)
        feats = hostvo._extract_features_jit(
            jnp.asarray(img, jnp.float32), cfg.frontend
        )
        vo2.process_frame(feats)
        tr = vo2.state.trajectory
        if tr and tr[-1][0] == vo2.state.frame_count - 1:
            if np.isfinite(tr[-1][1]).all() and np.isfinite(tr[-1][2]).all():
                resumed_tracked += 1
    st2 = vo2.finalize()
    tail = [(f, R, t) for f, R, t in st2.trajectory if f > ckpt_frame]
    if len(tail) >= 10:
        ids2 = [p[0] for p in tail]
        R2 = np.stack([p[1] for p in tail])
        t2 = np.stack([p[2] for p in tail])
        resume_ate = float(
            ate_rmse(R2, t2, gt_R[ids2], gt_t[ids2], align_scale=True)
        )
        # A/B against the UNINTERRUPTED run's same frames (VERDICT r4
        # item 7): the main run tracked this exact span without the
        # save/restore cycle — its tail ATE is the resume leg's baseline
        main_tail = [
            (f, R, t) for f, R, t in state.trajectory
            if ckpt_frame < f <= ckpt_frame + n_res
        ]
        idsm = [p[0] for p in main_tail]
        main_tail_ate = float(ate_rmse(
            np.stack([p[1] for p in main_tail]),
            np.stack([p[2] for p in main_tail]),
            gt_R[idsm], gt_t[idsm], align_scale=True,
        )) if len(main_tail) >= 10 else None
    else:
        resume_ate = None
        main_tail_ate = None

    out = {
        "config": "4/5 fallback: real-texture synthetic city loop",
        "dataset_fetch": fetch,
        "sequence": {
            "frames": args.frames, "laps": args.laps,
            "image": [seq.h, seq.w], "fx": fx,
            "perimeter_m": round(seq._perimeter, 1),
            "speed_m_per_frame": round(seq._step, 3),
            "generator": "cvsteer_tpu/io/synth.py (seeded, reproducible)",
        },
        "engine": {
            "type": "DeviceVO (device-resident, 1 dispatch + 1 fetch/frame)",
            "backend": jax.default_backend(),
            "max_landmarks": cfg.max_landmarks,
            "loop": {
                "sim3": True, "min_gap": cfg.loop_min_gap,
                "cooldown": cfg.loop_cooldown,
                "signature_threshold": cfg.loop_signature_threshold,
            },
        },
        "run": {
            "frames": args.frames,
            "keyframes": len(state.keyframes),
            "pose_graph_poses": len(state.keyframes),
            "landmarks_live": int(state.num_landmarks),
            "closures_accepted": int(vo.closures_accepted),
            "tracked_frames": len(state.trajectory),
            "mean_pnp_inliers": round(N_lm, 1),
            "wall_s": round(wall_s, 1),
            "render_s_host": round(render_s, 1),
            "checkpoint_save_s": round(ckpt_s, 2),
            "frames_per_s_incl_render": round(args.frames / wall_s, 2),
            "frames_per_s_engine": round(
                args.frames / max(wall_s - render_s, 1e-9), 2
            ),
            # host wall time by phase (seconds over the whole run); note
            # render overlaps the device step (pipelined), so phases sum
            # past the engine wall
            "host_profile_s": {k: round(v, 1) for k, v in phase.items()},
            "peak_device_memory": mem,
        },
        "events": _summarize_diag(vo.state.diag),
        "ate": {
            "ate_rmse_m_sim3_aligned": round(ate, 4),
            "ate_keyframes_only_m": round(kf_ate, 4),
            # est/gt inter-keyframe baseline ratio (meters, via the global
            # Sim3 alignment), medianed over 12 equal segments of the run:
            # flat ~1.0 = scale held; decaying = monocular scale drift
            "local_scale_profile": scale_profile,
            "bound_m": round(bound, 4),
            "pass": bool(ate < bound),
            "bound_inputs_measured": {
                "sigma_px_median_reproj": round(sigma_px, 3),
                "Z_median_depth_m": round(Z, 2),
                "N_lm_mean_inliers": round(N_lm, 1),
                "B_kf_median_gt_baseline_m": round(B_kf, 3),
                "keyframe_hops": hops,
            },
            "formula": "3 * sqrt(hops) * sigma_px/fx * Z^2 / (B_kf * sqrt(N_lm))",
        },
        "checkpoint_resume": {
            "checkpoint_frame": ckpt_frame,
            "resumed_frames": n_res,
            "resumed_tracked": resumed_tracked,
            "resume_tail_ate_m": (
                round(resume_ate, 4) if resume_ate is not None else None
            ),
            # A/B: the uninterrupted run's ATE over the SAME frames, and
            # the gate — resume quality must be within 2x of it (plus a
            # 5 cm floor for noise on short spans)
            "uninterrupted_tail_ate_m": (
                round(main_tail_ate, 4) if main_tail_ate is not None else None
            ),
            "pass": (
                bool(resume_ate <= max(2.0 * main_tail_ate, 0.05))
                if resume_ate is not None and main_tail_ate is not None
                else None
            ),
        },
    }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "slam_scale_ate_m", "value": out["ate"]["ate_rmse_m_sim3_aligned"],
        "bound": out["ate"]["bound_m"], "pass": out["ate"]["pass"],
        "frames": args.frames, "keyframes": len(state.keyframes),
        "closures": int(vo.closures_accepted), "out": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
