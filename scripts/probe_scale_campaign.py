"""City-loop scale-stability probe: short campaign runs with the diag log.

Round-5 diagnostic harness for the config-4/5 acceptance campaign
(scripts/slam_scale_run.py): runs N frames of the city loop with
VOState.diag installed and reports exactly the things the round-4 failure
hid — per-keyframe est/gt baseline ratios, lost/reloc/reboot/re-seed
events, closure events with per-event timing, speed-prior corrections,
and the segment scale profile. Use --platform cpu for fast iteration;
the full-scale artifact run stays scripts/slam_scale_run.py.

Usage:
  python scripts/probe_scale_campaign.py --frames 1200 --platform cpu \
      [--engine device|host] [--start-frame 0] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--laps", type=float, default=1.75)
    ap.add_argument("--n-frames-geom", type=int, default=4200,
                    help="sequence geometry: frames for a full --laps run "
                    "(speed per frame is laps*perimeter/n_frames_geom)")
    ap.add_argument("--start-frame", type=int, default=0)
    ap.add_argument("--engine", default="device", choices=["device", "host"])
    ap.add_argument("--platform", default="default")
    ap.add_argument("--kf-gap", type=int, default=3)
    ap.add_argument("--flow-px", type=float, default=0.0,
                    help="flow-driven promotion threshold (px; 0=off)")
    ap.add_argument("--window", type=int, default=12)
    ap.add_argument("--ba-iters", type=int, default=25)
    ap.add_argument("--band", default="0,0", help="speed prior lo,hi (0,0=off)")
    ap.add_argument("--ground", type=float, default=0.0,
                    help="ground-plane height prior in meters (0=off; the "
                    "city loop rig is 1.5)")
    ap.add_argument("--min-track", type=int, default=40)
    ap.add_argument("--loop", action="store_true", default=True)
    ap.add_argument("--no-loop", dest="loop", action="store_false")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvsteer_tpu.features.frontend import FrontendConfig
    from cvsteer_tpu.geometry.camera import Intrinsics
    from cvsteer_tpu.io.synth import CityLoop
    from cvsteer_tpu.slam import vo as hostvo
    from cvsteer_tpu.slam.evaluate import ate_rmse, camera_centers, umeyama
    from cvsteer_tpu.slam.vo import VOConfig, finalize, init_vo, process_frame

    lo, hi = (float(x) for x in args.band.split(","))
    seq = CityLoop(n_frames=args.n_frames_geom, laps=args.laps)
    fx, fy, cx, cy = seq.intrinsics4
    cfg = VOConfig(
        intrinsics=Intrinsics(fx, fy, cx, cy),
        frontend=FrontendConfig(upright_desc=True),
        kf_max_gap=args.kf_gap,
        kf_min_flow_px=args.flow_px,
        window=args.window,
        track_min_landmarks=args.min_track,
        min_parallax=0.03,
        match_ratio=0.80,
        ba_iterations=args.ba_iters,
        tri_min_ray_angle_deg=0.7,
        rescue_radius_px=8.0,
        max_landmarks=262144 if args.engine == "device" else 65536,
        loop_closure=args.loop,
        loop_closure_sim3=args.loop,
        loop_min_gap=50,
        loop_cooldown=25,
        loop_sig_capacity=4096,
        loop_signature_threshold=0.8,
        loop_consistency=2,
        loop_reject_cooldown=15,
        speed_prior_band=(lo, hi),
        ground_height_m=args.ground,
    )

    if args.engine == "device":
        from cvsteer_tpu.slam.vo_device import DeviceVO

        vo = DeviceVO(cfg)
        st = vo.state
    else:
        st = init_vo(cfg)
        vo = None
    st.diag = []

    t0 = time.perf_counter()
    render_s = 0.0
    f0, f1 = args.start_frame, args.start_frame + args.frames
    for k in range(f0, f1):
        tr = time.perf_counter()
        img = seq.render(k)
        render_s += time.perf_counter() - tr
        feats = hostvo._extract_features_jit(
            jnp.asarray(img, jnp.float32), cfg.frontend
        )
        if vo is not None:
            vo.process_frame(feats)
            st = vo.state
        else:
            st = process_frame(st, feats)
        if (k + 1 - f0) % 200 == 0:
            el = time.perf_counter() - t0
            print(
                f"[{k + 1 - f0}/{args.frames}] kf={len(st.keyframes)} "
                f"lm={st.num_landmarks} {(k + 1 - f0) / el:.1f} f/s",
                file=sys.stderr,
            )
    wall = time.perf_counter() - t0

    state = vo.finalize() if vo is not None else finalize(st)
    gt_R, gt_t = seq.gt_arrays()
    # trajectory frame ids are engine-local (0-based); map onto sequence
    ids = [f + f0 for f, _, _ in state.trajectory]
    Rs, ts = state.poses()
    ate = float(ate_rmse(Rs, ts, gt_R[ids], gt_t[ids], align_scale=True))
    s_align, _, _ = umeyama(
        camera_centers(Rs, ts), camera_centers(gt_R[ids], gt_t[ids])
    )

    # per-keyframe est/gt baseline ratio (the scale trace)
    kfs = state.keyframes
    kf_R = np.stack([kf.R for kf in kfs])
    kf_t = np.stack([kf.t for kf in kfs])
    kf_ids = [kf.index + f0 for kf in kfs]
    c_est = camera_centers(kf_R, kf_t)
    c_gt = camera_centers(gt_R[kf_ids], gt_t[kf_ids])
    d_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-12) * s_align
    raw = d_est / np.maximum(d_gt, 1e-12)  # no alignment: map-unit scale
    nseg = max(len(ratio) // 12, 1)
    profile = [
        round(float(np.median(ratio[i:i + nseg])), 4)
        for i in range(0, len(ratio) - nseg + 1, nseg)
    ]
    profile_raw = [
        round(float(np.median(raw[i:i + nseg])), 4)
        for i in range(0, len(raw) - nseg + 1, nseg)
    ]

    diag = state.diag or []
    by_ev: dict = {}
    for e in diag:
        by_ev.setdefault(e["ev"], []).append(e)
    closures = by_ev.get("closure", [])
    out = {
        "frames": args.frames,
        "engine": args.engine,
        "backend": jax.default_backend(),
        "wall_s": round(wall, 1),
        "engine_f_per_s": round(args.frames / max(wall - render_s, 1e-9), 2),
        "keyframes": len(kfs),
        "ate_m": round(ate, 3),
        "s_align": round(float(s_align), 4),
        "scale_profile": profile,
        "scale_profile_raw": profile_raw,
        "scale_ratio_minmax": [
            round(float(np.min(ratio)), 4), round(float(np.max(ratio)), 4)
        ],
        "events": {k: len(v) for k, v in by_ev.items()},
        "lost_frames": [e["f"] + f0 for e in by_ev.get("lost", [])],
        "reboots": [e["f"] + f0 for e in by_ev.get("reboot", [])],
        "inits": [
            {"f": e["f"] + f0, "scale": round(e["scale"], 4)}
            for e in by_ev.get("init", [])
        ],
        "ground_events": len(by_ev.get("ground", [])),
        "ground_r_minmax": (
            [
                round(min(e["r"] for e in by_ev["ground"]), 4),
                round(max(e["r"] for e in by_ev["ground"]), 4),
            ]
            if by_ev.get("ground")
            else None
        ),
        "speed_prior_hits": [
            {"f": e["f"] + f0, "b": round(e["b"], 4),
             "b_clamped": round(e["b_clamped"], 4)}
            for e in by_ev.get("speed_prior", [])
        ],
        "closure_events": [
            {"f": e["f"] + f0, "accepted": e["accepted"], "K": e["K"],
             "sync_ms": e.get("sync_ms"), "solve_ms": e.get("solve_ms")}
            for e in closures
        ],
        "kf_reason_track": sum(
            1 for e in by_ev.get("kf", []) if e["reason"] == "track"
        ),
        "kf_low_inlier": sum(
            1 for e in by_ev.get("kf", []) if e["n_tracked"] < 20
        ),
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"summary": out, "diag": diag}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
