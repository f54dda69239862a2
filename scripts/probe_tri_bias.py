"""Diagnose the forward-motion scale collapse (round 4).

For each keyframe of a city-loop VO run, measures against analytic truth:
- s_base[k]: est/gt inter-keyframe baseline ratio (the map's local scale);
- for landmarks NEWLY triangulated at keyframe k: median est_depth /
  (gt_depth * s_base[k]) — the triangulation depth bias in the map's own
  current scale (1.0 = unbiased);
- for landmarks ALREADY in the map, the same ratio drift across later BA
  windows (BA-induced coherent shrink).

Usage: python scripts/probe_tri_bias.py [--frames 240] [--local-map]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--n-seq", type=int, default=2400)
    ap.add_argument("--local-map", action="store_true")
    ap.add_argument("--ba-iterations", type=int, default=25)
    ap.add_argument("--platform", default="cpu")
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
    from cvsteer_tpu.slam.vo import VOConfig
    from cvsteer_tpu.slam.vo_device import DeviceVO

    seq = CityLoop(n_frames=args.n_seq, laps=1.75)
    fx, fy, cx, cy = seq.intrinsics4
    gt_R, gt_t = seq.gt_arrays()
    gt_C = np.einsum("kij,ki->kj", gt_R, -gt_t)  # camera centers (world)

    cfg = VOConfig(
        intrinsics=Intrinsics(fx, fy, cx, cy),
        frontend=FrontendConfig(upright_desc=True),
        kf_max_gap=3, window=8, track_min_landmarks=40, min_parallax=0.03,
        match_ratio=0.80, ba_iterations=args.ba_iterations,
        tri_min_ray_angle_deg=0.35, track_local_map=args.local_map,
        loop_closure=False,
    )
    vo = DeviceVO(cfg)

    seen = set()
    depth_cache = {}

    def gt_depth_at(frame, yx):
        if frame not in depth_cache:
            depth_cache[frame] = seq.depth(frame)
        d = depth_cache[frame]
        ys = np.clip(np.round(yx[:, 0]).astype(int), 0, d.shape[0] - 1)
        xs = np.clip(np.round(yx[:, 1]).astype(int), 0, d.shape[1] - 1)
        return d[ys, xs]

    rows = []
    for k in range(args.frames):
        feats = hostvo._extract_features_jit(
            jnp.asarray(seq.render(k), jnp.float32), cfg.frontend
        )
        vo.process_frame(feats)
        st = vo.state
        if not st.keyframes or st.keyframes[-1].index != k or len(st.keyframes) < 3:
            continue
        vo.sync_host()
        st = vo.state
        kf = st.keyframes[-1]
        # local scale: est/gt baseline over the last 3 keyframe hops
        kfs = st.keyframes[-4:]
        c_est = np.stack([
            np.einsum("ij,i->j", K.R, -K.t) for K in kfs
        ])
        c_gt = gt_C[[K.index for K in kfs]]
        b_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1).sum()
        b_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum()
        s_base = b_est / max(b_gt, 1e-12)

        ids = kf.landmark_ids
        sel = ids >= 0
        lm_ids = ids[sel]
        new_sel = np.array([i not in seen for i in lm_ids])
        seen.update(lm_ids.tolist())
        X = st.landmarks[lm_ids]
        p = X @ kf.R.T + kf.t  # camera frame, map units
        zgt = gt_depth_at(k, np.asarray(kf.features.yx)[sel])
        okz = np.isfinite(zgt) & (p[:, 2] > 1e-6)
        ratio = p[okz, 2] / (zgt[okz] * s_base)
        new_r = ratio[new_sel[okz]]
        old_r = ratio[~new_sel[okz]]
        rows.append({
            "kf": len(st.keyframes), "frame": k,
            "s_base": round(float(s_base), 4),
            "new_bias": round(float(np.median(new_r)), 4) if len(new_r) else None,
            "old_bias": round(float(np.median(old_r)), 4) if len(old_r) else None,
            "n_new": int(new_sel.sum()), "n_lm": int(sel.sum()),
        })
        if len(rows) % 10 == 0:
            print(rows[-1], flush=True)

    import json

    s0 = rows[0]["s_base"]
    sN = rows[-1]["s_base"]
    nb = [r["new_bias"] for r in rows if r["new_bias"]]
    ob = [r["old_bias"] for r in rows if r["old_bias"]]
    print(json.dumps({
        "local_map": args.local_map,
        "scale_start": s0, "scale_end": sN,
        "scale_decay_per_kf_pct": round(
            (np.log(sN / s0) / max(len(rows) - 1, 1)) * 100, 3
        ),
        "new_lm_depth_bias_median": round(float(np.median(nb)), 4),
        "old_lm_depth_bias_median": round(float(np.median(ob)), 4),
        "rows": len(rows),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
