"""Measure the bf16 descriptor-sampling accuracy class end to end.

VERDICT r3 item 7: both TPU descriptor sampling paths (Pallas patch-DMA,
bf16 pair-table gather) are bf16 — the per-sample bound is pinned at
2e-2 rel (tests/test_pallas_frontend.py), but no artifact stated the
DOWNSTREAM effect. This script measures it against the fp32 sampling
oracle (FrontendConfig.desc_fp32_sampling) at three levels:

1. descriptor level: same frame, same keypoints — descriptor cosine /
   L2 deltas between bf16 and fp32 sampling;
2. match level: city-loop frame pairs at gaps {1, 4, 8} — mutual-ratio
   match counts and agreement, and two-view RANSAC inlier counts, for
   bf16 vs fp32 descriptors;
3. trajectory level: a 150-frame city-loop VO run per mode — ATE delta.

Run on the real chip (the patch-DMA kernel path); CPU falls back to the
bf16 pair-gather, the identical accuracy class:
    python scripts/desc_accuracy.py DESC_ACCURACY_r04.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "DESC_ACCURACY_r04.json"
    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.features.frontend import FrontendConfig, extract_features
    from cvsteer_tpu.features.matching import match_descriptors
    from cvsteer_tpu.geometry.camera import Intrinsics
    from cvsteer_tpu.io.synth import CityLoop
    from cvsteer_tpu.slam.twoview import two_view_pose_from_features

    seq = CityLoop(n_frames=400, laps=0.3)
    fx, fy, cx, cy = seq.intrinsics4
    K = Intrinsics(fx, fy, cx, cy)

    cfg16 = FrontendConfig(upright_desc=True)
    cfg32 = FrontendConfig(upright_desc=True, desc_fp32_sampling=True)

    ext = jax.jit(extract_features, static_argnames=("cfg",))

    frames = {k: jnp.asarray(seq.render(k), jnp.float32)
              for k in (100, 101, 104, 108)}
    f16 = {k: jax.device_get(ext(v, cfg=cfg16)) for k, v in frames.items()}
    f32 = {k: jax.device_get(ext(v, cfg=cfg32)) for k, v in frames.items()}

    # -- level 1: descriptor deltas on identical keypoints ----------------
    a, b = f16[100], f32[100]
    v = np.asarray(a.valid) & np.asarray(b.valid)
    da, db = np.asarray(a.desc)[v], np.asarray(b.desc)[v]
    cos = np.sum(da * db, axis=1)  # unit descriptors
    l2 = np.linalg.norm(da - db, axis=1)
    desc_level = {
        "n_keypoints": int(v.sum()),
        "cosine_min": round(float(cos.min()), 6),
        "cosine_median": round(float(np.median(cos)), 6),
        "l2_median": round(float(np.median(l2)), 6),
        "l2_max": round(float(l2.max()), 6),
    }

    # -- level 2: matching + RANSAC inliers -------------------------------
    def match_stats(fa, fb):
        m = match_descriptors(
            jnp.asarray(fa.desc), jnp.asarray(fa.valid),
            jnp.asarray(fb.desc), jnp.asarray(fb.valid), ratio=0.80,
        )
        res = two_view_pose_from_features(
            jax.tree.map(jnp.asarray, fa), jax.tree.map(jnp.asarray, fb), K,
            match_ratio=0.80,
        )
        return (int(m.count), int(res.num_inliers),
                np.asarray(m.index), np.asarray(m.valid))

    match_level = []
    for gap in (1, 4, 8):
        ka, kb = 100, 100 + gap
        n16, i16, idx16, v16 = match_stats(f16[ka], f16[kb])
        n32, i32, idx32, v32 = match_stats(f32[ka], f32[kb])
        both = v16 & v32
        agree = int(np.sum((idx16 == idx32) & both))
        match_level.append({
            "gap": gap,
            "matches_bf16": n16, "matches_fp32": n32,
            "ransac_inliers_bf16": i16, "ransac_inliers_fp32": i32,
            "match_agreement": agree,
            "agreement_frac_of_common": round(
                agree / max(int(both.sum()), 1), 4
            ),
        })

    # -- level 3: trajectory ATE ------------------------------------------
    from cvsteer_tpu.slam import vo as hostvo
    from cvsteer_tpu.slam.evaluate import ate_rmse
    from cvsteer_tpu.slam.vo import VOConfig
    from cvsteer_tpu.slam.vo_device import DeviceVO

    gt_R, gt_t = seq.gt_arrays()
    traj_level = {}
    for name, fcfg in (("bf16", cfg16), ("fp32", cfg32)):
        cfg = VOConfig(
            intrinsics=K, frontend=fcfg, kf_max_gap=3, window=8,
            track_min_landmarks=40, min_parallax=0.03, match_ratio=0.80,
            ba_iterations=25, tri_min_ray_angle_deg=0.35,
        )
        vo = DeviceVO(cfg)
        t0 = time.perf_counter()
        for k in range(150):
            feats = hostvo._extract_features_jit(
                jnp.asarray(seq.render(k), jnp.float32), cfg.frontend
            )
            vo.process_frame(feats)
        st = vo.finalize()
        ids = [f for f, _, _ in st.trajectory]
        Rs, ts = st.poses()
        traj_level[name] = {
            "frames_tracked": len(ids),
            "ate_m": round(float(
                ate_rmse(Rs, ts, gt_R[ids], gt_t[ids], align_scale=True)
            ), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }

    out = {
        "bench": "bf16 descriptor sampling vs fp32 oracle",
        "backend": jax.default_backend(),
        "sampler_bf16": (
            "pallas patch-DMA" if jax.default_backend() == "tpu"
            else "bf16 pair-table gather (same accuracy class)"
        ),
        "descriptor_level": desc_level,
        "match_level": match_level,
        "trajectory_level": traj_level,
        "ate_delta_m": round(
            traj_level["bf16"]["ate_m"] - traj_level["fp32"]["ate_m"], 4
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
