"""Fleet tail-ATE benchmark across serving scales (VERDICT r2 item 3).

Runs DeviceVOFleet at S in {8, 16, 32} over the standard 60-frame
synthetic streams (worlds seed 10+s, noise rng 20+s — the exact
configuration whose stream 19 measured ATE 0.286 in round 2) and writes
per-stream median/max ATE plus aggregate frames/s to FLEET_r{N}.json.
Too slow for bench.py's watchdog budget (three fleet jit shapes compile
through the tunnel); run standalone on the chip.
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np

from cvsteer_tpu.geometry.camera import Intrinsics
from cvsteer_tpu.slam.evaluate import ate_rmse
from cvsteer_tpu.slam.vo import VOConfig
from cvsteer_tpu.slam.vo_device import DeviceVOFleet
from test_vo import _gt_pose, _make_world, _render_features

N_FRAMES, WARM = 60, 20


def run_fleet(S: int) -> dict:
    K = Intrinsics(500.0, 500.0, 320.0, 240.0)
    cfg = VOConfig(intrinsics=K, kf_max_gap=5, window=8, track_min_landmarks=30)
    worlds = [_make_world(seed=10 + s) for s in range(S)]
    rngs = [np.random.default_rng(20 + s) for s in range(S)]
    gts = [_gt_pose(k, N_FRAMES) for k in range(N_FRAMES)]
    frames = [
        [_render_features(worlds[s][0], worlds[s][1], R, t, rngs[s]) for s in range(S)]
        for R, t in gts
    ]
    fleet = DeviceVOFleet(cfg, n_streams=S)
    for k in range(WARM):
        fleet.step(frames[k])
    t0 = time.perf_counter()
    for k in range(WARM, N_FRAMES):
        fleet.step(frames[k])
    dt = time.perf_counter() - t0
    gtR = np.stack([g[0] for g in gts])
    gtt = np.stack([g[1] for g in gts])
    ates = []
    for s in range(S):
        st = fleet.finalize(s)
        Rs, ts = st.poses()
        ates.append(float(ate_rmse(Rs, ts, gtR, gtt, align_scale=True)))
    ates = np.asarray(ates)
    return {
        "streams": S,
        "frames_per_s_aggregate": round(S * (N_FRAMES - WARM) / dt, 1),
        "ate_median_m": round(float(np.median(ates)), 4),
        "ate_max_m": round(float(ates.max()), 4),
        "ate_per_stream": [round(a, 4) for a in ates.tolist()],
    }


def main() -> int:
    out = {"bench": "DeviceVOFleet tail ATE",
           "frames": N_FRAMES, "warmup": WARM, "results": []}
    for S in (8, 16, 32, 64):
        r = run_fleet(S)
        out["results"].append(r)
        print(json.dumps(r))
    path = sys.argv[1] if len(sys.argv) > 1 else "FLEET_r03.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
