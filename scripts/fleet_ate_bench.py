"""Fleet serving benchmark: throughput, tail ATE, and DEVICE tick traces.

Round 4 (VERDICT r3 item 2): for each fleet size S, measures
- aggregate + per-stream frames/s (wall),
- per-stream ATE tail (median/max; the round-2 tail-bug regression guard),
- the DEVICE time of the tick itself (jax.profiler trace of the exact
  dispatched computation, captured via DeviceVOFleet.capture_dispatch),
so the wall/device split — how much of a tick is chip vs tunnel/host —
is measured, not guessed.

Config sweep per S: the round-3 baseline (uncapped promotion, classic
fetch) vs the serving levers landed this round: ``promote_cap`` (window
BA compacted to a sub-batch instead of running batch-wide — the S=64
cost cliff) and ``pipeline`` (one-tick-lagged fetch hides the tunnel
RTT). The VERDICT bar: >=30 f/s per stream at S=32 (tick <=33 ms) or a
trace-backed statement of the floor.

Too slow for bench.py's watchdog budget (each (S, cap, pipe) shape is a
fresh tunnel compile); run standalone on the chip:
    python scripts/fleet_ate_bench.py FLEET_r04.json
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
from cvsteer_tpu.utils.profiling import trace_device_us
from test_vo import _gt_pose, _make_world, _render_features

N_FRAMES, WARM = 60, 20


def run_fleet(
    S: int, promote_cap: int = 0, pipeline: bool = False,
    batched: bool = False, depth: int = 1,
) -> dict:
    """``batched``: drive DeviceVOFleet.step_batched from pre-staged
    device-array batches — the camera-rate serving contract where the
    batched front-end produces features ON device (no per-tick host
    assembly / feature upload). ``depth``: in-flight fetch queue."""
    K = Intrinsics(500.0, 500.0, 320.0, 240.0)
    cfg = VOConfig(intrinsics=K, kf_max_gap=5, window=8, track_min_landmarks=30)
    worlds = [_make_world(seed=10 + s) for s in range(S)]
    rngs = [np.random.default_rng(20 + s) for s in range(S)]
    gts = [_gt_pose(k, N_FRAMES) for k in range(N_FRAMES)]
    frames = [
        [_render_features(worlds[s][0], worlds[s][1], R, t, rngs[s]) for s in range(S)]
        for R, t in gts
    ]
    fleet = DeviceVOFleet(
        cfg, n_streams=S, promote_cap=promote_cap,
        pipeline=pipeline or batched, pipeline_depth=depth,
    )
    for k in range(WARM):
        fleet.step(frames[k])
    if batched:
        import jax
        import jax.numpy as jnp

        batches = [
            tuple(
                jnp.asarray(np.stack([getattr(frames[k][s], f) for s in range(S)]))
                for f in ("yx", "desc", "valid")
            )
            for k in range(WARM, N_FRAMES)
        ]
        jax.block_until_ready(batches)
        t0 = time.perf_counter()
        for b in batches:
            fleet.step_batched(*b)
        fleet._flush()  # completion-bound: drain in-flight fetches
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        for k in range(WARM, N_FRAMES):
            fleet.step(frames[k])
        dt = time.perf_counter() - t0
    ticks = N_FRAMES - WARM

    fleet._flush()
    gtR = np.stack([g[0] for g in gts])
    gtt = np.stack([g[1] for g in gts])
    ates = []
    for s in range(S):
        st = fleet.finalize(s)
        Rs, ts = st.poses()
        frames_s = [f for f, _, _ in st.trajectory]
        ates.append(
            float(
                ate_rmse(Rs, ts, gtR[frames_s], gtt[frames_s], align_scale=True)
            )
        )
    ates = np.asarray(ates)

    # device trace of steady-state ticks (AFTER the ATE finalize — the
    # replayed steps mutate fleet state): re-step the tail frames with
    # capture on and profile the exact dispatched computation; several
    # ticks because the promotion branch fires data-dependently
    tick_us = []
    fleet.capture_dispatch = True
    for k in range(N_FRAMES - 4, N_FRAMES):
        fleet.step(frames[k])  # timing only; state continuity irrelevant
        if fleet._captured is not None:
            tick_us.append(trace_device_us(fleet._captured, iters=2))
            fleet._captured = None
    fleet.capture_dispatch = False
    fleet._flush()
    return {
        "streams": S,
        "promote_cap": promote_cap,
        "pipeline": pipeline or batched,
        "batched": batched,
        "fetch_depth": depth,
        "frames_per_s_aggregate": round(S * ticks / dt, 1),
        "frames_per_s_per_stream": round(ticks / dt, 2),
        "tick_wall_ms": round(dt / ticks * 1e3, 2),
        "tick_device_ms_mean": round(float(np.mean(tick_us)) / 1e3, 2)
        if tick_us else None,
        "tick_device_ms_max": round(float(np.max(tick_us)) / 1e3, 2)
        if tick_us else None,
        "ate_median_m": round(float(np.median(ates)), 4),
        "ate_max_m": round(float(ates.max()), 4),
        "ate_per_stream": [round(a, 4) for a in ates.tolist()],
    }


def main() -> int:
    out = {
        "bench": "DeviceVOFleet serving: throughput + tail ATE + device tick",
        "frames": N_FRAMES, "warmup": WARM, "results": [],
    }
    # (S, promote_cap, pipeline); cap S//4 matches the expected promotion
    # rate (kf_max_gap=5 -> ~S/5 promotions/tick), so the window BA batch
    # shrinks 4x while bursts defer at most a tick
    sweep = [
        # (S, cap, pipeline, batched, depth)
        (8, 0, False, False, 1), (8, 2, True, False, 1),
        (16, 0, False, False, 1), (16, 4, True, False, 1),
        (32, 0, False, False, 1), (32, 8, True, False, 1),
        # camera-rate serving path: batched on-device features
        (32, 8, True, True, 1), (32, 8, True, True, 3),
        (64, 0, False, False, 1), (64, 16, True, True, 3),
    ]
    for S, cap, pipe, bat, depth in sweep:
        r = run_fleet(S, promote_cap=cap, pipeline=pipe, batched=bat, depth=depth)
        out["results"].append(r)
        print(json.dumps(r), flush=True)
    # JOINT serving gate (VERDICT r4 item 3): the headline config must
    # deliver BOTH camera-rate throughput AND the tail ATE bound — the
    # r4 notes quoted throughput from one config and tail from another.
    # The capped-promotion fairness fix (vo_device._fleet_promote's
    # rotating origin) targets the S=32 cap=8 tail regression (0.0532 vs
    # 0.0209 uncapped: lowest-index streams always won the cap slots and
    # the same unlucky streams deferred tick after tick).
    gate = {}
    for S in (32, 64):
        cands = [
            r for r in out["results"]
            if r["streams"] == S and r["frames_per_s_per_stream"] >= 30.0
            and r["ate_max_m"] <= 0.03
        ]
        best = max(
            cands, key=lambda r: r["frames_per_s_per_stream"], default=None
        )
        gate[f"S{S}"] = (
            {
                "pass": True,
                "config": {k: best[k] for k in
                           ("promote_cap", "pipeline", "batched",
                            "fetch_depth")},
                "frames_per_s_per_stream": best["frames_per_s_per_stream"],
                "ate_max_m": best["ate_max_m"],
            }
            if best is not None
            else {"pass": False}
        )
    out["joint_gate"] = gate
    print(json.dumps({"joint_gate": gate}))
    path = sys.argv[1] if len(sys.argv) > 1 else "FLEET_r04.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
