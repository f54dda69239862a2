"""Batched VO serving: many independent streams, one fetch per step.

Production deployments track many camera streams against one accelerator.
The per-stream steady-state step (slam.vo._track_fused_jit) is a single
device dispatch whose result is one small tuple — on a remote/tunneled
TPU the blocking fetch round-trip, not device compute, dominates a
sequential loop (BENCH_NOTES.md). The server exploits the issue/complete
split of the tracking step: each ``step`` dispatches the fused tracker
for EVERY ready stream first (dispatches are asynchronous and queue on
device), then fetches all results in one ``jax.device_get`` — a single
round-trip serves the whole fleet. Host-side logic (initialization,
keyframe promotion, windowed BA, loop closure) runs per stream afterwards,
exactly as in the sequential loop: a 1-stream server is step-for-step
identical to ``vo.process_frame`` (regression-tested).

This is the VO analog of the reference CLI's batch worker (C22,
example/steer.cpp:169 parallel_for over images): throughput scales with
stream count until device compute saturates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax

from cvsteer_tpu.features.frontend import Features
from cvsteer_tpu.slam.vo import (
    VOConfig,
    VOState,
    _decide_keyframe,
    _keyframe_epilogue,
    _kf_fused_complete,
    _kf_fused_issue,
    _track_complete,
    _track_issue,
    init_vo,
    process_frame,
)


class VOServer:
    """``n_streams`` independent monocular VO state machines, stepped in
    lockstep with a BOUNDED number of fetch round-trips per step."""

    def __init__(self, config: VOConfig = VOConfig(), n_streams: int = 8):
        self.states: List[VOState] = [init_vo(config) for _ in range(n_streams)]

    def step(self, frames: Sequence[Optional[Features]]) -> None:
        """Advance every stream by one frame.

        ``frames[i]`` is stream i's next feature set (None = no frame this
        tick). Streams not yet initialized take the sequential two-view
        bootstrap path (host logic; a handful of frames per stream
        lifetime). Initialized streams run in TWO batched stages — track
        (whose fetch also carries each frame's normalized pixels +
        validity) and the fused triangulation+windowed-BA — each paying
        ONE fetch round-trip for the whole fleet regardless of how many
        streams promote a keyframe this step.
        """
        assert len(frames) == len(self.states)
        pending = {}
        for i, (st, feats) in enumerate(zip(self.states, frames)):
            if feats is None:
                continue
            if not st.keyframes or not st.initialized:
                # bootstrap path: sequential (rare per stream)
                self.states[i] = process_frame(st, feats)
                continue
            pending[i] = _track_issue(st, feats)

        if not pending:
            return
        fetched = jax.device_get(pending)  # round-trip 1: the fleet's tracks

        # host decisions; collect keyframe requests (the track fetch also
        # carried each frame's normalized pixels + validity, so promotion
        # needs no pixel round-trip)
        kf_req = {}
        pix = {}
        ground = {}
        for i, res in fetched.items():
            st = self.states[i]
            out = _track_complete(st, res)
            req = _decide_keyframe(st, frames[i], *out[:6], flow=out[8])
            if req is not None:
                kf_req[i] = req
                pix[i] = out[6:8]  # (x_new, fvalid)
                ground[i] = out[9]  # ground-height observation

        if kf_req:
            fused = {}
            for i, (R, t, idx, valid, ref_kf) in kf_req.items():
                x_new, fvalid = pix[i]
                h, ctx = _kf_fused_issue(
                    self.states[i], frames[i], R, t, idx, valid, ref_kf,
                    x_new, fvalid,
                )
                fused[i] = (h, ctx)
            # round-trip 2: the fleet's fused triangulation+BA results
            live = {i: h for i, (h, _) in fused.items() if h is not None}
            fused_f = jax.device_get(live) if live else {}
            for i, (h, ctx) in fused.items():
                _kf_fused_complete(self.states[i], fused_f.get(i), ctx)
            for i in kf_req:
                _keyframe_epilogue(self.states[i], ground_h=ground.get(i, 0.0))

        for i in fetched:
            self.states[i].frame_count += 1
