"""cvsteer-vo: monocular visual odometry over image sequences.

BASELINE config 4 entry point: run the steerable-front-end VO (keyframing +
windowed Schur BA) over a TUM-RGBD sequence, KITTI odometry sequence, or a
plain image directory; report ATE RMSE when ground truth is present; write
the trajectory in TUM format; checkpoint/resume mid-sequence.

  python -m cvsteer_tpu.cli_vo --input <seq_dir> --config cfg.json \
      --set slam.window=10 --output traj.txt --checkpoint-dir ckpt/

Serving mode: a comma-separated --input runs every sequence concurrently
through slam.vo_server.VOServer — per tick the whole fleet's images are
decoded by a thread pool, feature-extracted in ONE batched dispatch, and
stepped with two fetch round-trips total (the production many-streams-
one-accelerator deployment; see BENCH_NOTES.md for throughput):

  python -m cvsteer_tpu.cli_vo --input seqA,seqB,seqC --output traj.txt

``--engine device`` switches either mode to the device-resident engine
(slam.vo_device): the whole map lives on the accelerator and every frame
— keyframe promotion included — is one dispatch + one small fetch
(1 RTT/frame sequential; 1 RTT/tick for the whole serving fleet).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cvsteer-vo", description=__doc__)
    ap.add_argument("--input", required=True, help="sequence dir (TUM/KITTI/images)")
    ap.add_argument("--config", default="", help="EngineConfig JSON")
    ap.add_argument(
        "--camera-preset", default="",
        help="published calibration: tum_fr1 | tum_fr2 | tum_fr3 | kitti_gray",
    )
    ap.add_argument("--set", nargs="*", default=[], help="dotted overrides k=v")
    ap.add_argument("--output", default="", help="trajectory output (TUM format)")
    ap.add_argument(
        "--engine", choices=("host", "device"), default="host",
        help="VO engine: 'host' = host-driven loop (slam.vo), 'device' = "
             "device-resident map, one dispatch + one fetch per frame "
             "(slam.vo_device; fastest on remote/tunneled accelerators)",
    )
    ap.add_argument(
        "--pipeline", action="store_true",
        help="serving mode + --engine device: fetch with one-tick lag "
             "(device-side pose prediction) so the tunnel RTT hides "
             "behind device compute; host mirrors update one tick late",
    )
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np

    from cvsteer_tpu.io.datasets import open_sequence
    from cvsteer_tpu.io.imageio import imread_gray_f32
    from cvsteer_tpu.slam.vo import finalize, init_vo, process_image
    from cvsteer_tpu.utils.config import EngineConfig, apply_overrides, load_config
    from cvsteer_tpu.utils.metrics import Metrics, StepTimer

    cfg = load_config(args.config) if args.config else EngineConfig()
    if args.camera_preset:
        from cvsteer_tpu.utils.config import apply_camera_preset

        cfg = apply_camera_preset(cfg, args.camera_preset)
    if args.set:
        cfg = apply_overrides(cfg, tuple(args.set))
    if args.checkpoint_dir:
        cfg.checkpoint_dir = args.checkpoint_dir

    roots = [p for p in args.input.split(",") if p]
    if not roots:
        print("no input sequences given", file=sys.stderr)
        return 1
    if len(roots) > 1:
        return _run_server(args, cfg, roots)

    seq = open_sequence(roots[0], max_frames=args.max_frames or None)
    if not seq.image_paths:
        print("no images found", file=sys.stderr)
        return 1

    engine = None
    if args.engine == "device":
        from cvsteer_tpu.slam.vo_device import DeviceVO

        engine = DeviceVO(_vo_config(cfg))
        state = engine.state
    else:
        state = init_vo(_vo_config(cfg))

    ckpt = None
    start = 0
    if cfg.checkpoint_dir:
        from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

        ckpt = SlamCheckpointer(cfg.checkpoint_dir)
        if ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            if engine is not None:
                engine.adopt(state)
            start = state.frame_count
            if args.verbose:
                print(f"resumed at frame {start}", file=sys.stderr)

    metrics = Metrics()
    timer = StepTimer()
    last_kf_count = len(state.keyframes)
    for k in range(start, len(seq.image_paths)):
        with timer.span("decode"):
            img = imread_gray_f32(seq.image_paths[k])
        if img is None:
            if args.verbose:
                print(f"skip unreadable: {seq.image_paths[k]}", file=sys.stderr)
            # keep frame ids aligned with the sequence index: trajectory
            # entries index seq.timestamps / seq.gt_* and checkpoint resume
            # restarts at frame_count, so a skipped frame must still advance
            state.frame_count += 1
            continue
        with timer.span("vo"):
            if engine is not None:
                engine.process_image(img)
                state = engine.state
            else:
                state = process_image(state, img)
        metrics.frame()
        if len(state.keyframes) != last_kf_count:
            metrics.count("keyframes", len(state.keyframes) - last_kf_count)
            last_kf_count = len(state.keyframes)
            if ckpt is not None and cfg.checkpoint_every and (
                last_kf_count % cfg.checkpoint_every == 0
            ):
                with timer.span("checkpoint"):
                    if engine is not None:
                        engine.sync_host()  # checkpoints need positions
                    ckpt.save(last_kf_count, state)
        if args.verbose and cfg.log_every and (k + 1) % cfg.log_every == 0:
            metrics.gauge("landmarks", state.num_landmarks)
            metrics.log(step=k + 1, **timer.means_ms())

    state = engine.finalize() if engine is not None else finalize(state)
    if ckpt is not None:
        ckpt.save(len(state.keyframes), state)
        ckpt.close()

    if args.output:
        _write_trajectory(args.output, state, seq)

    ate, n_traj = _ate(state, seq)
    if ate is not None:
        print(f"ATE RMSE: {ate:.4f} m over {n_traj} frames")
    if args.verbose:
        print(
            f"frames/s: {metrics.fps:.2f}; keyframes: {len(state.keyframes)}; "
            f"landmarks: {state.num_landmarks}; phase ms: {timer.means_ms()}",
            file=sys.stderr,
        )
    return 0


def _vo_config(cfg):
    from cvsteer_tpu.features.frontend import FrontendConfig
    from cvsteer_tpu.geometry.camera import Intrinsics
    from cvsteer_tpu.slam.vo import VOConfig

    return VOConfig(
        intrinsics=Intrinsics(
            cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
            dist=(cfg.camera.k1, cfg.camera.k2, cfg.camera.p1,
                  cfg.camera.p2, cfg.camera.k3),
        ),
        frontend=FrontendConfig(
            levels=cfg.frontend.levels,
            keypoints_per_level=cfg.frontend.keypoints_per_level,
            nms_radius=cfg.frontend.nms_radius,
            threshold=cfg.frontend.threshold,
            descriptor_grid=cfg.frontend.descriptor_grid,
            descriptor_spacing=cfg.frontend.descriptor_spacing,
            order=cfg.frontend.order,
        ),
        match_ratio=cfg.slam.match_ratio,
        min_parallax=cfg.slam.min_parallax,
        init_min_inliers=cfg.slam.init_min_inliers,
        track_min_landmarks=cfg.slam.track_min_landmarks,
        kf_max_gap=cfg.slam.kf_max_gap,
        window=cfg.slam.window,
        ba_iterations=cfg.slam.ba_iterations,
        huber_delta=cfg.slam.huber_delta,
        ransac_hypotheses=cfg.slam.ransac_hypotheses,
        ransac_threshold=cfg.slam.ransac_threshold,
        max_landmarks=cfg.slam.max_landmarks,
        loop_closure=cfg.slam.loop_closure,
        loop_closure_sim3=cfg.slam.loop_closure_sim3,
        loop_min_gap=cfg.slam.loop_min_gap,
        loop_min_inliers=cfg.slam.loop_min_inliers,
        loop_robust_delta=cfg.slam.loop_robust_delta,
        kf_min_flow_px=cfg.slam.kf_min_flow_px,
        loop_consistency=cfg.slam.loop_consistency,
        loop_reject_cooldown=cfg.slam.loop_reject_cooldown,
        ground_height_m=cfg.slam.ground_height_m,
        speed_prior_band=(cfg.slam.speed_prior_lo, cfg.slam.speed_prior_hi),
        motion_model=cfg.slam.motion_model,
        track_local_map=cfg.slam.track_local_map,
    )


def _write_trajectory(path: str, state, seq) -> None:
    """TUM format: t tx ty tz qx qy qz qw (camera->world)."""
    with open(path, "w") as f:
        for (fi, R, t) in state.trajectory:
            Rwc = R.T
            c = -Rwc @ t
            q = _rot_to_quat(Rwc)
            stamp = seq.timestamps[fi] if fi < len(seq.timestamps) else fi
            f.write(
                f"{stamp:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def _ate(state, seq):
    """(ate_rmse or None, #trajectory frames) vs the sequence ground truth."""
    from cvsteer_tpu.slam.evaluate import ate_rmse

    if seq.gt_R is None or len(state.trajectory) < 3:
        return None, len(state.trajectory)
    Rs, ts = state.poses()
    frames = [fi for fi, _, _ in state.trajectory]
    return ate_rmse(Rs, ts, seq.gt_R[frames], seq.gt_t[frames]), len(frames)


def _stream_output_path(base: str, k: int) -> str:
    import os

    root, ext = os.path.splitext(base)
    return f"{root}.{k}{ext or '.txt'}"


def _run_server(args, cfg, roots) -> int:
    """Serving mode: every sequence in ``roots`` stepped concurrently
    through slam.vo_server.VOServer.

    Per tick: thread-pool decode of the fleet's images (GIL-releasing
    native codec), ONE batched feature-extraction dispatch per distinct
    image shape, then VOServer.step's two batched fetch round-trips.
    Unreadable frames advance their stream's frame counter so trajectory
    rows stay aligned with ground truth (as in the sequential path).
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.features.frontend import extract_features
    from cvsteer_tpu.io.datasets import open_sequence
    from cvsteer_tpu.io.imageio import imread_gray_f32
    from cvsteer_tpu.slam.vo import finalize
    from cvsteer_tpu.slam.vo_server import VOServer

    vo_cfg = _vo_config(cfg)
    seqs = [open_sequence(r, max_frames=args.max_frames or None) for r in roots]
    for r, s in zip(roots, seqs):
        if not s.image_paths:
            print(f"no images found in {r}", file=sys.stderr)
            return 1
    n = len(seqs)
    if args.engine == "device":
        # the vmapped fleet: ONE dispatch + ONE fetch per tick for the
        # whole fleet (all streams share vo_cfg, as the CLI guarantees)
        from cvsteer_tpu.slam.vo_device import DeviceVOFleet

        srv = DeviceVOFleet(vo_cfg, n_streams=n, pipeline=args.pipeline)
        engines = srv.engines
    else:
        srv = VOServer(vo_cfg, n_streams=n)
        engines = None
    pool = ThreadPoolExecutor(max_workers=min(8, n))
    extract = jax.jit(lambda imgs: extract_features(imgs, cfg=vo_cfg.frontend))

    # per-stream checkpointing (subdirectory per stream); resumed streams
    # skip ticks below their restored frame_count
    ckpts = [None] * n
    start = [0] * n
    if cfg.checkpoint_dir:
        import os

        from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

        for i in range(n):
            ckpts[i] = SlamCheckpointer(
                os.path.join(cfg.checkpoint_dir, f"stream{i}")
            )
            if ckpts[i].latest_step() is not None:
                restored = ckpts[i].restore(srv.states[i])
                if engines is not None:
                    engines[i].adopt(restored)
                else:
                    srv.states[i] = restored
                start[i] = restored.frame_count
                if args.verbose:
                    print(f"stream {i}: resumed at frame {start[i]}",
                          file=sys.stderr)
    last_kf = [len(st.keyframes) for st in srv.states]

    n_ticks = max(len(s.image_paths) for s in seqs)
    t0 = time.perf_counter()
    frames_done = 0
    group_pad = {}  # image shape -> stable padded batch size
    for k in range(n_ticks):
        paths = [
            s.image_paths[k]
            if k < len(s.image_paths) and k >= start[i]
            else None
            for i, s in enumerate(seqs)
        ]
        imgs = list(pool.map(lambda p: imread_gray_f32(p) if p else None, paths))
        frames = [None] * n
        live = [i for i, im in enumerate(imgs) if im is not None]
        if live:
            by_shape = {}
            for i in live:
                by_shape.setdefault(imgs[i].shape, []).append(i)
            for shape, idxs in by_shape.items():
                # pad each shape group's batch to its running max so a
                # stream ending mid-run doesn't recompile the extractor
                gp = group_pad[shape] = max(group_pad.get(shape, 0), len(idxs))
                stack = np.stack(
                    [imgs[i] for i in idxs]
                    + [np.zeros(shape, np.float32)] * (gp - len(idxs))
                )
                batch = extract(jnp.asarray(stack))
                for slot, i in enumerate(idxs):
                    frames[i] = jax.tree.map(lambda x, s=slot: x[s], batch)
            srv.step(frames)
            frames_done += len(live)
        for i, im in enumerate(imgs):
            if paths[i] is not None and im is None:
                if args.verbose:
                    print(f"skip unreadable: {paths[i]}", file=sys.stderr)
                srv.states[i].frame_count += 1
        for i, st in enumerate(srv.states):
            nk = len(st.keyframes)
            if nk != last_kf[i]:
                last_kf[i] = nk
                if ckpts[i] is not None and cfg.checkpoint_every and (
                    nk % cfg.checkpoint_every == 0
                ):
                    if engines is not None:
                        srv.sync_host(i)  # checkpoint needs positions
                    ckpts[i].save(nk, st)
    dt = time.perf_counter() - t0

    for i, (root, seq) in enumerate(zip(roots, seqs)):
        if engines is not None:
            st = srv.finalize(i)
        else:
            st = finalize(srv.states[i])
            srv.states[i] = st
        if ckpts[i] is not None:
            ckpts[i].save(len(st.keyframes), st)
            ckpts[i].close()
        if args.output:
            _write_trajectory(_stream_output_path(args.output, i), st, seq)
        ate, n_traj = _ate(st, seq)
        tag = f"stream {i} ({root})"
        if ate is not None:
            print(f"{tag}: ATE RMSE {ate:.4f} m over {n_traj} frames")
        elif args.verbose:
            print(f"{tag}: {n_traj} frames (no ground truth)", file=sys.stderr)
    print(
        f"served {frames_done} frames over {n} streams in {dt:.1f}s "
        f"({frames_done / max(dt, 1e-9):.2f} frames/s aggregate)",
        file=sys.stderr if not args.verbose else sys.stdout,
    )
    return 0


def _rot_to_quat(R):
    """3x3 -> (qx, qy, qz, qw)."""
    import numpy as np

    t = np.trace(R)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        w = 0.25 / s
        x = (R[2, 1] - R[1, 2]) * s
        y = (R[0, 2] - R[2, 0]) * s
        z = (R[1, 0] - R[0, 1]) * s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = 2.0 * np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12))
        q = [0.0, 0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q[0], q[1], q[2], q[3]
    return (x, y, z, w)


if __name__ == "__main__":
    raise SystemExit(main())
