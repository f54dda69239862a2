"""End-to-end VO demo: render a synthetic textured sequence, run the full
image pipeline (steerable features -> VO -> windowed BA -> loop closure),
report ATE RMSE against ground truth.

Generates a TUM-RGBD-layout dataset on the fly (PNGs through the native
codec), so it exercises exactly what `python -m cvsteer_tpu.cli_vo` runs on
real data. Usage:

  python scripts/demo_vo.py [--frames 60] [--size 160 120] [--loop]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render_dataset(root: Path, n_frames: int, w: int, h: int, loop: bool, seed=3):
    import jax.numpy as jnp

    from cvsteer_tpu.io.imageio import imwrite_u8
    from cvsteer_tpu.slam import se3

    fx = fy = 1.2 * min(w, h)
    cx, cy = w / 2.0, h / 2.0

    rng = np.random.default_rng(seed)
    n_pts = 160
    X = rng.uniform([-4, -2.5, -4], [4, 2.5, 4], (n_pts, 3)).astype(np.float32)
    attrs = np.stack(
        [
            rng.uniform(0.5, 1.0, n_pts),
            rng.uniform(0, np.pi, n_pts),
            rng.uniform(2.2, 3.5, n_pts),
            rng.uniform(0.8, 1.3, n_pts),
        ],
        1,
    )

    def pose(k):
        s = k / max(n_frames - 1, 1)
        if loop:  # out-and-back: revisits the start -> loop closures fire
            f = 2 * s if s <= 0.5 else 2 * (1 - s)
            c = np.array([3.0 * f, 0.3 * np.sin(2 * np.pi * f), -8.0 + 2.5 * f])
            z = np.array([0.1 * np.sin(np.pi * f), 0.0, 1.0])
            z = z / np.linalg.norm(z)
        else:  # forward + lateral sweep
            c = np.array([3.0 * s, 0.4 * np.sin(2 * np.pi * s), -8.0 + 3.0 * s])
            z = np.array([0.12 * np.sin(2 * np.pi * s), 0.0, 1.0])
            z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).T.astype(np.float32)
        return R, (-R @ c).astype(np.float32)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    (root / "rgb").mkdir(parents=True)
    rgb_lines, gt_lines = [], []
    for k in range(n_frames):
        R, t = pose(k)
        p = X @ R.T + t
        z = p[:, 2]
        u = fx * p[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * p[:, 1] / np.maximum(z, 1e-6) + cy
        img = np.zeros((h, w), np.float32)
        for i in range(n_pts):
            if z[i] < 0.5 or not (-12 < u[i] < w + 12 and -12 < v[i] < h + 12):
                continue
            amp, ang, s1, s2 = attrs[i]
            ca, sa = np.cos(ang), np.sin(ang)
            dx, dy = xs - u[i], ys - v[i]
            a = ca * dx + sa * dy
            b = -sa * dx + ca * dy
            img += amp * np.exp(-(a * a / (2 * s1 * s1) + b * b / (2 * s2 * s2)))
        img8 = (img / max(img.max(), 1e-6) * 220.0 + 16.0).astype(np.uint8)
        rel = f"rgb/{k:04d}.png"
        imwrite_u8(str(root / rel), img8)
        stamp = 1000.0 + 0.1 * k
        rgb_lines.append(f"{stamp:.6f} {rel}")
        Rwc = R.T
        c = -Rwc @ t
        qw = np.sqrt(max(1 + np.trace(Rwc), 1e-12)) / 2
        qx = (Rwc[2, 1] - Rwc[1, 2]) / (4 * qw)
        qy = (Rwc[0, 2] - Rwc[2, 0]) / (4 * qw)
        qz = (Rwc[1, 0] - Rwc[0, 1]) / (4 * qw)
        gt_lines.append(
            f"{stamp:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    (root / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    return fx, fy, cx, cy


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", nargs=2, type=int, default=[160, 120])
    ap.add_argument("--loop", action="store_true", help="closed-orbit trajectory")
    ap.add_argument("--keep", default="", help="keep the dataset at this path")
    ap.add_argument(
        "--platform",
        default="cpu",
        choices=["cpu", "default"],
        help="cpu (default): force the CPU backend — the demo's tiny "
        "per-frame host-driven dispatches are tunnel-RTT-bound on the "
        "remote TPU; 'default' keeps the session backend. NOTE: the "
        "JAX_PLATFORMS env var alone is IGNORED once the axon PJRT "
        "plugin registers; only this config update works.",
    )
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    w, h = args.size
    tmp = Path(args.keep) if args.keep else Path(tempfile.mkdtemp(prefix="cvsteer_demo_"))
    print(f"rendering {args.frames} frames at {w}x{h} -> {tmp}", file=sys.stderr)
    fx, fy, cx, cy = render_dataset(tmp, args.frames, w, h, args.loop)

    from cvsteer_tpu import cli_vo

    overrides = [
        f"camera.fx={fx}", f"camera.fy={fy}", f"camera.cx={cx}", f"camera.cy={cy}",
        "frontend.levels=2", "frontend.keypoints_per_level=128",
        "frontend.threshold=0.5",
        "slam.kf_max_gap=4", "slam.window=8", "slam.min_parallax=0.01",
        "slam.init_min_inliers=15", "slam.track_min_landmarks=15",
        "slam.huber_delta=0.01",
    ]
    if args.loop:
        overrides += ["slam.loop_closure=true", "slam.loop_min_inliers=20"]
    return cli_vo.main(["--input", str(tmp), "--set", *overrides, "--verbose"])


if __name__ == "__main__":
    sys.exit(main())
