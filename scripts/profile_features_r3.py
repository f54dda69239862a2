"""Round-3 stage isolation of extract_features on the chip.

Cut-down variants of the TPU fast path (pyramid+detmaps / +detect /
+desc = full), each a separate jit; total TPU device-event time per
frame from jax.profiler traces. Run: python scripts/profile_features_r3.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.features import frontend as ffe
from cvsteer_tpu.features.frontend import FrontendConfig
from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.ops.pyramid import gaussian_pyramid
from cvsteer_tpu.ops.pallas_frontend import g2_features_full_pallas

B, H, W = 8, 480, 640
ITERS = 10


def device_total_us(fn, x, tag):
    from cvsteer_tpu.utils.profiling import trace_device_events

    @jax.jit
    def chain(x, carry):
        out = fn(x + carry * 1e-6)
        leaves = jax.tree.leaves(out)
        # consume EVERY element of every output: a single-element slice
        # lets XLA dead-code-eliminate whole stages (this script's round-3
        # numbers understated the descriptor gathers exactly that way)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return carry + s * 1e-9

    c = jnp.float32(0.0)
    float(chain(x, c))

    def run_once():
        c = jnp.float32(0.0)
        for _ in range(ITERS):
            c = chain(x, c)
        float(c)

    dur = trace_device_events(run_once, iters=1, logdir=f"/tmp/pf_r3_{tag}")
    total = sum(dur.values()) / ITERS / B
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:12]
    return total, [(k, v / ITERS / B) for k, v in top]


def main():
    cfg = FrontendConfig()
    bank = fg2.g2_bank()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))

    def maps_only(imgs):
        levels = gaussian_pyramid(imgs, cfg.levels)
        outs = []
        for lv in levels:
            outs.append(g2_features_full_pallas(
                lv, bank.xtaps, bank.ytaps,
                threshold=cfg.threshold, nms_radius=cfg.nms_radius))
        return outs

    def maps_detect(imgs):
        from cvsteer_tpu.features.keypoints import detect_keypoints_packed
        levels = gaussian_pyramid(imgs, cfg.levels)
        kps = []
        for lv in levels:
            p3, dym, dxm, ctm, stm, basis = g2_features_full_pallas(
                lv, bank.xtaps, bank.ytaps,
                threshold=cfg.threshold, nms_radius=cfg.nms_radius)
            kp = jax.vmap(lambda p, dy, dx, c, si: detect_keypoints_packed(
                p, dy, dx, c, si, max_keypoints=cfg.keypoints_per_level,
            ))(p3, dym, dxm, ctm, stm)
            kps.append((kp, basis))
        return [k for k, _ in kps]

    def full(imgs):
        return ffe.extract_features(imgs, bank, cfg)

    prev = 0.0
    for tag, fn in [("maps", maps_only), ("detect", maps_detect), ("full", full)]:
        total, top = device_total_us(fn, x, tag)
        print(f"\n== {tag}: {total:.1f} us/frame (delta {total - prev:+.1f})")
        for k, v in top:
            print(f"   {v:7.2f}  {k[:100]}")
        prev = total


if __name__ == "__main__":
    main()
