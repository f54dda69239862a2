"""Per-op device-time breakdown of the G4 feature pipeline (VERDICT r4
item 5): where do g4_feature's ~1,264 us/frame go vs G2's 383?

Traces the same jitted step bench.py measures (order=4 frontend: 11-filter
G4/H4 basis bank -> 11-map detect -> cp=16 patch-DMA descriptors) and
prints the top device ops, grouped into pipeline stages by op-name
pattern. Run on the real chip; CPU trace gives stage RATIOS only.

Usage: python scripts/profile_g4.py [--batch 32] [--order 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--platform", default="default")
    args = ap.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvsteer_tpu.features.frontend import FrontendConfig, extract_features
    from cvsteer_tpu.utils.profiling import trace_device_events

    FB, FH, FW = args.batch, 480, 640
    cfg = FrontendConfig(order=args.order)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (FB, FH, FW)).astype("float32"))

    @jax.jit
    def step(x):
        f = extract_features(x, cfg=cfg)
        return (
            jnp.sum(f.score) + jnp.sum(f.desc) + jnp.sum(f.yx)
            + jnp.sum(f.theta)
        )

    float(step(x))  # compile
    iters = 4
    dur = trace_device_events(lambda: float(step(x)), iters=iters)

    stages = {
        "basis_conv": ("conv", "sepconv", "g4_maps", "pallas_frontend",
                       "custom-call"),
        "detect_topk": ("approx_max_k", "top_k", "sort", "max_pool",
                        "reduce_window", "iota"),
        "descriptors": ("gather", "desc", "patch", "dynamic_slice",
                        "take"),
        "elementwise": ("fusion", "add", "mul", "broadcast"),
    }
    by_stage: dict = {}
    rows = sorted(dur.items(), key=lambda kv: -kv[1])
    total = sum(dur.values())
    print(f"total device us/frame: {total / iters / FB:.1f}  "
          f"(batch {FB}, order {args.order})")
    for name, us in rows[: args.top]:
        stage = next(
            (s for s, pats in stages.items()
             if any(p in name.lower() for p in pats)),
            "other",
        )
        by_stage[stage] = by_stage.get(stage, 0.0) + us
        print(f"  {us / iters / FB:9.2f} us/frame  [{stage:<11}] {name[:90]}")
    rest = total - sum(
        us for name, us in rows[: args.top]
    )
    print(f"  {rest / iters / FB:9.2f} us/frame  [tail]")
    print("stage totals (top ops):")
    for s, us in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        print(f"  {s:<12} {us / iters / FB:9.2f} us/frame")
    return 0


if __name__ == "__main__":
    sys.exit(main())
