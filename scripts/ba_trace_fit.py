"""Pin the config-5 scaling model's compute term on-chip (VERDICT r3 item 4).

Round 3's analytic efficiency table fed on a BA iteration-time fit
measured only at L in {1024, 8192}, then evaluated it at L = 1e4..1e6 —
a 12-40x extrapolation. This script device-traces `bundle_adjust`
(C=8, the window-BA camera count) at L spanning the table's own range,
measures the iteration time at EVERY L the efficiency table evaluates
(plus anchors) and the C-scaling multiplier at L=1e5, then regenerates
the table (SCALING_r04.json) with every compute input MEASURED — no fit
at all (the first pass showed us/landmark is not affine in L).

If VMEM/HBM limits bite at the largest L, the failure is caught and
recorded in the artifact instead of silently shrinking the range.

Run on the real chip:  python scripts/ba_trace_fit.py SCALING_r04.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

C = 8
ITERS = 8
# includes every L the efficiency table evaluates (10k, 100k, 1M), so its
# compute inputs are MEASURED, not fitted: the first on-chip pass showed
# us/landmark is NOT affine across the range (0.069 at L=1k -> 0.024 at
# 64k -> 0.035 at 300k; cache locality vs HBM streaming), so a global
# A + B*L fit misstates the small-L rows by ~4x
LS = [1024, 8192, 10_000, 65_536, 100_000, 300_000, 1_000_000]
CS_AT_1E5 = [16, 32]  # validate the table's linear-in-C compute model


def trace_ba_iter_us(L: int, cams: int = C) -> dict:
    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.slam import se3
    from cvsteer_tpu.slam.ba import BAProblem, BAState, bundle_adjust
    from cvsteer_tpu.utils.profiling import trace_device_us

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 10], (L, 3)), jnp.float32)
    R = se3.exp_so3(jnp.asarray(rng.normal(0, 0.05, (cams, 3)), jnp.float32))
    t = jnp.asarray(
        np.stack([[0.4 * c, 0.0, 0.0] for c in range(cams)]), jnp.float32
    )
    p = jnp.einsum("cij,lj->cli", R, X) + t[:, None, :]
    problem = BAProblem(
        uv=p[..., :2] / p[..., 2:3],
        mask=p[..., 2] > 0.5,
        fixed_cameras=jnp.asarray([True] + [False] * (cams - 1)),
        huber_delta=0.0,
    )
    init = BAState(R=R, t=t, X=X + 0.05)

    fn = jax.jit(lambda s, pr: bundle_adjust(s, pr, iterations=ITERS))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(init, problem))
    compile_s = time.perf_counter() - t0

    us = trace_device_us(
        lambda: jax.block_until_ready(fn(init, problem)), iters=3
    )
    # wall as a cross-check (includes tunnel RTT; device trace is primary)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(init, problem))
    wall_us = (time.perf_counter() - t0) * 1e6
    return {
        "L": L, "C": cams, "iters": ITERS,
        "iter_device_us": round(us / ITERS, 2),
        "iter_wall_us": round(wall_us / ITERS, 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r04.json"
    points, failures = [], []
    for L in LS:
        try:
            r = trace_ba_iter_us(L)
            points.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:  # OOM at large L is a finding, not a crash
            failures.append({"L": L, "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(failures[-1]), flush=True)

    if len(points) < 2:
        print("not enough points to fit", file=sys.stderr)
        return 1
    t1 = {p["L"]: p["iter_device_us"] for p in points}

    # C-scaling validation at L=1e5: the table assumes iter time linear
    # in C; measure the actual multiplier
    c_scale = {C: 1.0}
    base_1e5 = t1.get(100_000)
    for cams in CS_AT_1E5:
        try:
            r = trace_ba_iter_us(100_000, cams=cams)
            points.append(r)
            print(json.dumps(r), flush=True)
            if base_1e5:
                c_scale[cams] = round(r["iter_device_us"] / base_1e5, 3)
        except Exception as e:
            failures.append({"L": 100_000, "C": cams,
                             "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(failures[-1]), flush=True)

    from scaling_bench import analytic_ba_efficiency

    out = analytic_ba_efficiency(
        out_path, measured_points=points, t1_table=t1, c_scale=c_scale,
    )
    if failures:
        out["inputs"]["measurement_failures"] = failures
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({
        "t1_us_by_L": t1, "c_scale": c_scale,
        "measured_L_range": [min(t1), max(t1)],
        "out": out_path,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
