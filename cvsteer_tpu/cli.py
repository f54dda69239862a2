"""cvsteer-run equivalent: batch steerable-filter analysis of images.

TPU-native re-design of the reference CLI (example/steer.cpp:133-173):
  --input   single image, OR a .txt / extensionless newline-delimited list
            of image paths (parity with steer.cpp:156-165)
  --output  output directory; writes <base>_edges.png, <base>_lines_dark.png,
            <base>_lines_bright.png per image (steer.cpp:106-122)
  --gain    fixed 8-bit gain; <= 0 means per-image min-max normalize
            (steer.cpp:93-104). NOTE: the reference CLI has a bug (C23 in
            SURVEY.md) where --gain is parsed but the verbose bool is passed
            instead (steer.cpp:167-168); here --gain actually works.
  --filters g2 (default) or g4
  --verbose per-image progress logging (parsed-but-dead in the reference)

Where the reference parallelizes with a host thread pool over images
(cv::parallel_for_, steer.cpp:169), this CLI batches same-shaped images into
one device invocation (vmap over the batch) and pipelines host decode with
device compute.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import List

import numpy as np


def _expand_inputs(inp: str) -> List[str]:
    """Single file, or newline-delimited list if .txt / no extension."""
    p = Path(inp)
    if inp.endswith(".txt") or "." not in p.name:
        with open(inp) as f:
            return [line.strip() for line in f if line.strip()]
    return [inp]


def _basename(path: str) -> str:
    name = Path(path).name
    stem = name.rsplit(".", 1)[0] if "." in name else name
    return stem


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="cvsteer-run",
        description="Steerable-filter edge/line analysis (G2/H2 quadrature pair) on TPU.",
    )
    ap.add_argument("--input", required=True, help="input image or newline-delimited list file")
    ap.add_argument("--output", default="", help="output directory")
    ap.add_argument("--gain", type=float, default=0.0, help="gain for 8-bit output; <=0 = minmax normalize")
    ap.add_argument("--filters", choices=["g2", "g4"], default="g2")
    ap.add_argument("--width", type=int, default=None, help="kernel half-width (default: 4 for g2, 6 for g4)")
    ap.add_argument("--spacing", type=float, default=None, help="tap spacing (default: 0.67 g2, 0.5 g4)")
    ap.add_argument(
        "--mesh",
        default="",
        help="multi-device mesh, e.g. 'data=4,space=2' (-1 infers one axis); "
        "shards the batch over 'data' and image rows over 'space'",
    )
    ap.add_argument(
        "--batch", type=int, default=16,
        help="device batch size: same-shaped images dispatch as soon as this "
        "many have decoded (decode/compute/write overlap)",
    )
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cvsteer_tpu.io.imageio import imread_gray_f32, imwrite_u8
    from cvsteer_tpu.utils.imageproc import convert_scale_u8, normalize_minmax_u8

    filenames = _expand_inputs(args.input)
    if args.output:
        os.makedirs(args.output, exist_ok=True)

    if args.filters == "g2":
        from cvsteer_tpu.filters.g2 import (
            g2_bank,
            g2_output_maps,
            steerable_pipeline_g2,
        )

        bank = g2_bank(args.width or 4, args.spacing or 0.67)

        def pipeline(batch, bank=None, method="auto"):
            if jax.default_backend() == "tpu":
                # explicit FAST accuracy class (filters.g2.g2_output_maps):
                # fused bf16x3 maps kernel + bf16 writes — the CLI
                # quantizes to u8 right after, where bf16's 2^-9 rounding
                # is below the u8 step (docs/ROOFLINE.md round 3)
                import jax.numpy as jnp

                edges, dark, bright = g2_output_maps(
                    batch, bank, accuracy="fast", out_dtype=jnp.bfloat16
                )
                return {"edges": edges, "lines_dark": dark, "lines_bright": bright}
            return steerable_pipeline_g2(batch, bank, method=method)
    else:
        from cvsteer_tpu.filters.g4 import g4_bank, steerable_pipeline_g4

        bank = g4_bank(args.width or 6, args.spacing or 0.5)

        def pipeline(batch, bank=None, method="auto"):
            if jax.default_backend() == "tpu":
                # fused G4 maps kernel (round 2): one kernel per image
                import jax.numpy as jnp

                from cvsteer_tpu.ops.pallas_frontend import g4_maps_pallas

                edges, dark, bright = g4_maps_pallas(
                    batch, bank.xtaps, bank.ytaps, out_dtype=jnp.bfloat16
                )
                return {"edges": edges, "lines_dark": dark, "lines_bright": bright}
            m = steerable_pipeline_g4(batch, bank)
            # expose the same three output maps via the quadrature phase
            from cvsteer_tpu.filters import g2 as fg2

            edges = fg2.find_edges(m.magnitude, m.phase)
            dark = fg2.find_dark_lines(m.magnitude, m.phase)
            bright = fg2.find_bright_lines(m.magnitude, m.phase)
            return m._replace()._asdict() | {
                "edges": edges, "lines_dark": dark, "lines_bright": bright
            }

    mesh = None
    if args.mesh:
        from cvsteer_tpu.parallel import make_mesh

        try:
            axes = {}
            for part in args.mesh.split(","):
                name, _, size = part.partition("=")
                name = name.strip()
                if name not in ("data", "space"):
                    raise ValueError(
                        f"unknown mesh axis {name!r} (expected data/space)"
                    )
                axes[name] = int(size)
            mesh = make_mesh(axes)
        except ValueError as e:
            ap.error(f"invalid --mesh {args.mesh!r}: {e}")

    def _mesh_skip_reason(b, h):
        """None if the batch can shard; otherwise the human-readable reason."""
        if mesh is None:
            return "no mesh"
        nd = mesh.shape.get("data", 1)
        ns = mesh.shape.get("space", 1)
        if b % nd != 0:
            return f"batch {b} not divisible by data={nd}"
        if h % ns != 0:
            return f"rows {h} not divisible by space={ns}"
        if (h // ns) <= bank.radius:
            return f"row block {h // ns} <= kernel radius {bank.radius}"
        return None

    @functools.partial(jax.jit, static_argnames=("use_mesh",))
    def run_batch(batch, use_mesh):
        if use_mesh:
            from cvsteer_tpu.parallel import sharded_g2_maps, sharded_g4_maps

            sharded = sharded_g2_maps if args.filters == "g2" else sharded_g4_maps
            edges, dark, bright = sharded(batch, mesh, bank)
        else:
            maps = pipeline(batch, bank)
            if isinstance(maps, dict):
                edges, dark, bright = (
                    maps["edges"], maps["lines_dark"], maps["lines_bright"]
                )
            else:
                edges, dark, bright = maps.edges, maps.lines_dark, maps.lines_bright
        if args.gain > 0:
            to8 = lambda x: convert_scale_u8(x, args.gain)
        else:
            to8 = lambda x: normalize_minmax_u8(x, axes=(-2, -1))
        return to8(edges), to8(dark), to8(bright)

    # Pipelined execution (the TPU-native analog of the reference's
    # cv::parallel_for_ image loop, example/steer.cpp:169): images decode in
    # a host thread pool (the native codec releases the GIL), same-shaped
    # images accumulate into device batches that are dispatched
    # asynchronously as soon as they fill (jax dispatch returns before the
    # device finishes), and PNG encoding runs on the pool as results land —
    # so decode, device compute, and writes genuinely overlap.
    import concurrent.futures as cf

    t0 = time.time()
    n_done = 0
    pending = defaultdict(list)  # shape -> [(file index, image)]
    inflight = []  # (idxs, shape, device result triple)
    MAX_INFLIGHT = 3  # bound device memory on long file lists

    def flush(shape):
        entries = pending.pop(shape)
        idxs = [i for i, _ in entries]
        batch = jnp.stack([jnp.asarray(im) for _, im in entries])
        reason = _mesh_skip_reason(batch.shape[0], batch.shape[1])
        use_mesh = reason is None
        if mesh is not None and not use_mesh:
            print(
                f"mesh skipped for batch {tuple(batch.shape)}: {reason}",
                file=sys.stderr,
            )
        if use_mesh:
            from cvsteer_tpu.parallel import shard_batch

            batch = shard_batch(batch, mesh)
        inflight.append((idxs, shape, run_batch(batch, use_mesh)))

    def write_maps(i, edges8, dark8, bright8):
        base = os.path.join(args.output, _basename(filenames[i]))
        imwrite_u8(base + "_edges.png", edges8)
        imwrite_u8(base + "_lines_dark.png", dark8)
        imwrite_u8(base + "_lines_bright.png", bright8)

    with cf.ThreadPoolExecutor() as pool:
        write_futs = []

        def drain_one():
            nonlocal n_done
            idxs, shape, result = inflight.pop(0)
            edges8, dark8, bright8 = jax.device_get(result)
            for j, i in enumerate(idxs):
                n_done += 1
                if args.verbose:
                    print(f"[{n_done}/{len(filenames)}] {filenames[i]} {shape}")
                if args.output:
                    write_futs.append(
                        pool.submit(write_maps, i, edges8[j], dark8[j], bright8[j])
                    )

        # ordered parallel decode: the pool races ahead of consumption
        for i, img in enumerate(pool.map(imread_gray_f32, filenames)):
            if img is None:
                if args.verbose:
                    print(f"skip unreadable: {filenames[i]}", file=sys.stderr)
                continue
            pending[img.shape].append((i, img))
            if len(pending[img.shape]) >= args.batch:
                flush(img.shape)
            while len(inflight) > MAX_INFLIGHT:  # bound device-side results
                drain_one()
        for shape in list(pending):
            flush(shape)
        while inflight:
            drain_one()
        for f in write_futs:
            f.result()
    if args.verbose:
        dt = time.time() - t0
        print(f"processed {n_done} images in {dt:.3f}s ({n_done / max(dt, 1e-9):.1f} im/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
