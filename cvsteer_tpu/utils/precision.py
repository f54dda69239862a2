"""Trace-time matmul-precision guard for geometry/SLAM numerics.

TPU lowers fp32 matmuls to bfloat16 MXU passes by DEFAULT (one pass:
~2^-8 relative). That is the right trade for the throughput kernels —
they opt into bf16x3 or Precision.HIGHEST explicitly where it matters —
but it silently corrupts small geometry algebra: the 8-point normal
matrix, epipolar residuals, triangulation and PnP chains run through
dozens of tiny matmuls whose errors compound into pose estimates.

Measured (round 3): the synthetic VO streams' per-stream ATE at the
default precision ranged 0.02–0.29 m across 32 seeds ON TPU while the
same code on CPU (fp32 exact) sat at 0.02–0.06 m — the "one hard seed"
fleet tail was bf16 matmul noise, not data. With HIGHEST forced at every
SLAM jit boundary the TPU matches CPU.

``precise`` wraps a function so everything traced inside it defaults to
Precision.HIGHEST. Apply it UNDER ``jax.jit`` (the context must be live
while tracing). It deliberately does not touch process-global config —
library users' own models keep their own defaults.
"""

from __future__ import annotations

import functools

import jax


def precise(fn):
    """Run/trace ``fn`` with default matmul precision = HIGHEST."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
