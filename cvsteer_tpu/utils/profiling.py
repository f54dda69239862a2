"""Profiling hooks: jax.profiler traces + named step annotations.

SURVEY.md section 5 (tracing): the reference has none; here every pipeline
stage can be wrapped in a TraceAnnotation so device timelines in the
profiler UI show filter-bank / matcher / BA spans, and whole runs can dump
an XPlane trace directory for offline analysis.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_session(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block (no-op if dir empty)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def step_annotation(name: str, step: Optional[int] = None) -> Iterator[None]:
    with jax.profiler.StepTraceAnnotation(name, step_num=step or 0):
        yield


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
