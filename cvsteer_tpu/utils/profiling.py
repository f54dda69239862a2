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
    """Per-device memory stats (bytes) where the backend exposes them.

    Backends without allocator stats (``d.memory_stats()`` returns None —
    e.g. the tunneled axon TPU client) fall back to live-array accounting:
    the summed on-device bytes of every live jax.Array on that device.
    That is bytes-in-use by program state (no allocator overhead or
    transient scratch), so callers wanting a peak should SAMPLE it at
    high-water moments (see utils.profiling.MemoryHighWater)."""
    out = {}
    live = None
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
            continue
        if live is None:
            live = [a for a in jax.live_arrays() if a.is_fully_addressable]
        n = 0
        for a in live:
            try:
                if d in a.devices():
                    n += a.nbytes // len(a.devices())
            except Exception:
                continue
        out[str(d)] = {"live_array_bytes": int(n), "source": "live_arrays"}
    return out


class MemoryHighWater:
    """Rolling high-water mark over :func:`device_memory_stats` samples.

    ``sample()`` after allocation-heavy moments (keyframe promotion,
    closure events); ``peak`` holds the per-device maximum of every field
    seen. Gives a real peak envelope on backends whose allocator exposes
    none (the live-array fallback only measures the sampled instants)."""

    def __init__(self):
        self.peak: dict = {}
        self.samples = 0

    def sample(self) -> dict:
        cur = device_memory_stats()
        self.samples += 1
        for dev, fields in cur.items():
            slot = self.peak.setdefault(dev, {})
            for k, v in fields.items():
                if isinstance(v, (int, float)):
                    slot[k] = max(slot.get(k, 0), v)
                else:
                    slot[k] = v
        return cur


def trace_device_events(run_once, iters: int = 4, logdir: str = "/tmp/cvsteer_trace"):
    """Per-op TPU device-event durations (us, summed over ``iters`` calls).

    The canonical trace-walk shared by bench.py and the profiling scripts
    (previously copy-pasted with drift): runs ``run_once`` under a
    jax.profiler trace and returns a Counter {op_name: total_us} of leaf
    device events — module-level ``jit_*`` events are excluded because
    they double-count their children. Divide by ``iters`` for per-call.
    """
    import collections
    import glob
    import gzip
    import json
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            run_once()
    dur = collections.Counter()
    for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        pids = {
            e["pid"]: e["args"].get("name")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
                if not e["name"].startswith("jit_"):
                    dur[e["name"]] += e.get("dur", 0)
    return dur


def trace_device_us(run_once, iters: int = 4) -> float:
    """Total device us per ``run_once`` call (see trace_device_events)."""
    return sum(trace_device_events(run_once, iters).values()) / iters
