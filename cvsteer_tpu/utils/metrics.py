"""Structured per-step metrics and logging (SURVEY.md section 5).

The reference logs nothing (its --verbose flag is dead, quirk C23). Here a
small host-side metrics channel records counters/gauges/rates and emits
structured JSON log lines from process 0 only — the multi-host-safe analog
of per-step frames/s, match inlier ratio, and BA residual logging.
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict
from typing import Dict, Optional, TextIO


def _is_host_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class Metrics:
    """Counters, gauges and a rolling frames/s meter."""

    def __init__(self, stream: Optional[TextIO] = None):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self._t0 = time.perf_counter()
        self._frames = 0
        self.stream = stream if stream is not None else sys.stderr

    def count(self, name: str, n: float = 1.0) -> None:
        self.counters[name] += n

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    def frame(self, n: int = 1) -> None:
        self._frames += n

    @property
    def fps(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._frames / dt if dt > 0 else 0.0

    def snapshot(self) -> Dict[str, float]:
        out = dict(self.counters)
        out.update(self.gauges)
        out["fps"] = round(self.fps, 2)
        out["uptime_s"] = round(time.perf_counter() - self._t0, 3)
        return out

    def log(self, step: Optional[int] = None, **extra) -> None:
        """Emit one JSON log line (host 0 only)."""
        if not _is_host_zero():
            return
        rec = {"ts": round(time.time(), 3)}
        if step is not None:
            rec["step"] = step
        rec.update(self.snapshot())
        rec.update(extra)
        print(json.dumps(rec), file=self.stream)


class StepTimer:
    """Context manager accumulating wall-time per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    class _Span:
        def __init__(self, timer: "StepTimer", name: str):
            self.timer = timer
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            self.timer.totals[self.name] += time.perf_counter() - self.t0
            self.timer.counts[self.name] += 1
            return False

    def span(self, name: str) -> "StepTimer._Span":
        return StepTimer._Span(self, name)

    def means_ms(self) -> Dict[str, float]:
        return {
            k: round(1e3 * self.totals[k] / max(self.counts[k], 1), 3)
            for k in self.totals
        }
