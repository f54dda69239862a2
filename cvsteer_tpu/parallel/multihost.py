"""Multi-host runtime: initialization, barriers, consistency checks,
heartbeat failure detection (SURVEY.md section 5).

The reference is single-process; the SLAM engine scales across hosts via
jax.distributed. This module wraps the runtime pieces:

- :func:`initialize_distributed` — jax.distributed.initialize with env
  fallbacks; safe no-op for single-host runs.
- :func:`device_barrier` — an all-device psum acting as a global barrier.
- :func:`allreduce_checksum` — cross-host determinism check: every host
  contributes a checksum of (its shard of) an array; mismatching
  replicated values indicate divergent host state (the device-code analog
  of a race detector, per SURVEY section 5).
- :class:`Heartbeat` — periodic barrier on a daemon thread; a missed
  deadline triggers the failure callback (checkpoint-and-exit in the VO
  driver), giving checkpoint-based elastic recovery.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime; returns True if distributed.

    Falls back to env (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) and is a no-op when neither arguments nor env are set
    (single-host dev) or when already initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:
        # already initialized
        return jax.process_count() > 1


def device_barrier() -> float:
    """Block until every device participates; returns the summed token.

    pmap maps over *local* devices only (the collective still spans all
    processes in a multi-host SPMD run), so the token must be sized by
    local_device_count — a global-sized token raises on any multi-host
    cluster and would spuriously trip the Heartbeat failure path."""
    n_local = jax.local_device_count()
    token = jnp.ones((n_local,))
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(token)
    return float(np.asarray(out)[0])


def allreduce_checksum(x: jax.Array, axis_name: str) -> jax.Array:
    """Inside shard_map/pmap: psum'd checksum of each shard.

    All participants receive the same value; comparing it against a locally
    recomputed expectation (or across steps) detects silent divergence."""
    local = jnp.sum(jnp.abs(x).astype(jnp.float64 if x.dtype == jnp.float64 else jnp.float32))
    return jax.lax.psum(local, axis_name)


class Heartbeat:
    """Periodic liveness probe with a failure callback.

    Every ``interval_s`` a device barrier runs on a daemon thread; if it
    does not complete within ``timeout_s`` (a host dropped out of the
    collective), ``on_failure`` fires once. Use with SlamCheckpointer to
    implement checkpoint-based restart."""

    def __init__(
        self,
        interval_s: float = 30.0,
        timeout_s: float = 120.0,
        on_failure: Optional[Callable[[], None]] = None,
    ):
        self.interval_s = interval_s
        self.timeout_s = timeout_s
        self.on_failure = on_failure
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.beats = 0
        self.failed = False

    def _probe_once(self) -> bool:
        done = threading.Event()

        def probe():
            try:
                device_barrier()
                done.set()
            except Exception:
                pass

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        return done.wait(self.timeout_s)

    def _loop(self):
        while not self._stop.wait(self.interval_s):
            if self._probe_once():
                self.beats += 1
            else:
                self.failed = True
                if self.on_failure is not None:
                    self.on_failure()
                return

    def start(self) -> "Heartbeat":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
