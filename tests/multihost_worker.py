"""Subprocess worker for the multi-process fault-injection test.

Usage: python multihost_worker.py <port> <process_id> <num_processes> <outdir>

Each worker joins a 2-process CPU jax.distributed cluster, confirms a
cross-process device barrier, then runs a Heartbeat. The test kills one
worker; the survivor's heartbeat must fire on_failure, which exercises the
production checkpoint-and-exit recovery path (parallel/multihost.py +
utils/checkpoint.py): it saves a VOState checkpoint and exits with a
distinct code. Run directly, never imported by pytest collection.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # no virtual device multiplication here

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    port, pid, n, outdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    from cvsteer_tpu.parallel.multihost import Heartbeat, device_barrier

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=n, process_id=pid
    )
    barrier_sum = device_barrier()
    with open(os.path.join(outdir, f"ready_{pid}"), "w") as f:
        f.write(str(barrier_sum))

    def on_failure():
        # production recovery path: checkpoint the SLAM state, then exit so
        # a supervisor can restart the job from the checkpoint
        from cvsteer_tpu.slam.vo import VOConfig, init_vo
        from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

        state = init_vo(VOConfig())
        state.frame_count = 123  # sentinel the test asserts on after resume
        ck = SlamCheckpointer(os.path.join(outdir, "ckpt"))
        # the cluster is broken: orbax's collective save would deadlock
        # waiting for the dead peer — use the collective-free path
        ck.emergency_save(1, state)
        with open(os.path.join(outdir, f"failed_{pid}"), "w") as f:
            f.write("heartbeat failure")
        os._exit(42)

    hb = Heartbeat(interval_s=1.0, timeout_s=5.0, on_failure=on_failure).start()
    deadline = time.time() + 120.0
    while time.time() < deadline:
        time.sleep(0.25)
    hb.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
