"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The sharded front-end (data x space mesh, ring halo exchange) must be
numerically identical to the single-device pipeline — the halo exchange
supplies exactly the rows REFLECT_101 padding would otherwise see
(SURVEY.md sections 2.3 and 5).
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvsteer_tpu.filters.g2 import g2_bank, steerable_pipeline_g2
from cvsteer_tpu.ops.sepconv import filter_bank_xla
from cvsteer_tpu.parallel import halo_exchange_rows, make_mesh, sharded_g2_maps
from cvsteer_tpu.parallel.frontend_sharded import shard_batch


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "space": 2})
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (4, 2)
    mesh2 = make_mesh({"data": -1, "space": 2})
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "space": 2})


def test_halo_exchange_matches_reflect_pad(rng):
    """Gathered halo blocks == REFLECT_101 rows of the full image."""
    from jax.sharding import PartitionSpec as P

    H, W, r = 64, 16, 4
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    mesh = make_mesh({"space": 8})

    fn = jax.shard_map(
        lambda blk: halo_exchange_rows(blk, r, "space"),
        mesh=mesh,
        in_specs=(P("space", None),),
        out_specs=P("space", None),
    )
    out = np.asarray(fn(x))  # [8 * (4 + 4 + 4), W]

    padded = np.pad(np.asarray(x), ((r, r), (0, 0)), mode="reflect")
    h_loc = H // 8
    for d in range(8):
        blk = out[d * (h_loc + 2 * r) : (d + 1) * (h_loc + 2 * r)]
        np.testing.assert_array_equal(blk, padded[d * h_loc : d * h_loc + h_loc + 2 * r])


def test_filter_bank_valid_rows_matches_padded(rng):
    bank = g2_bank()
    r = bank.radius
    img = jnp.asarray(rng.standard_normal((24, 40)), jnp.float32)
    full = filter_bank_xla(img, bank.xtaps, bank.ytaps)
    pre = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    valid = filter_bank_xla(pre, bank.xtaps, bank.ytaps, pad_axes=(False, True))
    np.testing.assert_allclose(np.asarray(valid), np.asarray(full), rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("axes", [{"data": 8}, {"data": 2, "space": 4}, {"space": 8}])
def test_sharded_g2_maps_matches_single_device(rng, axes):
    mesh = make_mesh(axes)
    B, H, W = axes.get("data", 1) * 2, 64, 48
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)), jnp.float32)

    ref = steerable_pipeline_g2(imgs, method="xla")
    placed = shard_batch(imgs, mesh)
    edges, dark, bright = sharded_g2_maps(placed, mesh)

    np.testing.assert_allclose(np.asarray(edges), np.asarray(ref.edges), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dark), np.asarray(ref.lines_dark), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bright), np.asarray(ref.lines_bright), rtol=1e-5, atol=1e-4)


def test_sharded_g2_maps_jit_compiles(rng):
    mesh = make_mesh({"data": 2, "space": 4})
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 64, 48)), jnp.float32)
    fn = jax.jit(lambda x: sharded_g2_maps(x, mesh))
    edges, _, _ = fn(shard_batch(imgs, mesh))
    assert edges.shape == (4, 64, 48)


def test_bundle_adjust_sharded_matches_single(rng):
    """Landmark-sharded distributed BA == single-device BA."""
    import sys
    sys.path.insert(0, "tests")
    from test_ba import _synthetic_ba
    from cvsteer_tpu.parallel.ba_sharded import (
        bundle_adjust_sharded,
        place_ba_inputs,
    )
    from cvsteer_tpu.slam.ba import bundle_adjust
    from cvsteer_tpu.slam import se3

    problem, gt, init = _synthetic_ba(C=5, L=61, pose_err=0.02, point_err=0.05, drop=0.2)

    ref, ref_stats = bundle_adjust(init, problem, iterations=15)

    mesh = make_mesh({"data": 8})
    st, prob, L = place_ba_inputs(init, problem, mesh)  # pads 61 -> 64
    out, stats = bundle_adjust_sharded(st, prob, mesh, iterations=15)
    out = out._replace(X=out.X[:L])

    assert out.X.shape == init.X.shape
    assert float(stats.cost) < 1e-8
    # Sharded assembly sums per-shard partial Schur systems (psum) in a
    # different order than the single-device MXU dot; over 15 LM iterations
    # the accept/reject branching amplifies the rounding difference, so
    # agreement is to ~1e-3 while both converge to cost < 1e-8.
    ang = np.asarray(se3.rotation_geodesic(out.R, ref.R))
    assert ang.max() < 1e-3
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), atol=1e-3)


def test_bundle_adjust_sharded_jit(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_ba import _synthetic_ba
    from cvsteer_tpu.parallel.ba_sharded import bundle_adjust_sharded, place_ba_inputs

    problem, gt, init = _synthetic_ba(C=4, L=64, pose_err=0.02, point_err=0.05)
    mesh = make_mesh({"data": 4, "space": 2})
    st, prob, _ = place_ba_inputs(init, problem, mesh)
    fn = jax.jit(lambda s, p: bundle_adjust_sharded(s, p, mesh, iterations=10))
    out, stats = fn(st, prob)
    assert float(stats.cost) < float(stats.initial_cost)


def test_multihost_helpers_single_host():
    from cvsteer_tpu.parallel.multihost import (
        Heartbeat,
        allreduce_checksum,
        device_barrier,
        initialize_distributed,
    )
    from jax.sharding import PartitionSpec as P

    assert initialize_distributed() is False  # no coordinator configured
    assert device_barrier() == float(len(jax.devices()))

    mesh = make_mesh({"data": 8})
    x = jnp.arange(16.0).reshape(8, 2)
    fn = jax.shard_map(
        lambda blk: allreduce_checksum(blk, "data"),
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P(),
        check_vma=False,
    )
    total = float(fn(x))
    assert total == float(jnp.abs(x).sum())

    hb = Heartbeat(interval_s=0.05, timeout_s=30.0).start()
    import time as _t

    # Deadline-based, not fixed-sleep: on a loaded host the beat thread can
    # be starved well past interval_s, and a fixed sleep flakes.
    deadline = _t.monotonic() + 20.0
    while hb.beats < 2 and _t.monotonic() < deadline:
        _t.sleep(0.05)
    hb.stop()
    assert hb.beats >= 2 and not hb.failed


def test_sharded_filter_bank_g4(rng):
    """Generic sharded bank (G4/H4, 11 filters) == single-device result."""
    from cvsteer_tpu.filters.taps import g4h4_bank
    from cvsteer_tpu.parallel.frontend_sharded import sharded_filter_bank

    bank = g4h4_bank()
    mesh = make_mesh({"data": 2, "space": 4})
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 64, 48)), jnp.float32)
    ref = filter_bank_xla(imgs, bank.xtaps, bank.ytaps)
    placed = shard_batch(imgs, mesh)
    out = sharded_filter_bank(placed, bank.xtaps, bank.ytaps, mesh)
    assert out.shape == (4, 11, 64, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_fault_injection_recovery(tmp_path):
    """Kill one process of a 2-process cluster: the survivor's heartbeat
    must fire on_failure, write a checkpoint, and exit; a restarted process
    must resume from that checkpoint (SURVEY.md section 5 fault injection).

    Runs real subprocesses (CPU backend, Gloo collectives on localhost) so
    the production device_barrier / Heartbeat / SlamCheckpointer path is
    exercised end-to-end, not mocked.
    """
    import pathlib
    import signal
    import socket
    import subprocess
    import sys as _sys
    import time as _t

    worker = pathlib.Path(__file__).parent / "multihost_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = tmp_path

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), str(port), str(i), "2", str(out)],
            env=env,
        )
        for i in range(2)
    ]
    try:
        deadline = _t.time() + 90
        while _t.time() < deadline and not all(
            (out / f"ready_{i}").exists() for i in range(2)
        ):
            _t.sleep(0.2)
        assert (out / "ready_0").exists() and (out / "ready_1").exists(), (
            "workers never reached the startup barrier"
        )
        # both saw both devices
        assert float((out / "ready_0").read_text()) == 2.0

        procs[1].kill()  # drop a host

        # the survivor's heartbeat must fire and checkpoint-and-exit
        rc = procs[0].wait(timeout=60)
        assert rc == 42, f"survivor exited {rc}, expected the on_failure path"
        assert (out / "failed_0").exists()

        # elastic restart: a fresh (single-host) process resumes the state
        from cvsteer_tpu.slam.vo import VOConfig, init_vo
        from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

        ck = SlamCheckpointer(str(out / "ckpt"))
        assert ck.latest_step() == 1
        resumed = ck.restore(init_vo(VOConfig()))
        assert resumed.frame_count == 123
        ck.close()
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_checkpoint_config_mismatch_raises(tmp_path):
    """Resuming under a different VOConfig must fail loudly (round-2 fix:
    a silent window/threshold mismatch would mix optimization regimes)."""
    import pytest as _pytest

    from cvsteer_tpu.slam.vo import VOConfig, init_vo
    from cvsteer_tpu.utils.checkpoint import SlamCheckpointer

    ck = SlamCheckpointer(str(tmp_path / "ck"))
    st = init_vo(VOConfig(window=8))
    st.frame_count = 5
    st.trajectory.append((0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)))
    ck.save(1, st)
    ck.close()

    ck2 = SlamCheckpointer(str(tmp_path / "ck"))
    with _pytest.raises(ValueError, match="config differs"):
        ck2.restore(init_vo(VOConfig(window=4)))
    resumed = ck2.restore(
        init_vo(VOConfig(window=4)), allow_config_mismatch=True
    )
    assert resumed.frame_count == 5
    same = ck2.restore(init_vo(VOConfig(window=8)))
    assert same.frame_count == 5
    ck2.close()


def test_sharded_g4_maps_matches_single_device(rng):
    """G4 --mesh pipeline == single-device result (CLI g4 parity)."""
    from cvsteer_tpu.filters import g2 as fg2
    from cvsteer_tpu.filters.g4 import g4_bank, steerable_pipeline_g4
    from cvsteer_tpu.parallel import sharded_g4_maps

    bank = g4_bank()
    mesh = make_mesh({"data": 2, "space": 4})
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 64, 48)), jnp.float32)
    m = steerable_pipeline_g4(imgs, bank, method="xla")
    ref = (
        fg2.find_edges(m.magnitude, m.phase),
        fg2.find_dark_lines(m.magnitude, m.phase),
        fg2.find_bright_lines(m.magnitude, m.phase),
    )
    placed = shard_batch(imgs, mesh)
    out = sharded_g4_maps(placed, mesh, bank)
    for ours, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(want), rtol=1e-4, atol=1e-3
        )
