"""Checkpoint / resume of SLAM state (SURVEY.md section 5, checkpointing).

The reference has no persistent state; the SLAM engine does: keyframe poses
and features, the landmark map, and the trajectory. Checkpoints are Orbax
PyTree checkpoints (atomic, versioned by step) of a pure-array tree, so
long sequences resume mid-run and multi-host runs restart after a lost
host.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

import orbax.checkpoint as ocp

from cvsteer_tpu.features.frontend import Features
from cvsteer_tpu.slam.vo import Keyframe, VOState


def _config_json(cfg) -> str:
    """Nested NamedTuple config -> canonical JSON (for mismatch detection)."""

    def conv(v):
        if hasattr(v, "_asdict"):
            return {k: conv(x) for k, x in v._asdict().items()}
        return v

    return json.dumps(conv(cfg), sort_keys=True)


def _padded_refs(state: VOState):
    """state.traj_ref padded with None to max(len(trajectory), 1): keeps
    the serialized row count aligned with the trajectory (and non-zero,
    which orbax requires)."""
    n = max(len(state.trajectory), 1)
    refs = list(state.traj_ref[:n])
    refs += [None] * (n - len(refs))
    return refs


def _state_to_tree(state: VOState) -> Dict[str, Any]:
    tree: Dict[str, Any] = {
        "landmarks": np.asarray(state.landmarks),
        "landmark_valid": np.asarray(state.landmark_valid),
        "num_landmarks": np.asarray(state.num_landmarks),
        "frame_count": np.asarray(state.frame_count),
        "initialized": np.asarray(state.initialized),
        # scale-governor rolling histories (round 5): a restore must keep
        # the speed continuity for re-inits and the ground smoothing warm
        # (padded with a leading count so zero-length survives orbax)
        "kf_speeds": np.asarray(
            [len(state.kf_baselines)] + list(state.kf_baselines), np.float32
        ),
        "ground_hist": np.asarray(
            [len(state.ground_hist)] + list(state.ground_hist), np.float32
        ),
        "traj_frames": np.asarray([f for f, _, _ in state.trajectory], np.int64),
        "traj_R": np.stack([R for _, R, _ in state.trajectory])
        if state.trajectory
        else np.zeros((0, 3, 3), np.float32),
        "traj_t": np.stack([t for _, _, t in state.trajectory])
        if state.trajectory
        else np.zeros((0, 3), np.float32),
        # traj_ref rows (vo.VOState.traj_ref): keyframe entries (None)
        # flatten to ref = -1 rows; padded to len(trajectory) — states
        # assembled without _append_traj carry an empty traj_ref, and
        # orbax refuses zero-size arrays
        "traj_ref_meta": np.asarray(
            [
                [r[0], r[3]] if r is not None else [-1, -1]
                for r in _padded_refs(state)
            ],
            np.int64,
        ).reshape(-1, 2),
        "traj_ref_R": np.stack(
            [
                r[1] if r is not None else np.eye(3, dtype=np.float32)
                for r in _padded_refs(state)
            ]
        ),
        "traj_ref_tb": np.asarray(
            [
                np.concatenate([r[2], [r[4]]]) if r is not None
                else np.zeros(4, np.float32)
                for r in _padded_refs(state)
            ],
            np.float32,
        ).reshape(-1, 4),
    }
    kfs = {}
    for n, kf in enumerate(state.keyframes):
        kfs[str(n)] = {
            "index": np.asarray(kf.index),
            "R": np.asarray(kf.R),
            "t": np.asarray(kf.t),
            "landmark_ids": np.asarray(kf.landmark_ids),
            # features may be DEVICE arrays — collected raw here and
            # fetched in ONE device_get below: per-field np.asarray cost
            # one blocking round-trip each (~25 ms through the tunnel), a
            # 100+ second save at KITTI-scale keyframe counts
            "features": dict(kf.features._asdict()),
        }
    tree["keyframes"] = kfs
    import jax

    return jax.tree.map(np.asarray, jax.device_get(tree))


def _tree_to_state(tree: Dict[str, Any], state: VOState) -> VOState:
    state.landmarks = np.asarray(tree["landmarks"])
    state.landmark_valid = np.asarray(tree["landmark_valid"])
    state.num_landmarks = int(tree["num_landmarks"])
    state.frame_count = int(tree["frame_count"])
    state.initialized = bool(tree["initialized"])
    for key, attr in (("kf_speeds", "kf_baselines"),
                      ("ground_hist", "ground_hist")):
        rows = np.asarray(tree.get(key, np.zeros(1, np.float32)))
        n_h = int(rows[0]) if rows.size else 0
        setattr(state, attr, [float(x) for x in rows[1:1 + n_h]])
    state.trajectory = [
        (int(f), np.asarray(R), np.asarray(t))
        for f, R, t in zip(tree["traj_frames"], tree["traj_R"], tree["traj_t"])
    ]
    state.traj_ref = [
        None if int(m[0]) < 0 else (
            int(m[0]), np.asarray(R, np.float32),
            np.asarray(tb[:3], np.float32), int(m[1]), float(tb[3]),
        )
        for m, R, tb in zip(
            tree.get("traj_ref_meta", np.zeros((0, 2), np.int64)),
            tree.get("traj_ref_R", np.zeros((0, 3, 3), np.float32)),
            tree.get("traj_ref_tb", np.zeros((0, 4), np.float32)),
        )
    ]
    # older checkpoints carry no traj_ref: pad with None (keyframe-only
    # propagation, the pre-round-4 behavior); drop save-time padding rows
    state.traj_ref = state.traj_ref[: len(state.trajectory)]
    while len(state.traj_ref) < len(state.trajectory):
        state.traj_ref.append(None)
    state.keyframes = []
    # an empty keyframes dict disappears through the flat .npz emergency form
    for n in sorted(tree.get("keyframes", {}), key=int):
        kf = tree["keyframes"][n]
        state.keyframes.append(
            Keyframe(
                index=int(kf["index"]),
                features=Features(**{k: kf["features"][k] for k in Features._fields}),
                R=np.asarray(kf["R"]),
                t=np.asarray(kf["t"]),
                landmark_ids=np.asarray(kf["landmark_ids"]),
            )
        )
    return state


class SlamCheckpointer:
    """Versioned checkpoints under ``directory`` keyed by keyframe count."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._max_to_keep = max_to_keep
        self._manager: Optional[ocp.CheckpointManager] = None

    @property
    def manager(self) -> ocp.CheckpointManager:
        # lazy: CheckpointManager construction itself runs cross-process
        # coordination, which must never happen on the emergency_save path
        # (called when a peer host is already dead)
        if self._manager is None:
            self._manager = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=self._max_to_keep),
            )
        return self._manager

    @property
    def _config_path(self) -> str:
        return os.path.join(self.directory, "config.json")

    def save(self, step: int, state: VOState) -> None:
        # persist the config alongside the state: a resume with a different
        # window/threshold config would silently mix optimization regimes
        if not os.path.exists(self._config_path):
            with open(self._config_path, "w") as f:
                f.write(_config_json(state.config))
        self.manager.save(step, args=ocp.args.StandardSave(_state_to_tree(state)))
        self.manager.wait_until_finished()

    def emergency_save(self, step: int, state: VOState) -> None:
        """Single-host, collective-free checkpoint for failure paths.

        Orbax's save/wait coordinates across *all* processes of the
        jax.distributed cluster; when a peer host has died (exactly the
        situation a Heartbeat ``on_failure`` runs in) that sync blocks
        forever. This path serializes the same state tree with numpy to an
        atomically-renamed .npz instead — no collectives, safe to call from
        a failure handler. ``restore`` picks it up when it is newer than
        the latest orbax step."""
        if not os.path.exists(self._config_path):
            with open(self._config_path, "w") as f:
                f.write(_config_json(state.config))
        flat: Dict[str, np.ndarray] = {}

        def flatten(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    flatten(f"{prefix}/{k}" if prefix else k, v)
            else:
                flat[prefix] = np.asarray(node)

        flatten("", _state_to_tree(state))
        # np.savez appends .npz when missing — keep the suffix on the temp name
        tmp = os.path.join(self.directory, f".emergency_{step}.tmp.npz")
        np.savez(tmp, **flat)
        os.replace(tmp, os.path.join(self.directory, f"emergency_{step}.npz"))

    def _emergency_steps(self):
        steps = []
        for fn in os.listdir(self.directory):
            if fn.startswith("emergency_") and fn.endswith(".npz"):
                try:
                    steps.append(int(fn[len("emergency_"):-len(".npz")]))
                except ValueError:
                    pass
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = [s for s in [self.manager.latest_step()] if s is not None]
        steps += self._emergency_steps()
        return max(steps) if steps else None

    def restore(
        self,
        state: VOState,
        step: Optional[int] = None,
        *,
        allow_config_mismatch: bool = False,
    ) -> VOState:
        """Restore into ``state`` (a fresh init_vo() shell with the config).

        Raises ValueError if the checkpoint was written under a different
        VOConfig than ``state.config`` (pass ``allow_config_mismatch=True``
        to resume anyway, e.g. deliberately changing the BA window)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        if os.path.exists(self._config_path) and not allow_config_mismatch:
            with open(self._config_path) as f:
                saved = f.read()
            current = _config_json(state.config)
            if saved != current:
                raise ValueError(
                    "checkpoint config differs from the current VOConfig; "
                    "pass allow_config_mismatch=True to resume anyway.\n"
                    f"saved:   {saved}\ncurrent: {current}"
                )
        if step in self._emergency_steps() and step != self.manager.latest_step():
            with np.load(os.path.join(self.directory, f"emergency_{step}.npz")) as z:
                tree: Dict[str, Any] = {}
                for key in z.files:
                    node = tree
                    parts = key.split("/")
                    for p in parts[:-1]:
                        node = node.setdefault(p, {})
                    node[parts[-1]] = z[key]
        else:
            tree = self.manager.restore(step)
        return _tree_to_state(tree, state)

    def close(self) -> None:
        if self._manager is not None:
            self._manager.close()
