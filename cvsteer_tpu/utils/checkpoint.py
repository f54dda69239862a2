"""Checkpoint / resume of SLAM state (SURVEY.md section 5, checkpointing).

The reference has no persistent state; the SLAM engine does: keyframe poses
and features, the landmark map, and the trajectory. Checkpoints are Orbax
PyTree checkpoints (atomic, versioned by step) of a pure-array tree, so
long sequences resume mid-run and multi-host runs restart after a lost
host.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import orbax.checkpoint as ocp

from cvsteer_tpu.features.frontend import Features
from cvsteer_tpu.slam.vo import Keyframe, VOState


def _state_to_tree(state: VOState) -> Dict[str, Any]:
    tree: Dict[str, Any] = {
        "landmarks": np.asarray(state.landmarks),
        "landmark_valid": np.asarray(state.landmark_valid),
        "num_landmarks": np.asarray(state.num_landmarks),
        "frame_count": np.asarray(state.frame_count),
        "initialized": np.asarray(state.initialized),
        "traj_frames": np.asarray([f for f, _, _ in state.trajectory], np.int64),
        "traj_R": np.stack([R for _, R, _ in state.trajectory])
        if state.trajectory
        else np.zeros((0, 3, 3), np.float32),
        "traj_t": np.stack([t for _, _, t in state.trajectory])
        if state.trajectory
        else np.zeros((0, 3), np.float32),
    }
    kfs = {}
    for n, kf in enumerate(state.keyframes):
        kfs[str(n)] = {
            "index": np.asarray(kf.index),
            "R": np.asarray(kf.R),
            "t": np.asarray(kf.t),
            "landmark_ids": np.asarray(kf.landmark_ids),
            "features": {k: np.asarray(v) for k, v in kf.features._asdict().items()},
        }
    tree["keyframes"] = kfs
    return tree


def _tree_to_state(tree: Dict[str, Any], state: VOState) -> VOState:
    state.landmarks = np.asarray(tree["landmarks"])
    state.landmark_valid = np.asarray(tree["landmark_valid"])
    state.num_landmarks = int(tree["num_landmarks"])
    state.frame_count = int(tree["frame_count"])
    state.initialized = bool(tree["initialized"])
    state.trajectory = [
        (int(f), np.asarray(R), np.asarray(t))
        for f, R, t in zip(tree["traj_frames"], tree["traj_R"], tree["traj_t"])
    ]
    state.keyframes = []
    for n in sorted(tree["keyframes"], key=int):
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
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: VOState) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(_state_to_tree(state)))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: VOState, step: Optional[int] = None) -> VOState:
        """Restore into ``state`` (a fresh init_vo() shell with the config)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        tree = self.manager.restore(step)
        return _tree_to_state(tree, state)

    def close(self) -> None:
        self.manager.close()
