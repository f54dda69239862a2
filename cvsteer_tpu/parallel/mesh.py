"""Mesh construction helpers.

A mesh is the TPU-native replacement for the reference's thread pool
(example/steer.cpp:169): named axes over which batches, image rows, and
(later) keyframe windows are sharded by pjit/shard_map.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    axes: Mapping[str, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named device mesh, e.g. ``make_mesh({"data": 4, "space": 2})``.

    Axis sizes must multiply to the device count. An axis size of -1 is
    inferred (at most one).
    """
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axes.keys())
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        sizes[sizes.index(-1)] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)
