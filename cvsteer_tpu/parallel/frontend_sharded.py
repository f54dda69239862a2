"""Spatially + batch sharded steerable front-end (shard_map over a mesh).

Multi-chip version of the G2 pipeline: the image batch is sharded over the
``data`` mesh axis and image rows over the ``space`` axis; the separable
convolution's row overlap comes from a ring halo exchange (ppermute over
ICI). All per-pixel math after the basis convolution is local, so the result
is bit-identical to the single-device pipeline.

This is the TPU-native replacement for the reference's only parallelism — a
host thread pool over images (example/steer.cpp:169) — and the "sequence
parallel" analog mandated in SURVEY.md section 2.3.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.ops.sepconv import filter_bank_xla
from cvsteer_tpu.parallel.halo import halo_exchange_rows


def _g2_maps_local(block: jax.Array, bank: fg2.G2Bank, space_axis: Optional[str]):
    """Per-device pipeline over a row block ``[b_local, h_local, W]``."""
    r = bank.radius
    if space_axis is not None:
        haloed = halo_exchange_rows(block, r, space_axis)
        basis = filter_bank_xla(haloed, bank.xtaps, bank.ytaps, pad_axes=(False, True))
    else:
        basis = filter_bank_xla(block, bank.xtaps, bank.ytaps)
    c1, c2, c3 = fg2.energy_coefficients(basis)
    theta, _ = fg2.dominant_orientation(c2, c3)
    g2v, h2v = fg2.steer(basis, theta)
    magnitude, phase = fg2.magnitude_phase(g2v, h2v)
    edges = fg2.find_edges(magnitude, phase)
    dark = fg2.find_dark_lines(magnitude, phase)
    bright = fg2.find_bright_lines(magnitude, phase)
    return edges, dark, bright


def sharded_g2_maps(
    images: jax.Array,
    mesh: Mesh,
    bank: Optional[fg2.G2Bank] = None,
    *,
    data_axis: str = "data",
    space_axis: Optional[str] = "space",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(edges, lines_dark, lines_bright) of ``images [B, H, W]`` on a mesh.

    B must divide by the ``data`` axis size and H by the ``space`` axis size;
    each row shard must be taller than the kernel radius.
    """
    if bank is None:
        bank = fg2.g2_bank()
    if space_axis is not None and space_axis not in mesh.axis_names:
        space_axis = None
    if data_axis not in mesh.axis_names:
        data_axis = None
    spec = P(data_axis, space_axis, None)

    fn = jax.shard_map(
        functools.partial(_g2_maps_local, bank=bank, space_axis=space_axis),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, spec, spec),
    )
    return fn(images)


def _g4_maps_local(block: jax.Array, bank, space_axis: Optional[str]):
    """Per-device G4 pipeline over a row block (all post-conv math local)."""
    from cvsteer_tpu.filters import g4 as fg4

    r = bank.radius
    if space_axis is not None:
        haloed = halo_exchange_rows(block, r, space_axis)
        basis = filter_bank_xla(haloed, bank.xtaps, bank.ytaps, pad_axes=(False, True))
    else:
        basis = filter_bank_xla(block, bank.xtaps, bank.ytaps)
    c1, c2, c3 = fg4.energy_coefficients(basis)
    theta, _ = fg4.dominant_orientation(c2, c3)
    g4v, h4v = fg4.steer(basis, theta)
    magnitude, phase = fg4.magnitude_phase(g4v, h4v)
    # magnitude-as-energy calling convention, as the reference CLI/test use
    # the extractors (quirk C23) — identical to the single-device g4 path
    edges = fg2.find_edges(magnitude, phase)
    dark = fg2.find_dark_lines(magnitude, phase)
    bright = fg2.find_bright_lines(magnitude, phase)
    return edges, dark, bright


def sharded_g4_maps(
    images: jax.Array,
    mesh: Mesh,
    bank=None,
    *,
    data_axis: str = "data",
    space_axis: Optional[str] = "space",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """G4/H4 analog of :func:`sharded_g2_maps` (CLI --mesh --filters g4)."""
    from cvsteer_tpu.filters import g4 as fg4

    if bank is None:
        bank = fg4.g4_bank()
    if space_axis is not None and space_axis not in mesh.axis_names:
        space_axis = None
    if data_axis not in mesh.axis_names:
        data_axis = None
    spec = P(data_axis, space_axis, None)

    fn = jax.shard_map(
        functools.partial(_g4_maps_local, bank=bank, space_axis=space_axis),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, spec, spec),
    )
    return fn(images)


def shard_batch(images: jax.Array, mesh: Mesh, data_axis="data", space_axis="space"):
    """Place a host batch onto the mesh with the pipeline's sharding."""
    space = space_axis if space_axis in mesh.axis_names else None
    data = data_axis if data_axis in mesh.axis_names else None
    return jax.device_put(images, NamedSharding(mesh, P(data, space, None)))


def sharded_filter_bank(
    images: jax.Array,
    xtaps,
    ytaps,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    space_axis: Optional[str] = "space",
) -> jax.Array:
    """Generic K-filter separable bank over a mesh: [B, H, W] -> [B, K, H, W].

    Works for any tap bank (G2/H2, G4/H4, custom); batch over ``data``,
    rows over ``space`` with ring halo exchange. Bit-identical to the
    single-device filter_bank_xla result.
    """
    import numpy as np

    xtaps = np.asarray(xtaps, np.float32)
    ytaps = np.asarray(ytaps, np.float32)
    r = (xtaps.shape[1] - 1) // 2
    if space_axis is not None and space_axis not in mesh.axis_names:
        space_axis = None
    if data_axis not in mesh.axis_names:
        data_axis = None

    def local(block):
        if space_axis is not None:
            haloed = halo_exchange_rows(block, r, space_axis)
            return filter_bank_xla(haloed, xtaps, ytaps, pad_axes=(False, True))
        return filter_bank_xla(block, xtaps, ytaps)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, space_axis, None),),
        out_specs=P(data_axis, None, space_axis, None),
    )
    return fn(images)
