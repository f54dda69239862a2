"""Ring halo exchange for spatially sharded convolution.

The structural analog of ring attention's neighbor exchange (SURVEY.md
section 5, "long-context"): when image rows are sharded over a mesh axis,
each device needs ``radius`` boundary rows from its neighbors to compute a
(2*radius+1)-tap convolution without a seam. Neighbor transfers are
``jax.lax.ppermute`` — compiled to ICI sends on TPU; global image borders use
REFLECT_101 (the OpenCV sepFilter2D default the goldens were produced with,
cvsteer/SteerableFiltersG2.cpp:62-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _reflect101_top(x: jax.Array, r: int) -> jax.Array:
    """REFLECT_101 halo above row 0: rows r, r-1, ..., 1 (row 0 not repeated)."""
    return jnp.flip(x[..., 1 : r + 1, :], axis=-2)


def _reflect101_bottom(x: jax.Array, r: int) -> jax.Array:
    """REFLECT_101 halo below the last row: rows -2, -3, ..., -(r+1)."""
    return jnp.flip(x[..., -(r + 1) : -1, :], axis=-2)


def halo_exchange_rows(x: jax.Array, radius: int, axis_name: str) -> jax.Array:
    """Return ``x`` extended with ``radius`` halo rows above and below.

    ``x``: a per-device row block ``[..., h_local, W]`` inside shard_map,
    sharded along its height over mesh axis ``axis_name`` (device 0 holds the
    top of the image). Interior halos come from ring neighbors via ppermute;
    the first/last devices synthesize their outer halo with REFLECT_101.

    Requires ``h_local > radius`` (a device must own at least the rows its
    neighbor's stencil reaches).
    """
    r = int(radius)
    if r == 0:
        return x
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.concatenate(
            [_reflect101_top(x, r), x, _reflect101_bottom(x, r)], axis=-2
        )
    idx = lax.axis_index(axis_name)

    # My bottom halo = top rows of the next device (shift data "up" the ring).
    bot_halo = lax.ppermute(
        x[..., :r, :], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # My top halo = bottom rows of the previous device.
    top_halo = lax.ppermute(
        x[..., -r:, :], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )

    top_halo = jnp.where(idx == 0, _reflect101_top(x, r), top_halo)
    bot_halo = jnp.where(idx == n - 1, _reflect101_bottom(x, r), bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=-2)
