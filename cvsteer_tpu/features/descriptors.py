"""Phase-based descriptors from the steered quadrature pair.

BASELINE config 2-3: descriptors built from the G2/H2 quadrature responses
(the local phase signal the reference exposes via computeMagnitudeAndPhase,
cvsteer/SteerableFiltersG2.cpp:107-112) rather than raw intensity.

Descriptor recipe (rotation-normalized local phase grid):
- a G x G grid of sample offsets (spacing in pixels), rotated by the
  keypoint's dominant orientation theta;
- at each sample, the 7 basis responses are bilinearly interpolated and
  steered to theta (per-keypoint scalar steering — the same interpolation
  identity as SteerableFiltersG2.cpp:137-145, applied per point);
- the (g2, h2) pair per sample is contrast-normalized: the full descriptor
  vector [G*G*2] is L2-normalized, giving invariance to local gain;
- orientation is normalized by both the rotated grid and the steered frame,
  so the descriptor is covariant only with the pi-ambiguity inherent to an
  even-order orientation estimate.

All fixed-shape: [N] keypoints in, [N, G*G*2] descriptors out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.features.keypoints import Keypoints
from cvsteer_tpu.filters.g2 import G2A, G2B, G2C, H2A, H2B, H2C, H2D
from cvsteer_tpu.ops.interp import bilinear_sample_channels_last_pair_bf16


def _grid_offsets(grid: int, spacing: float) -> np.ndarray:
    """[G*G, 2] (dy, dx) offsets centered on the keypoint."""
    c = (grid - 1) / 2.0
    ys, xs = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    return np.stack([(ys - c) * spacing, (xs - c) * spacing], -1).reshape(-1, 2)


def _rotated_grid_samples(
    basis: jax.Array, keypoints: Keypoints, grid: int, spacing: float
):
    """(samples [N, S, C], ct [N], st [N]): the C basis channels bilinearly
    sampled on the keypoint-oriented grid — shared by all filter orders.

    Two channels-last bf16 row gathers per sample from a right-neighbor
    pair table. Measured on v5e: XLA gather cost scales with GATHERED
    LANES (a 4C-lane quad-table gather costs ~4x a C-lane one, so one quad
    gather loses to two 2C-lane pair gathers), making the pair table the
    sweet spot. Combine + steering stay fp32.
    """
    offsets = jnp.asarray(_grid_offsets(grid, spacing), jnp.float32)  # [S, 2]
    theta = keypoints.theta  # [N]
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # Rotate grid offsets into the keypoint frame: [N, S, 2].
    dy = offsets[None, :, 0] * ct[:, None] - offsets[None, :, 1] * st[:, None]
    dx = offsets[None, :, 0] * st[:, None] + offsets[None, :, 1] * ct[:, None]
    ys = keypoints.yx[:, 0:1] + dy
    xs = keypoints.yx[:, 1:2] + dx
    # bf16 cast before the transpose: all table-building layout passes move
    # 2-byte elements (the sampling path is bf16 regardless)
    samples = bilinear_sample_channels_last_pair_bf16(
        jnp.moveaxis(basis.astype(jnp.bfloat16), 0, -1), ys, xs
    )
    return samples, ct, st


def phase_descriptors(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
) -> jax.Array:
    """Descriptors ``[N, grid*grid*2]`` for ``keypoints`` over ``basis [7, H, W]``.

    Batched use: vmap over a leading batch axis of both arguments.
    """
    samples, ct, st = _rotated_grid_samples(basis, keypoints, grid, spacing)

    ct2, st2 = ct * ct, st * st
    ct3, st3 = ct2 * ct, st2 * st
    w = lambda v: v[:, None]  # [N] -> [N, 1] for broadcasting over S
    g2 = (
        w(ct2) * samples[..., G2A]
        - 2.0 * w(ct * st) * samples[..., G2B]
        + w(st2) * samples[..., G2C]
    )
    h2 = (
        w(ct3) * samples[..., H2A]
        - 3.0 * w(ct2 * st) * samples[..., H2B]
        + 3.0 * w(ct * st2) * samples[..., H2C]
        - w(st3) * samples[..., H2D]
    )

    desc = jnp.concatenate([g2, h2], axis=-1)  # [N, 2*S]
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(keypoints.valid[:, None], desc, 0.0)


def phase_descriptors_g4(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
) -> jax.Array:
    """4th-order phase descriptors ``[N, grid*grid*2]`` over ``basis [11, H, W]``.

    Same recipe as :func:`phase_descriptors` with the G4/H4 quadrature
    pair: each sample's 11 basis responses are steered to the keypoint's
    orientation with the binomial weights (filters.g4.steering_coefficients,
    SteerableFiltersG4.cpp:92-122 parity) and the (g4, h4) pairs are
    L2-normalized into the descriptor. The narrower 4th-order angular
    tuning trades some rotation tolerance for extra selectivity.
    """
    from cvsteer_tpu.filters.g4 import steering_coefficients

    samples, ct, st = _rotated_grid_samples(basis, keypoints, grid, spacing)
    ga, ha = steering_coefficients(keypoints.theta, dtype=samples.dtype)
    w = lambda v: v[:, None]  # [N] -> [N, 1] for broadcasting over S
    g4 = sum(w(ga[i]) * samples[..., i] for i in range(5))
    h4 = sum(w(ha[i]) * samples[..., 5 + i] for i in range(6))

    desc = jnp.concatenate([g4, h4], axis=-1)  # [N, 2*S]
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(keypoints.valid[:, None], desc, 0.0)
