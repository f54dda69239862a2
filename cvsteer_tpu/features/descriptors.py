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


def _rotated_grid_coords(keypoints: Keypoints, grid: int, spacing: float):
    """(ys, xs [..., N, S], ct, st [..., N]): keypoint-oriented grid
    coordinates; broadcasts over any leading batch axes."""
    offsets = jnp.asarray(_grid_offsets(grid, spacing), jnp.float32)  # [S, 2]
    theta = keypoints.theta
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dy = offsets[:, 0] * ct[..., None] - offsets[:, 1] * st[..., None]
    dx = offsets[:, 0] * st[..., None] + offsets[:, 1] * ct[..., None]
    ys = keypoints.yx[..., 0:1] + dy
    xs = keypoints.yx[..., 1:2] + dx
    return ys, xs, ct, st


def _rotated_grid_samples(
    basis: jax.Array, keypoints: Keypoints, grid: int, spacing: float,
    fp32: bool = False,
):
    """(samples [N, S, C], ct [N], st [N]): the C basis channels bilinearly
    sampled on the keypoint-oriented grid — shared by all filter orders.

    Two channels-last bf16 row gathers per sample from a right-neighbor
    pair table. Measured on v5e: XLA gather cost scales with GATHERED
    LANES (a 4C-lane quad-table gather costs ~4x a C-lane one, so one quad
    gather loses to two 2C-lane pair gathers), making the pair table the
    sweet spot. Combine + steering stay fp32.

    ``fp32``: sample in full fp32 via 4 corner row-gathers (no bf16 cast,
    no Pallas kernel) — the max-accuracy mode and the oracle the bf16
    accuracy class is measured against (scripts/desc_accuracy.py; ~2x the
    sampling bytes).
    """
    ys, xs, ct, st = _rotated_grid_coords(keypoints, grid, spacing)
    if fp32:
        from cvsteer_tpu.ops.interp import bilinear_sample_channels_last

        samples = bilinear_sample_channels_last(
            jnp.moveaxis(basis, 0, -1), ys, xs
        )
        return samples, ct, st
    # bf16 cast before the transpose: all table-building layout passes move
    # 2-byte elements (the sampling path is bf16 regardless)
    samples = bilinear_sample_channels_last_pair_bf16(
        jnp.moveaxis(basis.astype(jnp.bfloat16), 0, -1), ys, xs
    )
    return samples, ct, st


def patch_dma_supported(grid: int, spacing: float, channels: int) -> bool:
    """Whether the Pallas patch-DMA sampler covers this descriptor shape.

    The aligned [32, 384]-lane DMA window (ops.pallas_desc) must contain
    every bilinear corner of the rotated sample cloud, and samples*cp must
    fill whole 128-lane vregs. Span = (grid-1)*spacing*sqrt(2) pixels.
    """
    if channels > 16:
        return False
    cp = 8 if channels <= 8 else 16
    if (grid * grid * cp) % 128:
        return False
    span = (grid - 1) * spacing * np.sqrt(2.0)
    # y: start = floor8(floor(min)) covers min..min+24; x: floor(128/cp)-px
    # alignment covers min..min+(384/cp - (128/cp - 1) - 1). One row/col of
    # slack for the +1 bilinear corner.
    max_y = 24 - 1
    max_x = (384 // cp) - (128 // cp - 1) - 1 - 1
    return span + 1 <= min(max_y, max_x)


def _rotated_grid_samples_batch(
    basis: jax.Array, keypoints: Keypoints, grid: int, spacing: float,
    fp32: bool = False,
):
    """Batched sampling: (samples [B, N, S, C], ct, st [B, N]).

    On TPU, one Pallas patch-DMA kernel call serves the whole batch
    (ops.pallas_desc.bilinear_sample_patch_dma) — one async copy per
    keypoint instead of 2*S gathered rows, ~3x faster at the bench shapes
    and flat in batch size where the XLA gather degrades superlinearly
    with its working set (scripts/probe_desc_gather.py). Off TPU, or for
    descriptor shapes outside the kernel's window contract, falls back to
    the vmapped pair-table gather path (identical bf16 accuracy class).
    """
    ys, xs, ct, st = _rotated_grid_coords(keypoints, grid, spacing)
    c = basis.shape[1]
    if fp32:
        from cvsteer_tpu.ops.interp import bilinear_sample_channels_last

        samples = jax.vmap(
            lambda b, y, x: bilinear_sample_channels_last(
                jnp.moveaxis(b, 0, -1), y, x
            )
        )(basis, ys, xs)
        return samples, ct, st
    if jax.default_backend() == "tpu" and patch_dma_supported(
        grid, spacing, c
    ):
        from cvsteer_tpu.ops.pallas_desc import bilinear_sample_patch_dma

        cp = 8 if c <= 8 else 16
        samples = bilinear_sample_patch_dma(basis, ys, xs, cp=cp)
    else:
        samples = jax.vmap(
            lambda b, y, x: bilinear_sample_channels_last_pair_bf16(
                jnp.moveaxis(b.astype(jnp.bfloat16), 0, -1), y, x
            )
        )(basis, ys, xs)
    return samples, ct, st


def _steer_g2_normalize(samples, ct, st, valid, pi_invariant=False):
    """Steer (g2, h2) per keypoint and L2-normalize; broadcasts over any
    leading batch axes (samples [..., S, C], ct/st/valid [...]).
    ``pi_invariant`` (static) applies :func:`_canonicalize_pi`."""
    ct2, st2 = ct * ct, st * st
    ct3, st3 = ct2 * ct, st2 * st
    w = lambda v: v[..., None]  # [...] -> [..., 1] for broadcasting over S
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

    if pi_invariant:  # static branch
        g2, h2 = _canonicalize_pi(g2, h2)
    desc = jnp.concatenate([g2, h2], axis=-1)  # [..., 2*S]
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(valid[..., None], desc, 0.0)


def _canonicalize_pi(g_even, h_odd):
    """Make the descriptor invariant to the orientation's pi ambiguity.

    theta is a HALF-angle estimate in (-pi/2, pi/2] (the energy's 2nd
    harmonic, SteerableFiltersG2.cpp:97-99): estimator jitter near the
    +-pi/2 wrap flips theta by pi between frames of the same point, and a
    pi flip fully decorrelates the raw descriptor (measured round 4:
    cosine 0.015 at true correspondences). Because the sample grid is
    point-symmetric, a pi flip is EXACTLY a point-reflection permutation
    of samples (flattened reversal for the row-major G x G grid) plus a
    sign flip of the odd (h) half — so canonicalizing costs one
    reduction, one select, and no resampling: if the odd-half sum is
    negative, apply the permutation and negate h. Any pi flip of theta
    then yields the identical descriptor (up to the invariant's own noise
    when |sum h| ~ 0). Measured on the city loop (ratio 0.92): gap-4
    matches 164 vs 124, gap-8 125 vs 81 — the flips dominate at larger
    view changes.

    Trade-off: collapsing the pi pair also collapses DISTINCT patterns
    that happen to be pi-rotations of each other (a measured -30% inlier
    hit on the Gabor-blob two-view scene), so this is an opt-in mode
    (FrontendConfig.desc_pi_invariant) for rotation-rich, flip-prone
    imagery. For roll-stable rigs FrontendConfig.upright_desc removes
    flips AND jitter outright and keeps the distinctiveness bit — prefer
    it when in-plane rotation invariance is not needed.
    """
    flip = jnp.sum(h_odd, axis=-1, keepdims=True) < 0
    g_c = jnp.where(flip, g_even[..., ::-1], g_even)
    h_c = jnp.where(flip, -h_odd[..., ::-1], h_odd)
    return g_c, h_c


def phase_descriptors(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
    pi_invariant: bool = False,
    fp32_sampling: bool = False,
) -> jax.Array:
    """Descriptors ``[N, grid*grid*2]`` for ``keypoints`` over ``basis [7, H, W]``.

    Batched use: vmap over a leading batch axis of both arguments, or call
    :func:`phase_descriptors_batch` (kernel-accelerated on TPU).
    ``fp32_sampling`` selects the full-precision sampling oracle (see
    _rotated_grid_samples).
    """
    samples, ct, st = _rotated_grid_samples(
        basis, keypoints, grid, spacing, fp32=fp32_sampling
    )
    return _steer_g2_normalize(
        samples, ct, st, keypoints.valid, pi_invariant=pi_invariant
    )


def phase_descriptors_batch(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
    pi_invariant: bool = False,
    fp32_sampling: bool = False,
) -> jax.Array:
    """Batched :func:`phase_descriptors`: ``basis [B, 7, H, W]``, keypoint
    fields ``[B, N, ...]`` -> ``[B, N, grid*grid*2]``.

    On TPU the sampling runs through the Pallas patch-DMA kernel
    (one async copy per keypoint; see ops.pallas_desc); elsewhere it is
    exactly the vmapped gather path. ``fp32_sampling`` selects the
    full-precision sampling oracle instead (see _rotated_grid_samples).
    """
    samples, ct, st = _rotated_grid_samples_batch(
        basis, keypoints, grid, spacing, fp32=fp32_sampling
    )
    return _steer_g2_normalize(
        samples, ct, st, keypoints.valid, pi_invariant=pi_invariant
    )


def phase_descriptors_g4(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
    pi_invariant: bool = False,
    fp32_sampling: bool = False,
) -> jax.Array:
    """4th-order phase descriptors ``[N, grid*grid*2]`` over ``basis [11, H, W]``.

    Same recipe as :func:`phase_descriptors` with the G4/H4 quadrature
    pair: each sample's 11 basis responses are steered to the keypoint's
    orientation with the binomial weights (filters.g4.steering_coefficients,
    SteerableFiltersG4.cpp:92-122 parity) and the (g4, h4) pairs are
    L2-normalized into the descriptor. The narrower 4th-order angular
    tuning trades some rotation tolerance for extra selectivity.
    """
    samples, _, _ = _rotated_grid_samples(
        basis, keypoints, grid, spacing, fp32=fp32_sampling
    )
    return _steer_g4_normalize(samples, keypoints, pi_invariant=pi_invariant)


def phase_descriptors_g4_batch(
    basis: jax.Array,
    keypoints: Keypoints,
    *,
    grid: int = 4,
    spacing: float = 3.0,
    pi_invariant: bool = False,
    fp32_sampling: bool = False,
) -> jax.Array:
    """Batched :func:`phase_descriptors_g4` (Pallas patch-DMA on TPU)."""
    samples, _, _ = _rotated_grid_samples_batch(
        basis, keypoints, grid, spacing, fp32=fp32_sampling
    )
    return _steer_g4_normalize(samples, keypoints, pi_invariant=pi_invariant)


def _steer_g4_normalize(samples, keypoints, pi_invariant=False):
    from cvsteer_tpu.filters.g4 import steering_coefficients

    ga, ha = steering_coefficients(keypoints.theta, dtype=samples.dtype)
    w = lambda v: v[..., None]  # [...] -> [..., 1] for broadcasting over S
    g4 = sum(w(ga[i]) * samples[..., i] for i in range(5))
    h4 = sum(w(ha[i]) * samples[..., 5 + i] for i in range(6))

    if pi_invariant:  # same rule as G2: G4 even under a pi flip, H4
        # odd, grid point-symmetric (see _canonicalize_pi)
        g4, h4 = _canonicalize_pi(g4, h4)
    desc = jnp.concatenate([g4, h4], axis=-1)  # [..., 2*S]
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(keypoints.valid[..., None], desc, 0.0)
