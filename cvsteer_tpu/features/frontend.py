"""Multi-scale feature extraction: pyramid -> steerable maps -> keypoints +
phase descriptors (BASELINE config 2).

One call takes a batch of images to a fixed-capacity feature set per image:
a 5-level Gaussian pyramid, the G2/H2 front-end per level, NMS keypoints on
the orientation-strength map, and rotation-normalized phase descriptors.
Keypoint coordinates are reported in level-0 pixels; per-level capacities
are static so the whole thing jits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cvsteer_tpu.features.descriptors import (
    phase_descriptors,
    phase_descriptors_batch,
)
from cvsteer_tpu.features.keypoints import (
    Keypoints,
    detect_keypoints,
    detect_keypoints_cs,
)
from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.ops.pyramid import gaussian_pyramid


class FrontendConfig(NamedTuple):
    levels: int = 5
    keypoints_per_level: int = 256
    nms_radius: int = 2
    threshold: float = 1.0
    descriptor_grid: int = 4
    descriptor_spacing: float = 3.0
    # 'corner': min-over-orientations energy c1 - |(c2,c3)| — localizes on
    # junctions/blobs, stable under viewpoint change (default).
    # 'strength': dominant-orientation strength |(c2,c3)| — the map the
    # reference exposes; fires along ridges (position slides on edges).
    score: str = "corner"
    # Filter order: 2 = G2/H2 (default, fused TPU kernel path), 4 = G4/H4
    # (narrower angular tuning; basis through the generic Pallas bank).
    order: int = 2
    # Per-level capacity taper: level l holds
    # max(32, round8(keypoints_per_level * decay^l)) keypoints. A level
    # quarters in pixels per step, so a flat 256 slots at a 30x40 level is
    # ~2/3 permanent padding that the descriptor gathers still pay for
    # (row-count-bound, ~7 ns/row on v5e). Opt-in (default 1.0 = flat):
    # 0.625 measured -28% feature-extraction device time at 480x640 with
    # a near-identical valid set on texture-rich imagery, but it trims
    # real keypoints on small/sparse frames (the 120x160 two-view test
    # drops below RANSAC viability) — a throughput knob for serving
    # configs, not a silent default.
    level_capacity_decay: float = 1.0
    # Upright descriptors: skip rotation normalization (sample the grid at
    # theta = 0). The dominant-orientation HALF-angle is ill-defined on
    # exactly the junction/corner structures the detector selects —
    # measured median |d theta| = 0.235 rad between frames of the same
    # point on the city-loop imagery, the largest single descriptor-
    # decorrelation factor: upright raised gap-1 matches 147 -> 309 (of
    # 574) and gap-8 matches 81 -> 143 at ratio 0.85. For roll-stable
    # cameras (driving, handheld video — BASELINE configs 4-5) upright is
    # strictly better; keep False where in-plane rotation invariance
    # matters.
    upright_desc: bool = False
    # Pi-invariant descriptors: canonicalize the half-angle's pi ambiguity
    # (descriptors._canonicalize_pi) — keeps rotation invariance while
    # killing flip decorrelation, at the cost of one distinctiveness bit.
    # Opt-in for rotation-rich, flip-prone imagery; redundant (and
    # mildly harmful) under upright_desc.
    desc_pi_invariant: bool = False
    # Full-precision descriptor sampling: bypass the bf16 accuracy class
    # (Pallas patch-DMA / bf16 pair-table gathers) and sample the basis in
    # fp32 (4 corner row-gathers, ~2x the sampling bytes). The production
    # default is bf16 — measured end-to-end deltas vs this oracle are in
    # BENCH_NOTES.md (scripts/desc_accuracy.py); flip on when accuracy
    # matters more than descriptor-stage throughput.
    desc_fp32_sampling: bool = False

    def level_capacity(self, level: int) -> int:
        if self.level_capacity_decay == 1.0:
            return self.keypoints_per_level  # flat: exactly as configured
        c = self.keypoints_per_level * (self.level_capacity_decay ** level)
        return max(32, int(c) // 8 * 8)

    @property
    def capacity(self) -> int:
        return sum(self.level_capacity(l) for l in range(self.levels))

    @property
    def descriptor_dim(self) -> int:
        return 2 * self.descriptor_grid * self.descriptor_grid


class Features(NamedTuple):
    """Fixed-capacity multi-scale features for one image (or a batch).

    yx:    [..., N, 2] level-0 pixel coordinates.
    score: [..., N] detector response.
    theta: [..., N] dominant orientation.
    level: [..., N] pyramid level (int32).
    desc:  [..., N, D] unit descriptors.
    valid: [..., N] mask.
    """

    yx: jax.Array
    score: jax.Array
    theta: jax.Array
    level: jax.Array
    desc: jax.Array
    valid: jax.Array


def extract_features(
    images: jax.Array,
    bank=None,
    cfg: FrontendConfig = FrontendConfig(),
) -> Features:
    """Features of ``images [H, W]`` or ``[B, H, W]``.

    The batch flows natively through the pyramid and the (Pallas) basis
    bank — batching there is a reshape into the kernel grid, not a vmap, so
    the fused TPU kernels keep their hand-written layout. Only the
    per-image keypoint selection and descriptor sampling (pure XLA top-k /
    gather work) are vmapped. ``cfg.order`` selects the G2/H2 (default) or
    G4/H4 quadrature pair; ``bank`` must match the order when given.
    """
    if cfg.order == 4:
        from cvsteer_tpu.features.descriptors import (
            phase_descriptors_g4,
            phase_descriptors_g4_batch,
        )
        from cvsteer_tpu.filters import g4 as fg4

        if bank is None:
            bank = fg4.g4_bank()
        return _extract_features_generic(
            images, cfg,
            basis_fn=lambda im: fg4.g4_basis(im, bank),
            coeff_fn=fg4.energy_coefficients,
            desc_fn=phase_descriptors_g4,
            desc_batch_fn=phase_descriptors_g4_batch,
        )
    if bank is None:
        bank = fg2.g2_bank()
    single = images.ndim == 2
    imgs = images[None] if single else images
    on_tpu = jax.default_backend() == "tpu"
    # The packed-pool selection is sound for pool=3 <= nms_radius + 1
    # (one NMS survivor per 3x3 cell requires nms_radius >= 2).
    if cfg.score == "corner" and on_tpu and cfg.nms_radius >= 2:
        with jax.named_scope("pyramid"):
            levels = gaussian_pyramid(imgs, cfg.levels)
        return _extract_features_tpu(levels, bank, cfg, single)
    return _extract_features_generic(
        images, cfg,
        basis_fn=lambda im: fg2.g2_basis(im, bank),
        coeff_fn=fg2.energy_coefficients,
        desc_fn=phase_descriptors,
        desc_batch_fn=phase_descriptors_batch,
    )


def _score_maps(lv_imgs, *, basis_fn, coeff_fn, score: str = "corner"):
    """(basis, score, ct, st) for one pyramid level — the shared front half
    of the per-level pipeline (also used by parallel.features_sharded)."""
    basis = basis_fn(lv_imgs)  # [B, K, H, W]
    c1, c2, c3 = coeff_fn(basis)
    theta, strength = fg2.dominant_orientation(c2, c3)
    score_map = fg2.corner_strength(c1, c2, c3) if score == "corner" else strength
    return basis, score_map, jnp.cos(theta), jnp.sin(theta)


def _level_features(
    lv_imgs, lvl: int, cfg: FrontendConfig, *, basis_fn, coeff_fn, desc_fn,
    approx: bool, desc_batch_fn=None,
) -> Features:
    """One full pyramid level: basis -> score -> detect -> descriptors
    (shared by the generic path and the replicated levels of
    parallel.features_sharded). ``desc_batch_fn``, when given, replaces
    the vmapped ``desc_fn`` with a natively batched sampler (the Pallas
    patch-DMA kernel on TPU)."""
    with jax.named_scope(f"basis_l{lvl}"):
        basis, score_map, ctm, stm = _score_maps(
            lv_imgs, basis_fn=basis_fn, coeff_fn=coeff_fn, score=cfg.score
        )
    with jax.named_scope(f"detect_l{lvl}"):
        kp = jax.vmap(
            lambda s, c, si, n=cfg.level_capacity(lvl): detect_keypoints_cs(
                s,
                c,
                si,
                max_keypoints=n,
                nms_radius=cfg.nms_radius,
                threshold=cfg.threshold,
                approx=approx,
            )
        )(score_map, ctm, stm)
    with jax.named_scope(f"desc_l{lvl}"):
        kp_d = (
            kp._replace(theta=jnp.zeros_like(kp.theta))
            if cfg.upright_desc else kp
        )
        if desc_batch_fn is not None:
            desc = desc_batch_fn(
                basis, kp_d,
                grid=cfg.descriptor_grid, spacing=cfg.descriptor_spacing,
                pi_invariant=cfg.desc_pi_invariant,
                fp32_sampling=cfg.desc_fp32_sampling,
            )
        else:
            desc = jax.vmap(
                lambda b, k: desc_fn(
                    b, k, grid=cfg.descriptor_grid,
                    spacing=cfg.descriptor_spacing,
                    pi_invariant=cfg.desc_pi_invariant,
                    fp32_sampling=cfg.desc_fp32_sampling,
                )
            )(basis, kp_d)
    scale = float(2**lvl)
    return Features(
        yx=kp.yx * scale,
        score=kp.score,
        theta=kp.theta,
        level=jnp.full(kp.score.shape, lvl, jnp.int32),
        desc=desc,
        valid=kp.valid,
    )


def _extract_features_generic(
    images: jax.Array, cfg: FrontendConfig, *, basis_fn, coeff_fn, desc_fn,
    desc_batch_fn=None,
) -> Features:
    """Order-agnostic XLA path: pyramid -> basis -> energy coefficients ->
    detector -> descriptors. The 2nd-harmonic (c1, c2, c3) semantics are
    shared by both orders (filters.g4.energy_coefficients fills reference
    gap C20 with the same meaning as the G2 table)."""
    single = images.ndim == 2
    imgs = images[None] if single else images
    with jax.named_scope("pyramid"):
        levels = gaussian_pyramid(imgs, cfg.levels)
    on_tpu = jax.default_backend() == "tpu"
    parts = [
        _level_features(
            lv_imgs, lvl, cfg,
            basis_fn=basis_fn, coeff_fn=coeff_fn, desc_fn=desc_fn,
            approx=on_tpu, desc_batch_fn=desc_batch_fn,
        )
        for lvl, lv_imgs in enumerate(levels)
    ]
    feats = Features(*(jnp.concatenate(xs, axis=1) for xs in zip(*parts)))
    if single:
        feats = jax.tree.map(lambda x: x[0], feats)
    return feats


def _extract_features_tpu(levels, bank, cfg: FrontendConfig, single: bool):
    """TPU fast path: one fused kernel pass per level.

    ops.pallas_frontend.g2_features_full_pallas produces basis + the
    mantissa-packed pooled selection map + per-pixel subpixel offsets +
    half-angle maps in a single kernel pass; selection is approx_max_k on
    the 9x-reduced cell table plus ONE small payload gather
    (keypoints.detect_keypoints_packed) — the round-2 XLA
    pad/reshape/transpose/cells/shifted-table chain (~220 us/frame
    @480x640 on the trace) is gone. Selection stays per level: a
    cross-level batched approx_max_k over -inf-padded scores was tried
    and measured NO faster — approx_max_k cost scales with total (padded)
    elements, not call count.
    """
    from cvsteer_tpu.features.keypoints import detect_keypoints_packed
    from cvsteer_tpu.ops.pallas_frontend import g2_features_full_pallas

    per = []
    for lvl, lv_imgs in enumerate(levels):
        with jax.named_scope(f"detmaps_l{lvl}"):
            per.append(g2_features_full_pallas(
                lv_imgs, bank.xtaps, bank.ytaps,
                threshold=cfg.threshold, nms_radius=cfg.nms_radius,
            ))

    # Descriptors stay PER LEVEL: a combined cross-level pair table with
    # two total gather ops was built and measured in round 3 and lost by
    # ~130 us/frame @480x640 b16 — XLA's gather on the 5.3x-larger
    # concatenated table costs more per row than the saved per-call fixed
    # overhead, and the table concat adds an 11 MB copy.
    parts = []
    for lvl, (p3, dym, dxm, ctm, stm, basis) in enumerate(per):
        with jax.named_scope(f"detect_l{lvl}"):
            kp = jax.vmap(
                lambda p, dy, dx, c, si, n=cfg.level_capacity(lvl):
                detect_keypoints_packed(
                    p, dy, dx, c, si, max_keypoints=n,
                )
            )(p3, dym, dxm, ctm, stm)
        with jax.named_scope(f"desc_l{lvl}"):
            # phase_descriptors_batch routes sampling through the Pallas
            # patch-DMA kernel on TPU (one async copy per keypoint; ~3x
            # the XLA gather path at these shapes — ops/pallas_desc.py)
            kp_d = (
                kp._replace(theta=jnp.zeros_like(kp.theta))
                if cfg.upright_desc else kp
            )
            desc = phase_descriptors_batch(
                basis, kp_d,
                grid=cfg.descriptor_grid, spacing=cfg.descriptor_spacing,
                pi_invariant=cfg.desc_pi_invariant,
                fp32_sampling=cfg.desc_fp32_sampling,
            )
        scale = float(2**lvl)
        parts.append(
            Features(
                yx=kp.yx * scale,
                score=kp.score,
                theta=kp.theta,
                level=jnp.full(kp.score.shape, lvl, jnp.int32),
                desc=desc,
                valid=kp.valid,
            )
        )
    feats = Features(*(jnp.concatenate(xs, axis=1) for xs in zip(*parts)))
    if single:
        feats = jax.tree.map(lambda x: x[0], feats)
    return feats
