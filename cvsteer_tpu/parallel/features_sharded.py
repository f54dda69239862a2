"""Spatially + batch sharded feature extraction (config 2 on a mesh).

Extends parallel.frontend_sharded (dense maps) to the FULL feature
pipeline — pyramid, detection, descriptors — under shard_map on a
``(data, space)`` mesh, producing results equal to the single-device
EXACT pipeline: ``features.frontend.extract_features`` as it runs
off-TPU / with exact selection (fp-reduction-order exact; in practice
bit-identical, see tests/test_parallel_features.py). On a real TPU the
single-device fast path additionally uses approx_max_k selection and
the fused bf16 Pallas kernels, which sit in their own documented
accuracy classes — this module keeps exact selection per shard so the
distributed merge has a well-defined reference semantics.

Per pyramid level, with image rows sharded over ``space``:

  halo      ONE ppermute ring exchange of ``HALO = desc_r + conv_r``
            rows (REFLECT_101 synthesized at global borders, matching
            the reference's sepFilter2D padding).
  basis     unpadded-row bank convolution on the haloed slab: valid on
            slab +- desc_r rows — exactly the descriptor support.
  detect    NMS over the TRUE haloed neighborhood; a ``row_range`` mask
            restricts selection to rows this shard owns intersected
            with the global border, so every global keypoint is found
            by exactly one shard with its full 5x5 context.
  merge     all_gather of per-shard candidates (each shard keeps the
            FULL level capacity, so no global winner can be lost) and a
            replicated re-selection by (score desc, global flat index
            asc) — the same tie-break as single-device lax.top_k.
  desc      each shard samples descriptors only for the keypoints it
            detected (provenance ownership — no boundary ambiguity);
            the full table is one psum. Global-border sample clamping
            is reproduced by overwriting the first/last shard's outer
            desc_r basis rows with the true edge row (the ring halo
            there is REFLECT_101 for conv parity, but descriptor
            sampling clamps-to-edge).

Levels too small to shard (slab < HALO rows, or odd slabs that would
break the stride-2 decimation phase) are all_gathered once and computed
replicated — identical on every shard, no further collectives; levels
only shrink, so the pipeline never re-shards.

Collectives per sharded level: one ppermute pair (halo), one all_gather
(candidate merge, ~K rows), one psum (descriptors). This is the
"sequence parallel" story of SURVEY.md section 2.3 applied to the whole
of BASELINE config 2, not just the dense maps.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvsteer_tpu.features.descriptors import (
    phase_descriptors,
    phase_descriptors_g4,
)
from cvsteer_tpu.features.frontend import (
    Features,
    FrontendConfig,
    _level_features,
    _score_maps,
)
from cvsteer_tpu.features.keypoints import Keypoints, _detect_core
from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.filters import g4 as fg4
from cvsteer_tpu.ops.pyramid import _BINOMIAL5, gaussian_pyramid, pyr_down
from cvsteer_tpu.ops.sepconv import filter_bank_xla
from cvsteer_tpu.parallel.halo import halo_exchange_rows


def _desc_radius(cfg: FrontendConfig) -> int:
    """Rows of basis needed beyond an owned keypoint's row for sampling:
    max rotated grid offset + 1 bilinear row, rounded up."""
    span = (cfg.descriptor_grid - 1) / 2.0 * cfg.descriptor_spacing
    return int(math.ceil(span * math.sqrt(2.0))) + 2


def _order_fns(cfg: FrontendConfig, bank):
    if cfg.order == 4:
        bank = bank if bank is not None else fg4.g4_bank()
        return (
            bank,
            lambda im: fg4.g4_basis(im, bank, method="xla"),
            fg4.energy_coefficients,
            phase_descriptors_g4,
        )
    bank = bank if bank is not None else fg2.g2_bank()
    return (
        bank,
        lambda im: fg2.g2_basis(im, bank, method="xla"),
        fg2.energy_coefficients,
        phase_descriptors,
    )


def _merge_candidates(scores, flat, yx, theta, valid, shard, k: int):
    """Replicated re-selection over the gathered candidate pool [S*K, ...]:
    (score desc, global flat index asc) — lax.top_k's tie-break on the
    single-device flat masked map."""
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.lexsort((flat, -key))[:k]
    return (
        scores[order], yx[order], theta[order], valid[order], shard[order]
    )


def _detect_slab(
    score, ct, st, row_f, col_f, *, k, nms_radius, threshold, lo, hi
):
    """Per-shard detection on a haloed score slab. Returns the candidate
    fields plus each winner's integer (row, col) — exact, via iota aux
    maps riding the payload gather (no float round-back)."""
    yx, s, valid, aux = _detect_core(
        score, [ct, st, row_f, col_f], k, nms_radius, threshold, None,
        False, row_range=(lo, hi),
    )
    theta = jnp.arctan2(aux[:, 1], aux[:, 0])
    return yx, s, valid, theta, aux[:, 2], aux[:, 3]


def sharded_extract_features(
    images: jax.Array,
    mesh: Mesh,
    cfg: FrontendConfig = FrontendConfig(),
    bank=None,
    *,
    data_axis: str = "data",
    space_axis: str = "space",
) -> Features:
    """``extract_features`` of ``images [B, H, W]`` on a (data, space) mesh.

    B must divide the ``data`` axis; H and W must halve exactly through
    the pyramid (divisible by 2**(levels-1)) and H by the ``space`` axis.
    Returns Features sharded over batch, replicated over space.
    """
    B, H, W = images.shape
    S = mesh.shape[space_axis]
    D = mesh.shape[data_axis]
    if B % D:
        raise ValueError(f"batch {B} does not divide data axis {D}")
    if H % S:
        raise ValueError(f"height {H} does not divide space axis {S}")
    if H % (1 << (cfg.levels - 1)) or W % (1 << (cfg.levels - 1)):
        raise ValueError("H, W must halve exactly through the pyramid")

    bank, basis_fn, coeff_fn, desc_fn = _order_fns(cfg, bank)
    conv_r = bank.radius
    # slab margin: descriptor support AND the NMS window must both see
    # true neighbor rows beyond the owned slab (a stronger maximum up to
    # nms_radius rows outside the slab must suppress an owned candidate)
    desc_r = max(_desc_radius(cfg), cfg.nms_radius)
    halo = conv_r + desc_r
    nms_b = cfg.nms_radius + 1  # detector border (keypoints.py)
    bin_taps = _BINOMIAL5.reshape(1, -1)

    # static per-level plan: shard while slabs stay tall enough (a slab
    # must exceed the halo: REFLECT_101 synthesis reads radius+1 rows)
    # and the stride-2 phase survives (even slabs); replicate from then on
    plan = []
    shardable = True
    for lvl in range(cfg.levels):
        h_l = H >> lvl
        hs = h_l // S
        shardable = (
            shardable and h_l % S == 0 and hs >= max(halo + 1, 2 * nms_b)
        )
        plan.append(shardable)
        shardable = shardable and hs % 2 == 0

    def local(block):
        idx = lax.axis_index(space_axis)
        parts = []
        slab, full = block, None
        for lvl in range(cfg.levels):
            h_l, w_l = H >> lvl, W >> lvl
            hs = h_l // S
            k_l = cfg.level_capacity(lvl)
            if not plan[lvl]:
                if full is None:
                    full = lax.all_gather(
                        slab, space_axis, axis=1, tiled=True
                    )
                parts.append(
                    _level_features(
                        full, lvl, cfg,
                        basis_fn=basis_fn, coeff_fn=coeff_fn,
                        desc_fn=desc_fn, approx=False,
                    )
                )
                full = pyr_down(full)
                continue

            g0 = idx * hs  # this shard's first global row at this level
            hal = halo_exchange_rows(slab, halo, space_axis)
            # basis valid on slab +- desc_r rows; local row i is global
            # row (g0 - desc_r + i)
            basis, score, ctm, stm = _score_maps(
                hal,
                basis_fn=lambda im: filter_bank_xla(
                    im, bank.xtaps, bank.ytaps, pad_axes=(False, True)
                ),
                coeff_fn=coeff_fn,
                score=cfg.score,
            )
            hloc = hs + 2 * desc_r
            off = g0 - desc_r
            lo = jnp.maximum(nms_b - off, desc_r)
            hi = jnp.minimum(h_l - nms_b - off, desc_r + hs)
            row_f = (
                lax.broadcasted_iota(jnp.float32, (hloc, w_l), 0)
                + off.astype(jnp.float32)
            )
            col_f = lax.broadcasted_iota(jnp.float32, (hloc, w_l), 1)
            yx, s, valid, theta, riw, ciw = jax.vmap(
                partial(
                    _detect_slab, k=k_l, nms_radius=cfg.nms_radius,
                    threshold=cfg.threshold, lo=lo, hi=hi,
                )
            )(score, ctm, stm, jnp.broadcast_to(row_f, score.shape),
              jnp.broadcast_to(col_f, score.shape))
            yx = yx.at[..., 0].add(off.astype(jnp.float32))
            flat = (riw.astype(jnp.int32) * w_l + ciw.astype(jnp.int32))

            # candidate merge: [S, B_loc, K] gathered, replicated result
            gathered = lax.all_gather(
                (s, flat, yx, theta, valid), space_axis
            )
            shard_id = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[:, None, None],
                gathered[0].shape,
            )
            flatten = lambda x: jnp.moveaxis(x, 0, 1).reshape(
                (x.shape[1], S * k_l) + x.shape[3:]
            )
            gs, gf, gyx, gth, gv = map(flatten, gathered)
            gsh = flatten(shard_id)
            ms, myx, mth, mv, msh = jax.vmap(
                partial(_merge_candidates, k=k_l)
            )(gs, gf, gyx, gth, gv, gsh)

            # descriptors: provenance ownership + global-edge clamp fix
            edge_top = jnp.broadcast_to(
                basis[..., desc_r : desc_r + 1, :],
                basis[..., :desc_r, :].shape,
            )
            edge_bot = jnp.broadcast_to(
                basis[..., desc_r + hs - 1 : desc_r + hs, :],
                basis[..., desc_r + hs :, :].shape,
            )
            basis = basis.at[..., :desc_r, :].set(
                jnp.where(idx == 0, edge_top, basis[..., :desc_r, :])
            )
            basis = basis.at[..., desc_r + hs :, :].set(
                jnp.where(
                    idx == S - 1, edge_bot, basis[..., desc_r + hs :, :]
                )
            )
            own = mv & (msh == idx)
            kp_local = Keypoints(
                yx=myx.at[..., 0].add(-off.astype(jnp.float32)),
                score=ms,
                theta=mth,
                valid=own,
            )
            desc = jax.vmap(
                lambda b, kk: desc_fn(
                    b, kk, grid=cfg.descriptor_grid,
                    spacing=cfg.descriptor_spacing,
                )
            )(basis, kp_local)
            desc = lax.psum(desc, space_axis)

            scale = float(2**lvl)
            parts.append(
                Features(
                    yx=jnp.where(mv[..., None], myx * scale, 0.0),
                    score=jnp.where(mv, ms, 0.0),
                    theta=jnp.where(mv, mth, 0.0),
                    level=jnp.full(ms.shape, lvl, jnp.int32),
                    desc=desc,
                    valid=mv,
                )
            )

            # next level's slab: 5-tap blur on slab +- 2 halo rows (reuse
            # the big halo), decimate even LOCAL rows == even global rows
            # (hs is even whenever the next level is sharded)
            if lvl + 1 < cfg.levels:
                if plan[lvl + 1]:
                    blurred = filter_bank_xla(
                        hal[..., halo - 2 : halo + hs + 2, :],
                        bin_taps, bin_taps, pad_axes=(False, True),
                    )[..., 0, :, :]
                    slab = blurred[..., ::2, ::2]
                else:
                    full = pyr_down(
                        lax.all_gather(slab, space_axis, axis=1, tiled=True)
                    )
        feats = Features(
            *(jnp.concatenate(xs, axis=1) for xs in zip(*parts))
        )
        return feats

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(data_axis, space_axis, None),
        out_specs=P(data_axis),
        # outputs ARE space-replicated (every field descends from an
        # all_gather'd candidate pool or a psum), but the static VMA
        # inference cannot see through the sort-based merge; the parity
        # tests assert the replication property end-to-end instead
        check_vma=False,
    )
    return fn(images)
