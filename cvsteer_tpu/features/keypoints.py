"""Keypoint detection: NMS on the dominant-orientation strength map.

The reference computes a per-pixel orientation strength
(m_orientationStrength, cvsteer/SteerableFiltersG2.cpp:97-99) but never
extracts points from it. Here it becomes a detector (BASELINE config 2):
local-maximum NMS + threshold + fixed-size top-N selection, with subpixel
quadratic refinement — all static shapes, masked where fewer than N
keypoints exist.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from cvsteer_tpu.ops.pallas_frontend import P3_SENTINEL


class Keypoints(NamedTuple):
    """A fixed-capacity keypoint set (invalid slots masked).

    yx:     [N, 2] float32 subpixel (row, col) coordinates.
    score:  [N] detector response (orientation strength).
    theta:  [N] dominant orientation at the keypoint, (-pi/2, pi/2].
    valid:  [N] bool mask.
    """

    yx: jax.Array
    score: jax.Array
    theta: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.yx.shape[-2]


def _maxpool_same(x: jax.Array, k: int) -> jax.Array:
    """k x k max pool, stride 1, -inf padded, over trailing two axes."""
    r = k // 2
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)],
    )


def _subpixel_offset(ym: jax.Array, y0: jax.Array, yp: jax.Array):
    """1-D quadratic peak offset in [-0.5, 0.5] from neighbor samples."""
    denom = ym - 2.0 * y0 + yp
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym - yp) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


def _detect_core(
    strength: jax.Array,
    aux: Sequence[jax.Array],
    max_keypoints: int,
    nms_radius: int,
    threshold: float,
    border: Optional[int],
    approx: bool,
    row_range=None,
):
    """NMS + top-N selection + subpixel refinement.

    Returns (yx, scores, valid, aux_rows) where ``aux_rows [N, len(aux)]``
    holds each aux map's value at the keypoint. The subpixel neighborhood
    (4 neighbors) and the aux picks come from ONE channels-last row gather
    of a stacked table: per-element picks along the minor (lane) dimension
    are ~50x slower on TPU than major-dim row gathers (see ops/interp.py),
    and the old form cost 6+ such picks per level. Border note: keypoints
    can only be selected at least ``border`` (>= 1) pixels from the edge,
    so the edge-clamped shifted maps agree with interior neighbor reads.

    ``row_range=(lo, hi)`` replaces the ROW part of the border mask with an
    explicit half-open local-row window (columns keep ``border``): used by
    spatially sharded detection (parallel.features_sharded), where the map
    is a row slab with halos — NMS sees the true haloed neighborhood but
    only rows this shard owns (already intersected with the global border
    by the caller) may produce keypoints. Needs 1 <= lo and hi <= H-1 so
    the refine gathers stay in-map.
    """
    H, W = strength.shape
    k = 2 * nms_radius + 1
    b = (nms_radius + 1) if border is None else border

    is_max = strength >= _maxpool_same(strength, k)
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    if row_range is None:
        row_ok = (row >= b) & (row < H - b)
    else:
        row_ok = (row >= row_range[0]) & (row < row_range[1])
    in_border = row_ok & (col >= b) & (col < W - b)
    mask = is_max & in_border & (strength > threshold)

    score_masked = jnp.where(mask, strength, -jnp.inf)
    return _select_and_refine(
        strength,
        score_masked,
        aux,
        max_keypoints,
        approx,
        pool=nms_radius + 1 if approx else 1,
    )


def _select_and_refine(
    strength: jax.Array,
    score_masked: jax.Array,
    aux: Sequence[jax.Array],
    max_keypoints: int,
    approx: bool,
    pool: int = 1,
):
    """Top-N selection on a pre-masked score + table-gather subpixel/aux.

    ``pool`` (s): optional s x s strided max-pool pre-reduction of the
    top-k input. Sound when s <= nms_radius + 1: NMS admits no two
    survivors within Chebyshev distance <= r (each strictly beats its
    r-window), so every pool cell holds at most one survivor and the
    cell-max top-k equals the full top-k — on s^2-fold fewer elements
    (approx_max_k cost scales with total elements, measured on v5e).
    Sole divergence: two EXACTLY equal maxima within r of each other
    (ties survive the >= NMS) can share a cell and deduplicate; real
    imagery never produces exact ties off flat masked-out regions.
    """
    H, W = strength.shape
    kk = min(max_keypoints, H * W)  # tiny pyramid levels: fewer pixels than k
    Hp, Wp = -(-H // pool), -(-W // pool)
    if approx and pool > 1 and kk < Hp * Wp:
        sm = jnp.pad(
            score_masked,
            ((0, Hp * pool - H), (0, Wp * pool - W)),
            constant_values=-jnp.inf,
        )
        cells = (
            sm.reshape(Hp, pool, Wp, pool)
            .transpose(0, 2, 1, 3)
            .reshape(Hp * Wp, pool * pool)
        )
        cell_scores, cell_idx = lax.approx_max_k(
            cells.max(-1), kk, recall_target=0.99
        )
        rows = cells[cell_idx]  # [kk, s*s] — one row gather
        off = jnp.argmax(rows, axis=-1)
        cy = (cell_idx // Wp) * pool + off // pool
        cx = (cell_idx % Wp) * pool + off % pool
        flat_scores = cell_scores
        flat_idx = cy * W + cx  # padded picks are -inf -> masked invalid
        if kk < max_keypoints:
            pad = max_keypoints - kk
            flat_scores = jnp.pad(flat_scores, (0, pad), constant_values=-jnp.inf)
            flat_idx = jnp.pad(flat_idx, (0, pad))
        return _gather_refine(strength, aux, flat_scores, flat_idx)
    if approx and kk < H * W:
        # TPU-optimized approximate top-k (recall >= 0.99): the full-map
        # exact top_k lowers to a whole-image sort, which dominates the
        # detector's cost on large levels.
        flat_scores, flat_idx = lax.approx_max_k(
            score_masked.reshape(-1), kk, recall_target=0.99
        )
    else:
        flat_scores, flat_idx = lax.top_k(score_masked.reshape(-1), kk)
    if kk < max_keypoints:
        pad = max_keypoints - kk
        flat_scores = jnp.pad(flat_scores, (0, pad), constant_values=-jnp.inf)
        flat_idx = jnp.pad(flat_idx, (0, pad))
    return _gather_refine(strength, aux, flat_scores, flat_idx)


def _gather_refine(
    strength: jax.Array,
    aux: Sequence[jax.Array],
    flat_scores: jax.Array,
    flat_idx: jax.Array,
):
    """Subpixel + aux picks for preselected flat indices (one row gather)."""
    H, W = strength.shape
    flat_idx = jnp.minimum(flat_idx, H * W - 1)  # cross-level padding guard
    valid = jnp.isfinite(flat_scores)
    yi = flat_idx // W
    xi = flat_idx % W

    s = strength
    up = jnp.concatenate([s[:1], s[:-1]], 0)
    down = jnp.concatenate([s[1:], s[-1:]], 0)
    left = jnp.concatenate([s[:, :1], s[:, :-1]], 1)
    right = jnp.concatenate([s[:, 1:], s[:, -1:]], 1)
    tbl = jnp.stack([s, up, down, left, right, *aux], -1).reshape(H * W, -1)
    rows = tbl[flat_idx]  # [N, 5 + A] — one row gather
    s0 = rows[:, 0]
    dy = _subpixel_offset(rows[:, 1], s0, rows[:, 2])
    dx = _subpixel_offset(rows[:, 3], s0, rows[:, 4])

    yx = jnp.stack(
        [yi.astype(jnp.float32) + dy, xi.astype(jnp.float32) + dx], axis=-1
    )
    return yx, flat_scores, valid, rows[:, 5:]


def refine_selected_cs(
    raw: jax.Array,
    ct: jax.Array,
    st: jax.Array,
    flat_scores: jax.Array,
    flat_idx: jax.Array,
) -> Keypoints:
    """Keypoints from externally selected flat indices (cross-level batched
    top-k in features.frontend — approx_max_k costs ~28 us FIXED per call
    on TPU, so one batched call replaces five per-level calls)."""
    yx, scores, valid, aux = _gather_refine(raw, [ct, st], flat_scores, flat_idx)
    theta = jnp.arctan2(aux[:, 1], aux[:, 0])
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, scores, 0.0),
        theta=jnp.where(valid, theta, 0.0),
        valid=valid,
    )


def _p3_cells(p3: jax.Array) -> jax.Array:
    """``p3[1::3, 1::3]`` as two one-hot Precision.HIGHEST matmuls.

    The strided slice lowers to an ~18 us/frame row gather on v5e; the MXU
    picks cost ~4 us and are BIT-exact over the packed-score domain: under
    1.0/0.0 weights the bf16x3 operand split reconstructs the fp32 value
    exactly (hi/mid/lo residuals are non-overlapping, so their fp32
    accumulation never rounds) as long as the lo residual is not flushed as
    a bf16 subnormal — measured on v5e (2026-08-20): exact for magnitudes
    down to ~1e-30 (~2^-100), corrupt below (3/672 cells at 1e-35..1e-30
    scale). Packed scores are thresholded corner energies (>= threshold,
    far above 2^-100 by construction) and the finite P3_SENTINEL, both
    deep inside the exact domain; the TPU CI leg pins the 1e-30 boundary
    (tests/test_pallas_frontend.py::test_p3_onehot_cell_pick_is_bit_exact).
    Requires the masked sentinel to be finite
    (ops.pallas_frontend.P3_SENTINEL): 0 * -inf would be NaN.
    """
    H, W = p3.shape
    Hc, Wc = (H + 1) // 3, (W + 1) // 3  # == len(range(1, H, 3)) etc.
    rpick = (
        jnp.zeros((Hc, H), jnp.float32)
        .at[jnp.arange(Hc), 1 + 3 * jnp.arange(Hc)]
        .set(1.0)
    )
    cpick = (
        jnp.zeros((W, Wc), jnp.float32)
        .at[1 + 3 * jnp.arange(Wc), jnp.arange(Wc)]
        .set(1.0)
    )
    return lax.dot_general(
        lax.dot_general(
            rpick, p3, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
        ),
        cpick,
        (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
    )


def detect_keypoints_packed(
    p3: jax.Array,
    dy: jax.Array,
    dx: jax.Array,
    ct: jax.Array,
    st: jax.Array,
    *,
    max_keypoints: int = 512,
) -> Keypoints:
    """Selection from the kernel's mantissa-packed pooled score map.

    Pairs with ops.pallas_frontend.g2_features_full_pallas (round 3):
    ``p3`` holds, at every pixel, the centered 3x3-window max of the
    NMS/threshold/border-masked corner score, with the winning pixel's
    (y%3)*3 + x%3 offset packed into the low 4 mantissa bits, so
    ``p3[1::3, 1::3]`` is the non-overlapping 3x3-cell max table (sound
    pooled top-k for nms_radius >= 2, see _select_and_refine) and the
    winner's position decodes arithmetically — no cells materialization,
    no winner gather, no full-res shifted-map subpixel table. ``dy/dx``
    are per-pixel subpixel offsets and (ct, st) the half-angle maps; one
    [H*W, 4] row gather fetches all per-keypoint payload.

    The stride-3 cell extraction runs as bit-exact one-hot MXU matmuls
    (see :func:`_p3_cells`), which is why p3's masked sentinel is the
    finite ``ops.pallas_frontend.P3_SENTINEL`` rather than -inf.
    """
    H, W = p3.shape
    cells = _p3_cells(p3)
    Hc, Wc = cells.shape
    kk = min(max_keypoints, Hc * Wc)
    vals, cidx = lax.approx_max_k(cells.reshape(-1), kk, recall_target=0.99)
    if kk < max_keypoints:
        pad = max_keypoints - kk
        vals = jnp.pad(vals, (0, pad), constant_values=-jnp.inf)
        cidx = jnp.pad(cidx, (0, pad))
    # Masked cells carry the finite P3_SENTINEL (the cell pick is bit-exact
    # today); kk-padding stays -inf. Compare with half-sentinel MARGIN so a
    # backend change that rounds the one-hot pick by an ulp can't turn a
    # masked cell into a valid keypoint — every real packed score sits
    # orders of magnitude above the sentinel, so the margin costs nothing.
    valid = vals > P3_SENTINEL * 0.5
    bits = lax.bitcast_convert_type(vals, jnp.int32)
    off = bits & 15
    score = lax.bitcast_convert_type(bits & ~15, jnp.float32)  # 2^-19-exact
    yi = (cidx // Wc) * 3 + off // 3
    xi = (cidx % Wc) * 3 + off % 3
    flat_idx = jnp.minimum(yi * W + xi, H * W - 1)

    tbl = jnp.stack([dy, dx, ct, st], -1).reshape(H * W, 4)
    rows = tbl[flat_idx]  # [N, 4] — one row gather
    yx = jnp.stack(
        [yi.astype(jnp.float32) + rows[:, 0], xi.astype(jnp.float32) + rows[:, 1]],
        axis=-1,
    )
    theta = jnp.arctan2(rows[:, 3], rows[:, 2])
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, score, 0.0),
        theta=jnp.where(valid, theta, 0.0),
        valid=valid,
    )


def detect_keypoints_premasked(
    raw: jax.Array,
    masked: jax.Array,
    ct: jax.Array,
    st: jax.Array,
    *,
    max_keypoints: int = 512,
    approx: bool = False,
    pool: int = 1,
) -> Keypoints:
    """Selection-only detector for pre-masked scores.

    Pairs with ops.pallas_frontend.g2_features_full_pallas, which applies
    NMS + threshold + border masking in-kernel: ``masked`` is -inf outside
    accepted maxima, ``raw`` is the unmasked score (subpixel refinement
    needs real neighbor values), (ct, st) the half-angle orientation maps.
    ``pool``: strided max-pool pre-reduction of the top-k input; sound for
    pool <= nms_radius + 1 (see _select_and_refine).
    """
    yx, scores, valid, aux = _select_and_refine(
        raw, masked, [ct, st], max_keypoints, approx, pool=pool
    )
    theta = jnp.arctan2(aux[:, 1], aux[:, 0])
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, scores, 0.0),
        theta=jnp.where(valid, theta, 0.0),
        valid=valid,
    )


def detect_keypoints(
    strength: jax.Array,
    theta: jax.Array,
    *,
    max_keypoints: int = 512,
    nms_radius: int = 2,
    threshold: float = 0.0,
    border: Optional[int] = None,
    approx: bool = False,
) -> Keypoints:
    """Detect up to ``max_keypoints`` local maxima of ``strength [H, W]``.

    ``theta [H, W]`` supplies each keypoint's dominant orientation. Batched
    inputs: vmap this function. ``border`` (default: nms_radius + 1) masks a
    frame around the image where the filter support is incomplete.
    """
    yx, scores, valid, aux = _detect_core(
        strength, [theta], max_keypoints, nms_radius, threshold, border, approx
    )
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, scores, 0.0),
        theta=jnp.where(valid, aux[:, 0], 0.0),
        valid=valid,
    )


def detect_keypoints_cs(
    strength: jax.Array,
    ct: jax.Array,
    st: jax.Array,
    *,
    max_keypoints: int = 512,
    nms_radius: int = 2,
    threshold: float = 0.0,
    border: Optional[int] = None,
    approx: bool = False,
    row_range=None,
) -> Keypoints:
    """detect_keypoints taking (cos, sin) orientation maps instead of theta.

    Pairs with the fused Pallas detector front-end, which produces the
    half-angle (cos, sin) without transcendentals; arctan2 runs only on the
    few selected keypoints. ``row_range``: see _detect_core (sharded use)."""
    yx, scores, valid, aux = _detect_core(
        strength, [ct, st], max_keypoints, nms_radius, threshold, border,
        approx, row_range=row_range,
    )
    theta = jnp.arctan2(aux[:, 1], aux[:, 0])
    return Keypoints(
        yx=jnp.where(valid[:, None], yx, 0.0),
        score=jnp.where(valid, scores, 0.0),
        theta=jnp.where(valid, theta, 0.0),
        valid=valid,
    )
