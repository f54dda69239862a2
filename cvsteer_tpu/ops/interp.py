"""Bilinear sampling (gather-based, static-shaped) for descriptor extraction.

TPU-friendly replacement for scattered cv2.remap-style access: a fixed-size
set of sample coordinates gathers from a map with edge clamping. All shapes
static; out-of-bounds coordinates clamp to the border pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample ``img [..., H, W]`` at float coordinates ``ys/xs [S...]``.

    Returns ``[..., S...]`` — sample axes appended after the batch axes.
    Coordinates are in pixel units (y, x), clamped to the image border.
    """
    *batch, H, W = img.shape
    s_shape = ys.shape
    ys = jnp.clip(ys.reshape(-1), 0.0, H - 1.0)
    xs = jnp.clip(xs.reshape(-1), 0.0, W - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = ys - y0.astype(ys.dtype)
    wx = xs - x0.astype(xs.dtype)

    flat = img.reshape((-1, H * W))

    def gather(yi, xi):
        return flat[:, yi * W + xi]  # [B, S]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(tuple(batch) + s_shape)


def bilinear_sample_channels_last_pair_bf16(
    img: jax.Array, ys: jax.Array, xs: jax.Array
) -> jax.Array:
    """Like :func:`bilinear_sample_channels_last`, at half the gather cost.

    TPU XLA row gathers are BYTE-bound (~5-6 ns per 28-byte row on v5e,
    flat in row count — measured, see docs/ROOFLINE.md), so the win is to
    fetch fewer bytes, not fewer calls. The table stores each pixel PAIRED
    with its right neighbor in bfloat16: one row fetch covers both x
    corners at the same byte cost as one fp32 single-pixel row, so the four
    corner gathers become two and total gather bytes halve. Sampling
    precision drops to bf16 (~3 decimal digits); the bilinear combine and
    all downstream math stay fp32. Intended for descriptor sampling, where
    the result is L2-normalized and matching is ratio-test based.
    """
    H, W, C = img.shape
    s_shape = ys.shape
    ys = jnp.clip(ys.reshape(-1), 0.0, H - 1.0)
    xs = jnp.clip(xs.reshape(-1), 0.0, W - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wy = (ys - y0.astype(ys.dtype))[:, None]
    wx = (xs - x0.astype(xs.dtype))[:, None]

    # pair table: row (y, x) = [v(y, x) | v(y, min(x+1, W-1))], bf16.
    # Cast BEFORE the neighbor concat: the layout passes then move 2-byte
    # elements (measured ~4 us/frame cheaper at 480x640 b8, round 3).
    imgb = img.astype(jnp.bfloat16)
    right = jnp.concatenate([imgb[:, 1:], imgb[:, -1:]], axis=1)
    tbl = jnp.concatenate([imgb, right], axis=-1)
    tbl = tbl.reshape(H * W, 2 * C)

    rt = tbl[y0 * W + x0].astype(jnp.float32)  # [S, 2C]: (v00 | v01)
    rb = tbl[y1 * W + x0].astype(jnp.float32)  # [S, 2C]: (v10 | v11)
    top = rt[:, :C] * (1.0 - wx) + rt[:, C:] * wx
    bot = rb[:, :C] * (1.0 - wx) + rb[:, C:] * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(s_shape + (C,))


def bilinear_sample_channels_last_quad_bf16(
    img: jax.Array, ys: jax.Array, xs: jax.Array
) -> jax.Array:
    """Bilinear sampling via ONE bf16 row gather per sample.

    The table packs the full 2x2 interpolation neighborhood per pixel:
    row (y, x) = [v(y,x) | v(y,x+1) | v(y+1,x) | v(y+1,x+1)] in bfloat16
    (x+1 / y+1 edge-clamped). Measured on v5e, XLA gather cost is
    (fixed-per-row + per-lane): one 4C-lane call beats two 2C-lane calls
    (see bilinear_sample_channels_last_pair_bf16) by another fixed-cost
    unit per sample batch. Combine + downstream stay fp32.
    """
    H, W, C = img.shape
    s_shape = ys.shape
    ys = jnp.clip(ys.reshape(-1), 0.0, H - 1.0)
    xs = jnp.clip(xs.reshape(-1), 0.0, W - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = (ys - y0.astype(ys.dtype))[:, None]
    wx = (xs - x0.astype(xs.dtype))[:, None]

    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    row0 = jnp.concatenate([img, right], axis=-1)  # [H, W, 2C]
    row1 = jnp.concatenate([row0[1:], row0[-1:]], axis=0)  # y+1, clamped
    tbl = jnp.concatenate([row0, row1], axis=-1).astype(jnp.bfloat16)
    tbl = tbl.reshape(H * W, 4 * C)

    r = tbl[y0 * W + x0].astype(jnp.float32)  # [S, 4C] — one gather
    top = r[:, :C] * (1.0 - wx) + r[:, C : 2 * C] * wx
    bot = r[:, 2 * C : 3 * C] * (1.0 - wx) + r[:, 3 * C :] * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(s_shape + (C,))


def bilinear_sample_channels_last(
    img: jax.Array, ys: jax.Array, xs: jax.Array
) -> jax.Array:
    """Sample ``img [H, W, C]`` at float coordinates ``ys/xs [S...]``.

    Returns ``[S..., C]``. TPU-shaped gather: with channels last, every
    sample fetches one ROW of the [H*W, C] matrix — a major-dimension
    gather, which XLA lowers efficiently — instead of per-element picks
    along the minor (lane) dimension, which are ~50x slower on TPU.
    """
    H, W, C = img.shape
    s_shape = ys.shape
    ys = jnp.clip(ys.reshape(-1), 0.0, H - 1.0)
    xs = jnp.clip(xs.reshape(-1), 0.0, W - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0.astype(ys.dtype))[:, None]
    wx = (xs - x0.astype(xs.dtype))[:, None]

    flat = img.reshape(H * W, C)
    v00 = flat[y0 * W + x0]  # [S, C] row gathers
    v01 = flat[y0 * W + x1]
    v10 = flat[y1 * W + x0]
    v11 = flat[y1 * W + x1]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(s_shape + (C,))
