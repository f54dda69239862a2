"""Batched separable filter-bank convolution (TPU, XLA path).

The reference applies its filter bank as K independent ``cv::sepFilter2D``
calls per image (cvsteer/SteerableFiltersG2.cpp:62-68 — 7 filters, and
SteerableFiltersG4.cpp:69-81 — 11 filters), i.e. 2·K one-dimensional passes
over HBM-resident data per image. Here the whole bank is ONE batched op:

    image[..., H, W]  ->  basis[..., K, H, W]

Semantics matched to OpenCV for golden parity:
- cross-correlation (no kernel flip) — both OpenCV's sepFilter2D and XLA's
  conv are correlations;
- BORDER_REFLECT_101 boundary (``gfedcb|abcdefgh|gfedcba``) == numpy/jnp
  ``mode='reflect'``;
- float32 accumulation.

Two implementations:
- :func:`filter_bank_xla` — ``lax.conv_general_dilated`` (row pass fans out
  1->K channels, column pass is K-grouped depthwise). Correctness reference,
  also fast for small images.
- :func:`cvsteer_tpu.ops.pallas_frontend` — fused Pallas kernel doing both
  passes (and the downstream steering math) VMEM-resident. The perf path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def reflect_pad_2d(image: jax.Array, radius: int, axes=(True, True)) -> jax.Array:
    """REFLECT_101 padding of the trailing two axes by ``radius``.

    ``axes``: (pad_height, pad_width) — an axis already carrying halo rows
    (spatially sharded execution, cvsteer_tpu.parallel.halo) is skipped.
    """
    if radius == 0:
        return image
    rh = radius if axes[0] else 0
    rw = radius if axes[1] else 0
    pad = [(0, 0)] * (image.ndim - 2) + [(rh, rh), (rw, rw)]
    return jnp.pad(image, pad, mode="reflect")


def filter_bank_xla(image: jax.Array, xtaps, ytaps, *, pad_axes=(True, True)) -> jax.Array:
    """Apply a stacked separable bank via XLA convolutions.

    Args:
      image: ``[..., H, W]`` single-channel image(s), any float dtype.
      xtaps: ``[K, T]`` horizontal taps (applied along W).
      ytaps: ``[K, T]`` vertical taps (applied along H).
      pad_axes: which of (H, W) to REFLECT_101-pad. Pass ``(False, True)``
        when H already carries ``radius`` halo rows from a neighbor exchange;
        the output is then ``radius`` rows shorter on each side.

    Returns:
      ``[..., K, H', W]`` basis responses, same dtype as the accumulation
      dtype (float32 unless the input is wider).
    """
    xtaps = jnp.asarray(xtaps)
    ytaps = jnp.asarray(ytaps)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, H, W = image.shape

    acc_dtype = jnp.promote_types(image.dtype, jnp.float32)
    img = image.reshape((-1, 1, H, W)).astype(acc_dtype)
    img = reflect_pad_2d(img, r, pad_axes)
    H_out = H if pad_axes[0] else H - 2 * r

    # HIGHEST precision: on TPU the DEFAULT conv/dot precision routes fp32
    # operands through the MXU as bfloat16, which breaks golden parity
    # (taps like 0.755 quantize to 0.7539). This path is the correctness
    # reference; the perf path is the Pallas kernel.
    prec = lax.Precision.HIGHEST

    # Row pass: [N,1,H+2r,W+2r] * kx[K,1,1,T] -> [N,K,H+2r,W]
    kx = xtaps.reshape(K, 1, 1, T).astype(acc_dtype)
    dn = lax.conv_dimension_numbers(img.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    row = lax.conv_general_dilated(
        img, kx, (1, 1), "VALID", dimension_numbers=dn, precision=prec
    )

    # Column pass (depthwise): [N,K,H+2r,W] * ky[K,1,T,1] -> [N,K,H,W]
    ky = ytaps.reshape(K, 1, T, 1).astype(acc_dtype)
    dn2 = lax.conv_dimension_numbers(row.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(
        row, ky, (1, 1), "VALID", dimension_numbers=dn2,
        feature_group_count=K, precision=prec,
    )
    return out.reshape(tuple(batch) + (K, H_out, W))


def filter_bank_shifts(image: jax.Array, xtaps, ytaps) -> jax.Array:
    """Shift-and-accumulate formulation of the same bank (unrolled taps).

    Equivalent to :func:`filter_bank_xla`; exists as an independent oracle for
    testing and as the formulation the Pallas kernel mirrors.
    """
    xtaps = np.asarray(xtaps)
    ytaps = np.asarray(ytaps)
    K, T = xtaps.shape
    r = (T - 1) // 2
    *batch, H, W = image.shape
    acc_dtype = jnp.promote_types(image.dtype, jnp.float32)
    padded = reflect_pad_2d(image.astype(acc_dtype), r)

    outs = []
    for k in range(K):
        rowk = sum(
            padded[..., :, t : t + W] * float(xtaps[k, t]) for t in range(T)
        )  # [..., H+2r, W]
        colk = sum(rowk[..., t : t + H, :] * float(ytaps[k, t]) for t in range(T))
        outs.append(colk)
    return jnp.stack(outs, axis=-3)
