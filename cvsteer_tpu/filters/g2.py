"""G2/H2 steerable quadrature pair — functional, batched, jit/vmap-composable.

Re-design of the reference's ``fa::SteerableFiltersG2`` class
(cvsteer/SteerableFiltersG2.{h,cpp}) as pure functions over a stacked basis
tensor ``[..., 7, H, W]`` (order: g2a, g2b, g2c, h2a, h2b, h2c, h2d).

Capability parity map (reference -> here):
- ctor + setup (SteerableFiltersG2.cpp:44-68)        -> g2_bank + g2_basis
- energy Fourier coefficients c1..c3 (.cpp:70-95)    -> energy_coefficients
- dominant orientation map (.cpp:97-99)              -> dominant_orientation
- steer(theta scalar/map/point) (.cpp:115-155)       -> steer (broadcasts), steer_at
- computeMagnitudeAndPhase (.cpp:107-112)            -> magnitude_phase
- oriented energy E(theta) (.cpp:157-177)            -> oriented_energy
- phaseWeights (.cpp:179-186)                        -> phase_weights
- findEdges/findDarkLines/findBrightLines (:201-212) -> find_edges/find_dark_lines/
                                                        find_bright_lines
- full CLI/test pipeline (example/steer.cpp:86-90,
  test/test.cpp:85-90)                               -> steerable_pipeline_g2

Conventions preserved for golden parity:
- theta=0 is the vertical orientation, increasing counterclockwise (paper
  convention, noted at SteerableFiltersG2.cpp:88-91).
- angles wrapped to (-pi, pi] (SteerableFilters.cpp:46-51); jnp.arctan2
  produces that range directly, replacing OpenCV's [0,2pi) + wrap.
- phase semantics: 0 = dark line, +-pi = bright line, +-pi/2 = edge
  (SteerableFiltersG2.cpp:102-106).
- the reference CLI/test feed *magnitude* (not oriented energy) to the
  find* extractors (example/steer.cpp:88-90, test/test.cpp:88-90); the
  pipeline here does the same so golden outputs match.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvsteer_tpu.filters.taps import (
    G2_DEFAULT_SPACING,
    G2_DEFAULT_WIDTH,
    SeparableBank,
    g2h2_bank,
)
from cvsteer_tpu.ops.sepconv import filter_bank_xla


class G2Bank(NamedTuple):
    """Static filter-bank parameters for G2/H2 (a pytree of tap constants)."""

    xtaps: np.ndarray  # [7, T]
    ytaps: np.ndarray  # [7, T]
    width: int
    spacing: float

    @property
    def radius(self) -> int:
        return (self.xtaps.shape[1] - 1) // 2


def g2_bank(width: int = G2_DEFAULT_WIDTH, spacing: float = G2_DEFAULT_SPACING) -> G2Bank:
    bank: SeparableBank = g2h2_bank(width, spacing)
    return G2Bank(xtaps=bank.xtaps, ytaps=bank.ytaps, width=width, spacing=spacing)


# Basis stacking order, used everywhere downstream.
G2A, G2B, G2C, H2A, H2B, H2C, H2D = range(7)


def g2_basis(image: jax.Array, bank: Optional[G2Bank] = None, *, method: str = "auto") -> jax.Array:
    """Compute the 7 basis responses ``[..., 7, H, W]`` of ``image [..., H, W]``.

    Replaces the 7 ``cv::sepFilter2D`` calls of SteerableFiltersG2::setup
    (cvsteer/SteerableFiltersG2.cpp:60-68) with one batched bank convolution.

    ``method``: 'xla' (lax conv), 'pallas' (fused kernel), or 'auto'
    (pallas on TPU when shapes allow, else xla).
    """
    if bank is None:
        bank = g2_bank()
    if method == "auto":
        method = _auto_method(image)
    if method == "pallas":
        from cvsteer_tpu.ops.pallas_frontend import (
            _taps_tuple,
            filter_bank_pallas_diff,
        )

        # differentiable wrapper: fused kernel forward, XLA-derived VJP
        return filter_bank_pallas_diff(
            image, _taps_tuple(bank.xtaps), _taps_tuple(bank.ytaps)
        )
    return filter_bank_xla(image, bank.xtaps, bank.ytaps)


def _auto_method(image: jax.Array) -> str:
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    return "pallas" if on_tpu else "xla"


def energy_coefficients(basis: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fourier coefficients (c1, c2, c3) of the oriented energy E(theta).

    E(theta) = c1 + c2*cos(2 theta) + c3*sin(2 theta): the Freeman-Adelson
    second-harmonic expansion of G2(theta)^2 + H2(theta)^2. Coefficient table
    matches cvsteer/SteerableFiltersG2.cpp:93-95 exactly.
    """
    g2a, g2b, g2c = basis[..., G2A, :, :], basis[..., G2B, :, :], basis[..., G2C, :, :]
    h2a, h2b, h2c, h2d = (
        basis[..., H2A, :, :],
        basis[..., H2B, :, :],
        basis[..., H2C, :, :],
        basis[..., H2D, :, :],
    )

    c1 = (
        0.5 * g2b * g2b
        + 0.25 * g2a * g2c
        + 0.375 * (g2a * g2a + g2c * g2c)
        + 0.3125 * (h2a * h2a + h2d * h2d)
        + 0.5625 * (h2b * h2b + h2c * h2c)
        + 0.375 * (h2a * h2c + h2b * h2d)
    )
    c2 = (
        0.5 * (g2a * g2a - g2c * g2c)
        + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c)
        + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2a * g2b)
        - g2b * g2c
        - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c
        - 0.1875 * h2a * h2d
    )
    return c1, c2, c3


def corner_strength(
    c1: jax.Array, c2: jax.Array, c3: jax.Array
) -> jax.Array:
    """Orientation-isotropic energy: c1 - |(c2, c3)| = min_theta E(theta).

    The oriented strength |(c2, c3)| peaks along ridges/edges where the
    keypoint position slides under viewpoint change; the minimum of the
    energy over orientations instead peaks at junctions, corners and blob
    centers — the steerable-energy analog of the Harris/min-eigenvalue
    criterion, and the default detector score for the feature front-end."""
    return c1 - jnp.hypot(c2, c3)


def dominant_orientation(c2: jax.Array, c3: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(theta, strength): per-pixel dominant orientation of the energy.

    theta = arctan2(c3, c2) / 2 in (-pi/2, pi/2], strength = |(c2, c3)|.
    Matches cartToPolar + wrap + halving at SteerableFiltersG2.cpp:97-99
    (jnp.arctan2 already yields the wrapped (-pi, pi] range).
    """
    theta = 0.5 * jnp.arctan2(c3, c2)
    strength = jnp.hypot(c2, c3)
    return theta, strength


def steer(basis: jax.Array, theta) -> Tuple[jax.Array, jax.Array]:
    """Steer the quadrature pair to orientation(s) ``theta``.

    ``theta`` may be a python/0-d scalar (whole-image steering,
    SteerableFiltersG2.cpp:137-145) or a per-pixel map broadcastable against
    the basis images (.cpp:147-155).

    G2(theta) = cos^2 t * g2a - 2 cos t sin t * g2b + sin^2 t * g2c
    H2(theta) = cos^3 t * h2a - 3 cos^2 t sin t * h2b
                + 3 cos t sin^2 t * h2c - sin^3 t * h2d
    """
    theta = jnp.asarray(theta, dtype=basis.dtype)
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    ct2, st2 = ct * ct, st * st
    ct3, st3 = ct2 * ct, st2 * st

    g2 = (
        ct2 * basis[..., G2A, :, :]
        - 2.0 * ct * st * basis[..., G2B, :, :]
        + st2 * basis[..., G2C, :, :]
    )
    h2 = (
        ct3 * basis[..., H2A, :, :]
        - 3.0 * ct2 * st * basis[..., H2B, :, :]
        + 3.0 * ct * st2 * basis[..., H2C, :, :]
        - st3 * basis[..., H2D, :, :]
    )
    return g2, h2


def wrap_angle(angle: jax.Array) -> jax.Array:
    """Map angles from [0, 2pi) to (-pi, pi] — parity with
    ``SteerableFilters::wrap`` (cvsteer/SteerableFilters.cpp:46-51).

    The internal pipeline never needs it (arctan2 already returns the
    wrapped range); exposed for API completeness (C4)."""
    return jnp.where(angle > math.pi, angle - 2.0 * math.pi, angle)


def steer_at(basis: jax.Array, y, x, theta) -> Tuple[jax.Array, jax.Array]:
    """Steer at a single pixel (y, x) — parity with the cv::Point overloads
    (SteerableFiltersG2.cpp:115-134). Returns scalar (g2, h2)."""
    point_basis = basis[..., :, y, x][..., :, None, None]
    g2, h2 = steer(point_basis, theta)
    return g2[..., 0, 0], h2[..., 0, 0]


def analyze_at(
    basis: jax.Array, y, x, theta
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Point steering with the full response set (g2, h2, e, magnitude,
    phase) — parity with the extended cv::Point overload
    (SteerableFiltersG2.cpp:124-134)."""
    g2v, h2v = steer_at(basis, y, x, theta)
    point_basis = basis[..., :, y, x][..., :, None, None]
    c1, c2, c3 = energy_coefficients(point_basis)
    e = oriented_energy(c1, c2, c3, theta)[..., 0, 0]
    magnitude, phase = magnitude_phase(g2v, h2v)
    return g2v, h2v, e, magnitude, phase


def magnitude_phase(g2: jax.Array, h2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quadrature magnitude sqrt(g2^2+h2^2) and phase atan2(h2, g2) in (-pi, pi].

    Parity with computeMagnitudeAndPhase (SteerableFiltersG2.cpp:107-112);
    the wrap step is implicit in arctan2 and patchNaNs becomes nan_to_num.
    """
    magnitude = jnp.hypot(g2, h2)
    phase = jnp.nan_to_num(jnp.arctan2(h2, g2))
    return magnitude, phase


def oriented_energy(c1: jax.Array, c2: jax.Array, c3: jax.Array, theta) -> jax.Array:
    """E(theta) = c1 + cos(2 theta) c2 + sin(2 theta) c3 (scalar or map theta).

    Parity with SteerableFiltersG2.cpp:157-177."""
    theta = jnp.asarray(theta, dtype=c1.dtype)
    return c1 + jnp.cos(2.0 * theta) * c2 + jnp.sin(2.0 * theta) * c3


def phase_weights(phase: jax.Array, phi: float, signum: bool, k: float = 2.0) -> jax.Array:
    """Phase-selectivity weight lambda = cos^2(err), zeroed where err > pi/2.

    err = |phase - phi| (signum=True) or ||phase| - |phi|| (signum=False),
    folded by err = min(err, 2pi - err). Parity with phaseWeights
    (SteerableFiltersG2.cpp:179-186). NOTE: like the reference, the sharpness
    exponent ``k`` is accepted but unused — cos^2 is hard-coded there (C15).
    """
    del k  # reference quirk: parameter parsed but unused (SteerableFiltersG2.cpp:179-186)
    phi = float(phi)
    if signum:
        err = jnp.abs(phase - phi)
    else:
        err = jnp.abs(jnp.abs(phase) - abs(phi))
    err = jnp.minimum(err, 2.0 * math.pi - err)
    lam = jnp.cos(err) ** 2
    return jnp.where(err > math.pi / 2.0, 0.0, lam).astype(phase.dtype)


def find_edges(e: jax.Array, phase: jax.Array, k: float = 2.0) -> jax.Array:
    """Edge map: e * phase_weights(phase, pi/2, abs-mode). Parity: .cpp:201-204."""
    return e * phase_weights(phase, math.pi / 2.0, signum=False, k=k)


def find_dark_lines(e: jax.Array, phase: jax.Array, k: float = 2.0) -> jax.Array:
    """Dark-line map: e * phase_weights(phase, 0, signed). Parity: .cpp:205-208."""
    return e * phase_weights(phase, 0.0, signum=True, k=k)


def find_bright_lines(e: jax.Array, phase: jax.Array, k: float = 2.0) -> jax.Array:
    """Bright-line map: e * phase_weights(phase, pi, signed). Parity: .cpp:209-212."""
    return e * phase_weights(phase, math.pi, signum=True, k=k)


class G2Maps(NamedTuple):
    """All maps produced by the reference CLI/test pipeline, batched."""

    g2: jax.Array
    h2: jax.Array
    energy: jax.Array
    magnitude: jax.Array
    phase: jax.Array
    theta: jax.Array
    strength: jax.Array
    edges: jax.Array
    lines_dark: jax.Array
    lines_bright: jax.Array


def steerable_pipeline_g2(
    image: jax.Array, bank: Optional[G2Bank] = None, *, method: str = "auto"
) -> G2Maps:
    """Full G2 analysis of ``image [..., H, W]`` (grayscale float, 0..255 scale).

    Mirrors the reference's end-to-end flow (example/steer.cpp:86-90,
    test/test.cpp:85-90): basis -> energy coefficients -> dominant
    orientation -> per-pixel steering -> magnitude/phase -> oriented energy ->
    edge & line maps. The extractors consume *magnitude*, matching the
    reference callers (quirk C23 in SURVEY.md).

    ACCURACY CLASS: every ``method`` here is fp32-exact-class — "xla"
    (HIGHEST-precision convolutions), "pallas" (fp32 Pallas basis kernel,
    <= ~1e-4 max-rel vs "xla" on chip), "auto" (= "pallas" on TPU, "xla"
    elsewhere). The FAST bf16x3 fused kernel (~2e-3 max-rel-to-mean class,
    1.7e-2 observed worst-map on chip) is never selected implicitly: it is
    the separate, explicitly named :func:`g2_output_maps`
    (accuracy="fast") / ops.pallas_frontend.g2_maps_pallas. The TPU CI leg
    asserts both bounds on the real chip
    (tests/test_pallas_frontend.py::test_accuracy_classes_on_chip).
    """
    if bank is None:
        bank = g2_bank()
    if method == "auto" and jax.default_backend() == "tpu":
        from cvsteer_tpu.ops.pallas_frontend import steerable_pipeline_g2_pallas

        return steerable_pipeline_g2_pallas(image, bank)

    basis = g2_basis(image, bank, method="xla" if method == "auto" else method)
    c1, c2, c3 = energy_coefficients(basis)
    theta, strength = dominant_orientation(c2, c3)
    g2v, h2v = steer(basis, theta)
    magnitude, phase = magnitude_phase(g2v, h2v)
    e = oriented_energy(c1, c2, c3, theta)
    edges = find_edges(magnitude, phase)
    dark = find_dark_lines(magnitude, phase)
    bright = find_bright_lines(magnitude, phase)
    return G2Maps(
        g2=g2v,
        h2=h2v,
        energy=e,
        magnitude=magnitude,
        phase=phase,
        theta=theta,
        strength=strength,
        edges=edges,
        lines_dark=dark,
        lines_bright=bright,
    )


def g2_output_maps(
    image: jax.Array,
    bank: Optional[G2Bank] = None,
    *,
    accuracy: str = "fast",
    out_dtype=None,
):
    """The three reference output maps (edges, lines_dark, lines_bright)
    with an EXPLICIT accuracy class (VERDICT r2 item 10):

    - ``accuracy="fast"``: the fused bf16x3 Pallas kernel — one HBM read,
      three map writes, ~22 us/frame device @512x512. Error class ~2e-3
      max-rel-to-mean vs the fp32 path (1.7e-2 observed worst-map on
      chip); far inside the reference golden test's 1.0-gray bar (the
      on-chip margin is >3x even with bf16 output, docs/ROOFLINE.md).
      This is what the CLI and benchmarks use.
    - ``accuracy="precise"``: fp32-exact-class maps via the full pipeline
      (steerable_pipeline_g2) — <= ~1e-4 max-rel on chip, ~24x slower.

    ``out_dtype`` (fast path): jnp.bfloat16 halves map write traffic;
    defaults to fp32.

    A consumer can no longer cross accuracy classes silently: the fast
    kernel is reachable only through this explicit flag (or the
    ops.pallas_frontend functions directly).
    """
    import jax.numpy as jnp

    if bank is None:
        bank = g2_bank()
    if accuracy == "fast":
        from cvsteer_tpu.ops.pallas_frontend import g2_maps_pallas

        return g2_maps_pallas(
            image, bank.xtaps, bank.ytaps,
            out_dtype=jnp.float32 if out_dtype is None else out_dtype,
        )
    if accuracy != "precise":
        raise ValueError(f"accuracy must be 'fast' or 'precise', got {accuracy!r}")
    maps = steerable_pipeline_g2(image, bank)
    out = (maps.edges, maps.lines_dark, maps.lines_bright)
    if out_dtype is not None:
        out = tuple(m.astype(out_dtype) for m in out)
    return out
