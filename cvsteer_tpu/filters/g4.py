"""G4/H4 steerable quadrature pair (4th order), with the reference's gaps filled.

Re-design of ``fa::SteerableFiltersG4`` (cvsteer/SteerableFiltersG4.{h,cpp}):
- ctor + setup (SteerableFiltersG4.cpp:47-81)  -> g4_bank + g4_basis
- steer, scalar and map theta (.cpp:92-122)    -> steer
- computeMagnitudeAndPhase: the reference is an EMPTY STUB (.cpp:88-90) and
  its m_c1..m_c3/m_theta/m_orientationStrength are never computed (quirk C20
  in SURVEY.md). Implemented properly here:
    * magnitude_phase — identical quadrature semantics to G2.
    * energy_coefficients_g4 / dominant_orientation — the 2nd Fourier
      harmonic of E(theta) = G4(theta)^2 + H4(theta)^2, recovered exactly by
      uniform angular sampling (E is a trig polynomial in 2*theta of degree
      <= 5, so a 16-point DFT over [0, pi) is exact). Documented divergence
      from the stub: the reference returns empty Mats, we return real maps.

Basis order: (g4a, g4b, g4c, g4d, g4e, h4a, h4b, h4c, h4d, h4e, h4f).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from cvsteer_tpu.filters.taps import (
    G4_DEFAULT_SPACING,
    G4_DEFAULT_WIDTH,
    g4h4_bank,
)
from cvsteer_tpu.ops.sepconv import filter_bank_xla


class G4Bank(NamedTuple):
    xtaps: np.ndarray  # [11, T]
    ytaps: np.ndarray  # [11, T]
    width: int
    spacing: float

    @property
    def radius(self) -> int:
        return (self.xtaps.shape[1] - 1) // 2


def g4_bank(width: int = G4_DEFAULT_WIDTH, spacing: float = G4_DEFAULT_SPACING) -> G4Bank:
    bank = g4h4_bank(width, spacing)
    return G4Bank(xtaps=bank.xtaps, ytaps=bank.ytaps, width=width, spacing=spacing)


G4A, G4B, G4C, G4D, G4E, H4A, H4B, H4C, H4D, H4E, H4F = range(11)


def g4_basis(image: jax.Array, bank: Optional[G4Bank] = None, *, method: str = "auto") -> jax.Array:
    """Compute the 11 basis responses ``[..., 11, H, W]``.

    Replaces the 11 sepFilter2D calls of SteerableFiltersG4::setup
    (cvsteer/SteerableFiltersG4.cpp:69-81) with one batched bank conv.
    ``method``: 'xla', 'pallas', or 'auto' (pallas on TPU).
    """
    if bank is None:
        bank = g4_bank()
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "xla"
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


def steering_coefficients(theta, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Interpolation weights (ka[5], kb[6]) for G4/H4 at orientation theta.

    Binomial trig weights, parity with SteerableFiltersG4.cpp:92-122:
      G4: (c^4, -4 c^3 s, 6 c^2 s^2, -4 c s^3, s^4)
      H4: (c^5, -5 c^4 s, 10 c^3 s^2, -10 c^2 s^3, 5 c s^4, -s^5)
    """
    theta = jnp.asarray(theta, dtype=dtype)
    c, s = jnp.cos(theta), jnp.sin(theta)
    c2, s2 = c * c, s * s
    c3, s3 = c2 * c, s2 * s
    c4, s4 = c3 * c, s3 * s
    c5, s5 = c4 * c, s4 * s
    ga = (c4, -4.0 * c3 * s, 6.0 * c2 * s2, -4.0 * c * s3, s4)
    ha = (c5, -5.0 * c4 * s, 10.0 * c3 * s2, -10.0 * c2 * s3, 5.0 * c * s4, -s5)
    return ga, ha


def steer(basis: jax.Array, theta) -> Tuple[jax.Array, jax.Array]:
    """Steer G4/H4 to scalar or per-pixel ``theta``; returns (g4, h4)."""
    theta = jnp.asarray(theta, dtype=basis.dtype)
    ga, ha = steering_coefficients(theta, dtype=basis.dtype)
    g4 = sum(ga[i] * basis[..., G4A + i, :, :] for i in range(5))
    h4 = sum(ha[i] * basis[..., H4A + i, :, :] for i in range(6))
    return g4, h4


def magnitude_phase(g4: jax.Array, h4: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quadrature magnitude/phase for the 4th-order pair.

    The reference's computeMagnitudeAndPhase is an empty stub
    (SteerableFiltersG4.cpp:88-90); this is the proper implementation with
    the same semantics as the G2 version (phase in (-pi, pi], NaNs -> 0)."""
    magnitude = jnp.hypot(g4, h4)
    phase = jnp.nan_to_num(jnp.arctan2(h4, g4))
    return magnitude, phase


_NUM_ANGLES = 16  # exact DFT for harmonics up to 2*7 theta; E4 needs up to 2*5.


def energy_harmonics(basis: jax.Array, num_harmonics: int = 2):
    """Fourier expansion of E(theta) = G4(theta)^2 + H4(theta)^2.

    E is pi-periodic (even filter order squares away the sign), i.e.
    E(theta) = a0 + sum_m [a_m cos(2m theta) + b_m sin(2m theta)], m<=5.
    Uniform sampling at N=16 angles over [0, pi) recovers the coefficients
    exactly (trig-polynomial quadrature). Returns (a0, [a_m], [b_m]) with
    m = 1..num_harmonics.

    This fills reference gap C20: the analog of the G2 c1/c2/c3 table
    (SteerableFiltersG2.cpp:93-95) for the 4th-order pair, derived from the
    steering identity rather than a hand-expanded product table.
    """
    thetas = np.arange(_NUM_ANGLES, dtype=np.float64) * (math.pi / _NUM_ANGLES)
    # Sampled energies, stacked on a leading angle axis: [N, ..., H, W]
    energies = []
    for t in thetas:
        g4t, h4t = steer(basis, float(t))
        energies.append(g4t * g4t + h4t * h4t)
    e = jnp.stack(energies, axis=0)

    n = float(_NUM_ANGLES)
    a0 = jnp.sum(e, axis=0) / n
    a_ms, b_ms = [], []
    for m in range(1, num_harmonics + 1):
        cosw = jnp.asarray(np.cos(2.0 * m * thetas), dtype=e.dtype)
        sinw = jnp.asarray(np.sin(2.0 * m * thetas), dtype=e.dtype)
        shape = (_NUM_ANGLES,) + (1,) * (e.ndim - 1)
        a_ms.append(jnp.sum(e * cosw.reshape(shape), axis=0) * (2.0 / n))
        b_ms.append(jnp.sum(e * sinw.reshape(shape), axis=0) * (2.0 / n))
    return a0, a_ms, b_ms


import functools


@functools.lru_cache(maxsize=None)
def _energy_quadratic_tables(num_angles: int = _NUM_ANGLES):
    """Constant [11, 11] quadratic-form matrices (M1, M2, M3) with
    c_k = sum_ij Mk_ij b_i b_j.

    E(theta) = sum_ij u_i(theta) u_j(theta) b_i b_j with u = (ga, ha) and
    the G/H blocks kept separate (E = G4^2 + H4^2 has no cross terms); the
    DC/cos/sin-2theta Fourier projections of the weight products are exact
    trig-polynomial quadratures at 16 angles, folded into constants once —
    the closed-form analog of the hand-expanded G2 table
    (SteerableFiltersG2.cpp:93-95), ~1.6x cheaper than sampling E at 16
    angles per image and with no [16, ...] intermediate stack.
    """
    thetas = np.arange(num_angles, dtype=np.float64) * (math.pi / num_angles)
    U = np.zeros((num_angles, 11))
    for n, t in enumerate(thetas):
        c, s = math.cos(t), math.sin(t)
        U[n, :5] = [c**4, -4 * c**3 * s, 6 * c**2 * s**2, -4 * c * s**3, s**4]
        U[n, 5:] = [
            c**5, -5 * c**4 * s, 10 * c**3 * s**2,
            -10 * c**2 * s**3, 5 * c * s**4, -(s**5),
        ]
    P = np.einsum("ni,nj->nij", U, U)
    mask = np.zeros((11, 11))
    mask[:5, :5] = 1.0
    mask[5:, 5:] = 1.0
    P = P * mask
    n = float(num_angles)
    M1 = P.sum(0) / n
    M2 = np.einsum("n,nij->ij", np.cos(2.0 * thetas), P) * (2.0 / n)
    M3 = np.einsum("n,nij->ij", np.sin(2.0 * thetas), P) * (2.0 / n)
    return (
        M1.astype(np.float32),
        M2.astype(np.float32),
        M3.astype(np.float32),
    )


def _quad_form(M: np.ndarray, basis: jax.Array) -> jax.Array:
    """sum_ij M_ij b_i b_j per pixel: one channel-mix + one reduction."""
    t = jnp.einsum("ij,...jyx->...iyx", jnp.asarray(M), basis, precision=lax.Precision.HIGHEST)
    return jnp.sum(basis * t, axis=-3)


def energy_coefficients(basis: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(c1, c2, c3) — the DC and 2nd-harmonic coefficients of E(theta),
    matching the meaning of the G2 counterparts (gap-fill for C20).
    Closed-form quadratic tables; see _energy_quadratic_tables."""
    M1, M2, M3 = _energy_quadratic_tables()
    return _quad_form(M1, basis), _quad_form(M2, basis), _quad_form(M3, basis)


def dominant_orientation(c2: jax.Array, c3: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(theta, strength) from the 2nd harmonic — same convention as G2."""
    theta = 0.5 * jnp.arctan2(c3, c2)
    strength = jnp.hypot(c2, c3)
    return theta, strength


def oriented_energy(basis: jax.Array, theta) -> jax.Array:
    """Exact E(theta) = G4(theta)^2 + H4(theta)^2 at scalar or map theta."""
    g4t, h4t = steer(basis, theta)
    return g4t * g4t + h4t * h4t


class G4Maps(NamedTuple):
    g4: jax.Array
    h4: jax.Array
    energy: jax.Array
    magnitude: jax.Array
    phase: jax.Array
    theta: jax.Array
    strength: jax.Array


def steerable_pipeline_g4(
    image: jax.Array, bank: Optional[G4Bank] = None, *, method: str = "auto"
) -> G4Maps:
    """Full G4 analysis: basis -> orientation -> steered quadrature maps."""
    basis = g4_basis(image, bank, method=method)
    c1, c2, c3 = energy_coefficients(basis)
    theta, strength = dominant_orientation(c2, c3)
    g4v, h4v = steer(basis, theta)
    magnitude, phase = magnitude_phase(g4v, h4v)
    e = c1 + jnp.cos(2.0 * theta) * c2 + jnp.sin(2.0 * theta) * c3
    return G4Maps(
        g4=g4v, h4=h4v, energy=e, magnitude=magnitude, phase=phase,
        theta=theta, strength=strength,
    )
