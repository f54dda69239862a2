"""G4/H4 parity (basis + steering vs OpenCV oracle) and gap-fill sanity."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from cvsteer_tpu.filters import g4 as fg4

from oracle import g4_basis_oracle


def test_g4_basis_parity(fish_gray):
    ref = g4_basis_oracle(fish_gray)
    basis = fg4.g4_basis(jnp.asarray(fish_gray), method="xla")
    assert basis.shape == (11, 185, 256)
    np.testing.assert_allclose(np.asarray(basis), ref, atol=5e-2, rtol=1e-4)


def test_g4_steering_binomial_weights():
    ga, ha = fg4.steering_coefficients(0.0)
    assert [float(v) for v in ga] == pytest.approx([1, 0, 0, 0, 0])
    assert [float(v) for v in ha] == pytest.approx([1, 0, 0, 0, 0, 0])
    # at theta=pi/2 only the last basis contributes (sin^4 / -sin^5)
    ga, ha = fg4.steering_coefficients(math.pi / 2)
    assert float(ga[-1]) == pytest.approx(1.0, abs=1e-6)
    assert float(ha[-1]) == pytest.approx(-1.0, abs=1e-6)


def test_g4_steer_consistency(fish_gray):
    basis = fg4.g4_basis(jnp.asarray(fish_gray), method="xla")
    # steering at theta=0 returns (g4a, h4a) exactly
    g4v, h4v = fg4.steer(basis, 0.0)
    np.testing.assert_allclose(np.asarray(g4v), np.asarray(basis[fg4.G4A]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h4v), np.asarray(basis[fg4.H4A]), atol=1e-4)
    # scalar and map steering agree
    gs, hs = fg4.steer(basis, 0.8)
    gm, hm = fg4.steer(basis, jnp.full((185, 256), 0.8))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gm), atol=1e-3)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hm), atol=1e-3)


def test_g4_energy_harmonics_exactness(fish_gray):
    """The DFT-recovered harmonic expansion must reproduce E(theta) exactly
    at arbitrary angles (E is a trig polynomial — quadrature is exact)."""
    basis = fg4.g4_basis(jnp.asarray(fish_gray[:64, :64]), method="xla")
    a0, a_ms, b_ms = fg4.energy_harmonics(basis, num_harmonics=5)
    for theta in [0.1, 0.9, 2.2]:
        e_exact = np.asarray(fg4.oriented_energy(basis, theta))
        e_series = np.asarray(a0).copy()
        for m in range(1, 6):
            e_series = (
                e_series
                + np.asarray(a_ms[m - 1]) * math.cos(2 * m * theta)
                + np.asarray(b_ms[m - 1]) * math.sin(2 * m * theta)
            )
        scale = np.abs(e_exact).mean() + 1e-6
        np.testing.assert_allclose(e_series / scale, e_exact / scale, atol=5e-4)


def test_g4_dominant_orientation_detects_stripes():
    """Gap-fill C20: orientation from the G4 energy's 2nd harmonic should
    recover the orientation of a synthetic oriented pattern."""
    h, w = 96, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # vertical stripes (variation along x): paper convention theta=0 vertical
    img = 128 + 100 * np.sin(2 * math.pi * xx / 8.0)
    maps = fg4.steerable_pipeline_g4(jnp.asarray(img, dtype=jnp.float32))
    inner = np.asarray(maps.theta)[20:-20, 20:-20]
    # dominant angle should be ~0 (mod pi)
    dev = np.minimum(np.abs(inner), math.pi - np.abs(inner))
    assert np.median(dev) < 0.05


def test_g4_magnitude_phase_quadrature():
    """The reference's computeMagnitudeAndPhase for G4 is an empty stub
    (SteerableFiltersG4.cpp:88-90); ours must behave like the G2 version."""
    g4v = jnp.asarray(np.array([[3.0, 0.0], [0.0, -1.0]], np.float32))
    h4v = jnp.asarray(np.array([[4.0, 2.0], [0.0, 0.0]], np.float32))
    mag, phase = fg4.magnitude_phase(g4v, h4v)
    assert float(mag[0, 0]) == pytest.approx(5.0)
    assert float(phase[0, 0]) == pytest.approx(math.atan2(4, 3))
    assert float(phase[0, 1]) == pytest.approx(math.pi / 2)
    assert float(phase[1, 1]) == pytest.approx(math.pi)
    assert float(phase[1, 0]) == 0.0  # atan2(0,0) -> 0, NaN-free


def test_quadratic_energy_matches_angular_sampling(fish_gray):
    """Closed-form c1/c2/c3 == the exact angular-DFT recovery."""
    import jax.numpy as jnp
    from cvsteer_tpu.filters.g4 import (
        energy_coefficients,
        energy_harmonics,
        g4_basis,
    )

    basis = g4_basis(jnp.asarray(fish_gray[40:104, 40:168]))
    c1, c2, c3 = energy_coefficients(basis)
    a0, a_ms, b_ms = energy_harmonics(basis, num_harmonics=1)
    scale = float(jnp.abs(a0).max()) + 1e-9
    assert float(jnp.abs(c1 - a0).max()) / scale < 1e-5
    assert float(jnp.abs(c2 - a_ms[0]).max()) / scale < 1e-5
    assert float(jnp.abs(c3 - b_ms[0]).max()) / scale < 1e-5
