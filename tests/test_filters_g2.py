"""Stage-by-stage parity of the G2/H2 front-end vs the OpenCV oracle."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.filters.taps import g2h2_bank, sample_taps, g2_f1, g2_f3
from cvsteer_tpu.ops.sepconv import filter_bank_shifts, filter_bank_xla

from oracle import g2_oracle


def test_tap_sampling_grid():
    taps = sample_taps(4, 0.67, g2_f1)
    assert taps.shape == (9,)
    # center tap: 0.9213 * (2*0 - 1) * exp(0) = -0.9213
    assert taps[4] == pytest.approx(-0.9213, abs=1e-6)
    # symmetry of even tap, antisymmetry of odd tap
    assert np.allclose(taps, taps[::-1])
    odd = sample_taps(4, 0.67, g2_f3)
    assert np.allclose(odd, -odd[::-1])


def test_bank_shapes():
    bank = g2h2_bank()
    assert bank.xtaps.shape == (7, 9)
    assert bank.names == ("g2a", "g2b", "g2c", "h2a", "h2b", "h2c", "h2d")
    assert bank.radius == 4


@pytest.mark.parametrize("shape", [(185, 256), (64, 64), (33, 47)])
def test_sepconv_matches_opencv(rng, shape):
    import cv2

    img = rng.uniform(0, 255, size=shape).astype(np.float32)
    bank = g2h2_bank()
    ours = np.asarray(filter_bank_xla(jnp.asarray(img), bank.xtaps, bank.ytaps))
    ours_shifts = np.asarray(filter_bank_shifts(jnp.asarray(img), bank.xtaps, bank.ytaps))
    for k in range(7):
        ref = cv2.sepFilter2D(
            img, cv2.CV_32F, bank.xtaps[k].reshape(1, -1), bank.ytaps[k].reshape(-1, 1)
        )
        np.testing.assert_allclose(ours[k], ref, atol=2e-3, rtol=1e-5)
        np.testing.assert_allclose(ours_shifts[k], ref, atol=2e-3, rtol=1e-5)


def test_g2_stage_parity(fish_gray):
    ref = g2_oracle(fish_gray)
    img = jnp.asarray(fish_gray)
    bank = fg2.g2_bank()

    basis = fg2.g2_basis(img, bank, method="xla")
    np.testing.assert_allclose(np.asarray(basis), ref["basis"], atol=5e-2, rtol=1e-4)

    c1, c2, c3 = fg2.energy_coefficients(basis)
    # energy coeffs are quadratic in basis values (up to ~1e4 magnitude)
    np.testing.assert_allclose(np.asarray(c1), ref["c1"], atol=2.0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c2), ref["c2"], atol=2.0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c3), ref["c3"], atol=2.0, rtol=1e-3)

    theta, strength = fg2.dominant_orientation(c2, c3)
    # OpenCV's cartToPolar atan is accurate to ~0.3 deg; after halving ~0.0027 rad.
    # Exclude pixels where the 2nd harmonic is tiny (angle ill-defined).
    mask = ref["strength"] > 1e-1 * ref["strength"].mean()
    dtheta = np.abs(np.asarray(theta) - ref["theta"])
    dtheta = np.minimum(dtheta, math.pi - dtheta)  # theta is pi-periodic here
    assert np.quantile(dtheta[mask], 0.999) < 5e-3
    np.testing.assert_allclose(np.asarray(strength), ref["strength"], atol=2.0, rtol=1e-3)

    # Steering parity, decoupled from the atan difference: steer with the
    # oracle's own theta map. (At weak-orientation pixels OpenCV's fast atan
    # and exact arctan2 legitimately give different theta, so steered maps
    # there differ; the theta check above already covers angle accuracy.)
    g2o, h2o = fg2.steer(basis, jnp.asarray(ref["theta"]))
    np.testing.assert_allclose(np.asarray(g2o), ref["g2"], atol=0.05, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h2o), ref["h2"], atol=0.05, rtol=1e-4)

    g2v, h2v = fg2.steer(basis, theta)
    mag, phase = fg2.magnitude_phase(g2v, h2v)
    mag_o, _ = fg2.magnitude_phase(g2o, h2o)
    np.testing.assert_allclose(np.asarray(mag_o), ref["magnitude"], atol=0.05, rtol=1e-4)

    e = fg2.oriented_energy(c1, c2, c3, theta)
    np.testing.assert_allclose(np.asarray(e), ref["energy"], atol=4.0, rtol=1e-3)

    edges = fg2.find_edges(mag, phase)
    dark = fg2.find_dark_lines(mag, phase)
    bright = fg2.find_bright_lines(mag, phase)
    # phase-weighted maps: tolerance dominated by the atan accuracy difference
    for ours, name in [(edges, "edges"), (dark, "lines_dark"), (bright, "lines_bright")]:
        a, b = np.asarray(ours), ref[name]
        assert np.mean(np.abs(a - b)) < 0.05 * max(1.0, np.mean(np.abs(b)))


def test_scalar_steer_matches_map_steer(fish_gray):
    img = jnp.asarray(fish_gray)
    basis = fg2.g2_basis(img, method="xla")
    for theta in [0.0, 0.3, -1.2, math.pi / 2]:
        gs, hs = fg2.steer(basis, theta)
        gm, hm = fg2.steer(basis, jnp.full(img.shape, theta))
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gm), atol=1e-4)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(hm), atol=1e-4)


def test_steer_at_point(fish_gray):
    img = jnp.asarray(fish_gray)
    basis = fg2.g2_basis(img, method="xla")
    g2v, h2v = fg2.steer(basis, 0.7)
    gp, hp = fg2.steer_at(basis, 100, 120, 0.7)
    assert float(gp) == pytest.approx(float(g2v[100, 120]), abs=1e-4)
    assert float(hp) == pytest.approx(float(h2v[100, 120]), abs=1e-4)


def test_phase_weights_properties():
    phase = jnp.linspace(-math.pi, math.pi, 101)
    lam_edge = fg2.phase_weights(phase, math.pi / 2, signum=False)
    lam_dark = fg2.phase_weights(phase, 0.0, signum=True)
    lam_bright = fg2.phase_weights(phase, math.pi, signum=True)
    lam_edge, lam_dark, lam_bright = map(np.asarray, (lam_edge, lam_dark, lam_bright))
    assert (lam_edge >= 0).all() and (lam_edge <= 1).all()
    # dark-line weight peaks at phase 0, bright at +-pi, edges at +-pi/2
    assert lam_dark[50] == pytest.approx(1.0, abs=1e-6)
    assert lam_bright[0] == pytest.approx(1.0, abs=1e-5)
    assert lam_bright[100] == pytest.approx(1.0, abs=1e-5)
    idx_halfpi = 75  # phase = +pi/2
    assert lam_edge[idx_halfpi] == pytest.approx(1.0, abs=1e-4)
    assert lam_dark[idx_halfpi] == pytest.approx(0.0, abs=1e-6)


def test_batched_pipeline_vmaps(fish_gray):
    import jax

    img = jnp.asarray(fish_gray)
    batch = jnp.stack([img, img[::-1, :]])
    maps = jax.jit(lambda b: fg2.steerable_pipeline_g2(b, method="xla"))(batch)
    single = fg2.steerable_pipeline_g2(img, method="xla")
    np.testing.assert_allclose(
        np.asarray(maps.edges[0]), np.asarray(single.edges), atol=1e-2, rtol=1e-4
    )
    assert maps.edges.shape == (2, 185, 256)


def test_wrap_angle_matches_reference_convention():
    from cvsteer_tpu.filters.g2 import wrap_angle

    angles = jnp.asarray([0.0, 1.0, np.pi, np.pi + 0.1, 2 * np.pi - 0.01])
    out = np.asarray(wrap_angle(angles))
    # (-pi, pi]: values above pi wrap down by 2pi (SteerableFilters.cpp:46-51)
    np.testing.assert_allclose(
        out, [0.0, 1.0, np.pi, np.pi + 0.1 - 2 * np.pi, -0.01], atol=1e-6
    )


def test_analyze_at_matches_map_pipeline(fish_gray):
    from cvsteer_tpu.filters.g2 import (
        analyze_at,
        dominant_orientation,
        energy_coefficients,
        g2_basis,
        magnitude_phase,
        oriented_energy,
        steer,
    )

    basis = g2_basis(jnp.asarray(fish_gray), method="xla")
    c1, c2, c3 = energy_coefficients(basis)
    theta_map, _ = dominant_orientation(c2, c3)
    y, x = 80, 120
    th = float(theta_map[y, x])

    g2v, h2v, e, mag, ph = analyze_at(basis, y, x, th)
    g2m, h2m = steer(basis, th)
    magm, phm = magnitude_phase(g2m, h2m)
    em = oriented_energy(c1, c2, c3, th)
    assert abs(float(g2v) - float(g2m[y, x])) < 1e-4
    assert abs(float(h2v) - float(h2m[y, x])) < 1e-4
    assert abs(float(e) - float(em[y, x])) < 1e-2
    assert abs(float(mag) - float(magm[y, x])) < 1e-4
    assert abs(float(ph) - float(phm[y, x])) < 1e-5
