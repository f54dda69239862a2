"""CPU oracle for parity testing: the reference pipeline re-expressed through
OpenCV's own primitives (cv2.sepFilter2D / cartToPolar / normalize), exactly
as `fa::SteerableFiltersG2` drives them (cvsteer/SteerableFiltersG2.cpp).

This gives bit-faithful reference outputs (including OpenCV's fast ~0.3deg
atan) to validate every stage of the JAX implementation against, without
running the C++ library. Test-only code.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from cvsteer_tpu.filters.taps import g2h2_bank, g4h4_bank


def _wrap(angle: np.ndarray) -> np.ndarray:
    # [0, 2pi) -> (-pi, pi]  (cvsteer/SteerableFilters.cpp:46-51)
    out = angle.copy()
    out[angle > math.pi] = angle[angle > math.pi] - 2.0 * math.pi
    return out


def g2_oracle(image_f32: np.ndarray, width: int = 4, spacing: float = 0.67) -> dict:
    """Run the full reference G2 pipeline via OpenCV; returns all intermediates."""
    bank = g2h2_bank(width, spacing)
    img = image_f32.astype(np.float32)

    basis = []
    for k in range(bank.num_filters):
        kx = bank.xtaps[k].reshape(1, -1)
        ky = bank.ytaps[k].reshape(-1, 1)
        basis.append(cv2.sepFilter2D(img, cv2.CV_32F, kx, ky))
    g2a, g2b, g2c, h2a, h2b, h2c, h2d = basis

    c1 = (
        0.5 * g2b * g2b + 0.25 * g2a * g2c + 0.375 * (g2a * g2a + g2c * g2c)
        + 0.3125 * (h2a * h2a + h2d * h2d) + 0.5625 * (h2b * h2b + h2c * h2c)
        + 0.375 * (h2a * h2c + h2b * h2d)
    )
    c2 = (
        0.5 * (g2a * g2a - g2c * g2c) + 0.46875 * (h2a * h2a - h2d * h2d)
        + 0.28125 * (h2b * h2b - h2c * h2c) + 0.1875 * (h2a * h2c - h2b * h2d)
    )
    c3 = (
        -(g2a * g2b) - g2b * g2c - 0.9375 * (h2c * h2d + h2a * h2b)
        - 1.6875 * h2b * h2c - 0.1875 * h2a * h2d
    )

    strength, theta = cv2.cartToPolar(c2, c3)
    theta = _wrap(theta) * 0.5

    ct, st = np.cos(theta), np.sin(theta)
    g2v = ct * ct * g2a - 2.0 * ct * st * g2b + st * st * g2c
    h2v = (
        ct**3 * h2a - 3.0 * ct * ct * st * h2b + 3.0 * ct * st * st * h2c - st**3 * h2d
    )

    magnitude, phase = cv2.cartToPolar(g2v, h2v)
    phase = _wrap(phase)
    phase = np.nan_to_num(phase)

    e = c1 + np.cos(2.0 * theta) * c2 + np.sin(2.0 * theta) * c3

    def weights(ph, phi, signum):
        err = np.abs(ph - phi) if signum else np.abs(np.abs(ph) - abs(phi))
        err = np.minimum(err, 2.0 * math.pi - err)
        lam = np.cos(err) ** 2
        lam[np.abs(err) > math.pi / 2] = 0.0
        return lam.astype(np.float32)

    edges = magnitude * weights(phase, math.pi / 2, False)
    dark = magnitude * weights(phase, 0.0, True)
    bright = magnitude * weights(phase, math.pi, True)

    return dict(
        basis=np.stack(basis), c1=c1, c2=c2, c3=c3, theta=theta, strength=strength,
        g2=g2v, h2=h2v, magnitude=magnitude, phase=phase, energy=e,
        edges=edges, lines_dark=dark, lines_bright=bright,
    )


def g4_basis_oracle(image_f32: np.ndarray, width: int = 6, spacing: float = 0.5) -> np.ndarray:
    bank = g4h4_bank(width, spacing)
    img = image_f32.astype(np.float32)
    return np.stack(
        [
            cv2.sepFilter2D(img, cv2.CV_32F, bank.xtaps[k].reshape(1, -1), bank.ytaps[k].reshape(-1, 1))
            for k in range(bank.num_filters)
        ]
    )


def normalize_u8(x: np.ndarray) -> np.ndarray:
    out = np.zeros(x.shape, np.uint8)
    return cv2.normalize(x, out, 0, 255, cv2.NORM_MINMAX, cv2.CV_8U)


def recode_jpeg(img_u8: np.ndarray) -> np.ndarray:
    """The reference test's JPEG recode trick (test/test.cpp:58-69)."""
    ok, buf = cv2.imencode(".jpg", img_u8)
    assert ok
    return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
