"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-device sharding code is
tested against XLA's host-platform device emulation instead
(SURVEY.md section 4d). Must set env vars before jax is imported anywhere.
"""

import os

# CVSTEER_TEST_TPU=1 runs the selected leg on the real chip (single device;
# only TPU-safe test files — see scripts/ci.sh): Pallas kernels then compile
# with Mosaic instead of the interpreter, catching real-hardware-only
# regressions (bf16 MXU quantization, DMA alignment).
_TPU_LEG = os.environ.get("CVSTEER_TEST_TPU") == "1"

if not _TPU_LEG:
    # Hard override: the container env pins JAX_PLATFORMS=axon (single real
    # TPU chip); the suite runs on an emulated 8-device CPU mesh instead.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon PJRT plugin ignores the env var once registered; the config update
# is authoritative and must happen before any backend is touched.
import jax  # noqa: E402

if not _TPU_LEG:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

ASSETS = pathlib.Path(__file__).parent / "assets"


@pytest.fixture(scope="session")
def fish_gray() -> np.ndarray:
    """The reference's embedded 256x185 grayscale test image (float32 0..255)."""
    import cv2

    img = cv2.imread(str(ASSETS / "fish.jpg"), cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape == (185, 256)
    return img.astype(np.float32)


@pytest.fixture(scope="session")
def goldens() -> dict:
    """The reference's golden 8-bit output maps (decoded from its JPEGs)."""
    import cv2

    out = {}
    for name, fn in [
        ("edges", "golden_edges.jpg"),
        ("lines_dark", "golden_lines_dark.jpg"),
        ("lines_bright", "golden_lines_bright.jpg"),
    ]:
        img = cv2.imread(str(ASSETS / fn), cv2.IMREAD_GRAYSCALE)
        assert img is not None
        out[name] = img
    return out


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
