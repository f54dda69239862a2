"""Native C++ codec (libjpeg/libpng via ctypes) vs the OpenCV oracle."""

import pathlib

import numpy as np
import pytest

from cvsteer_tpu.io import native_codec
from cvsteer_tpu.io.imageio import imdecode_gray_f32, imread_gray_f32, imwrite_u8

ASSETS = pathlib.Path(__file__).parent / "assets"

pytestmark = pytest.mark.skipif(
    not native_codec.available(), reason="native codec not built"
)


def test_jpeg_decode_matches_opencv():
    import cv2

    data = (ASSETS / "fish.jpg").read_bytes()
    ours = native_codec.imdecode_gray(data)
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert ours is not None and ours.shape == ref.shape == (185, 256)
    # same libjpeg lineage: allow  off-by-one from different IDCT paths
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    assert (ours != ref).mean() < 0.02


def test_file_read_matches_decode():
    data = (ASSETS / "fish.jpg").read_bytes()
    a = native_codec.imdecode_gray(data)
    b = native_codec.imread_gray(str(ASSETS / "fish.jpg"))
    np.testing.assert_array_equal(a, b)


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    assert native_codec.imwrite_png_gray(path, img)
    back = native_codec.imread_gray(path)
    np.testing.assert_array_equal(back, img)
    # and cv2 agrees the file is a valid gray PNG
    import cv2

    ref = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(ref, img)


def test_imageio_uses_native_path(tmp_path, rng):
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    p = str(tmp_path / "y.png")
    imwrite_u8(p, img)
    back = imread_gray_f32(p)
    np.testing.assert_array_equal(back.astype(np.uint8), img)
    data = (ASSETS / "fish.jpg").read_bytes()
    assert imdecode_gray_f32(data).shape == (185, 256)


def test_garbage_rejected():
    assert native_codec.imdecode_gray(b"not an image at all") is None
