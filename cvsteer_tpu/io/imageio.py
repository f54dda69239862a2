"""Image IO: grayscale read and 8-bit PNG write.

Replaces the reference's OpenCV highgui usage (cv::imread at
example/steer.cpp:73, cv::imwrite at :106-122, cv::imdecode at
test/test.cpp:53-56). Codec resolution order:

1. the native C++ codec library (cvsteer_tpu/io/native, libpng/libjpeg via
   ctypes) when built — the production path;
2. OpenCV / PIL when present (dev convenience).

All reads return float32 grayscale in [0, 255] (the reference feeds 8-bit
gray into cv::Mat1f, so values are integral 0..255).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _native():
    try:
        from cvsteer_tpu.io import native_codec

        return native_codec if native_codec.available() else None
    except Exception:
        return None


def imread_gray_f32(path: str) -> Optional[np.ndarray]:
    """Read an image as float32 grayscale (0..255); None if unreadable."""
    nat = _native()
    if nat is not None:
        img = nat.imread_gray(path)
        if img is not None:
            return img.astype(np.float32)

    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img.astype(np.float32)
    except ImportError:
        pass

    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("L"), dtype=np.float32)
    except Exception:
        return None
    return None


def imdecode_gray_f32(data: bytes) -> Optional[np.ndarray]:
    """Decode an in-memory compressed image to float32 grayscale."""
    nat = _native()
    if nat is not None:
        img = nat.imdecode_gray(data)
        if img is not None:
            return img.astype(np.float32)
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img.astype(np.float32)
    except ImportError:
        pass
    try:
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(data)) as im:
            return np.asarray(im.convert("L"), dtype=np.float32)
    except Exception:
        return None
    return None


def imwrite_u8(path: str, img: np.ndarray) -> None:
    """Write an 8-bit grayscale image (PNG by extension)."""
    img = np.asarray(img, dtype=np.uint8)
    nat = _native()
    if nat is not None and path.endswith(".png"):
        if nat.imwrite_png_gray(path, img):
            return
    try:
        import cv2

        if cv2.imwrite(path, img):
            return
        raise IOError(f"cv2.imwrite failed for {path}")
    except ImportError:
        from PIL import Image

        Image.fromarray(img, mode="L").save(path)
