"""ctypes bindings for the native C++ codec (io/native/codec.cpp).

Loads ``libcvsteer_codec.so`` (auto-building it with make on first use if
the toolchain is present). ctypes foreign calls release the GIL, so the
CLI's host decode thread pool gets true parallel decode — the TPU-native
equivalent of cv::parallel_for_'s image loop (example/steer.cpp:169).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_DIR, "libcvsteer_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.cvsteer_decode_gray.argtypes = [u8p, ctypes.c_size_t, u8p, ip, ip]
        lib.cvsteer_decode_gray.restype = ctypes.c_int
        lib.cvsteer_read_gray.argtypes = [ctypes.c_char_p, u8p, ip, ip]
        lib.cvsteer_read_gray.restype = ctypes.c_int
        lib.cvsteer_write_png_gray.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.cvsteer_write_png_gray.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def imdecode_gray(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes to a uint8 [H, W] array; None on failure."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.cvsteer_decode_gray(src, len(data), None, ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value), np.uint8)
    dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if lib.cvsteer_decode_gray(src, len(data), dst, ctypes.byref(w), ctypes.byref(h)):
        return None
    return out


def imread_gray(path: str) -> Optional[np.ndarray]:
    """Read a JPEG/PNG file as uint8 grayscale; None on failure.

    Reads the bytes once and decodes from memory so both the size probe and
    the fill decode the *same* data — re-reading the path twice would let a
    concurrently rewritten file overflow the probe-sized buffer (TOCTOU)."""
    if _load() is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return imdecode_gray(data)


def imwrite_png_gray(path: str, img: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    src = img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return lib.cvsteer_write_png_gray(path.encode(), src, w, h) == 0
