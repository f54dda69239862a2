"""Build hook: compile the native codec at install time.

The reference installs a complete package including its native library
(cvsteer/CMakeLists.txt:43-61); the equivalent here is building
``libcvsteer_codec.so`` (grayscale JPEG/PNG codec on libjpeg/libpng,
io/native/codec.cpp) as part of ``pip install``. It is a plain C-ABI
shared library loaded via ctypes (cvsteer_tpu/io/native_codec.py), not a
CPython extension module, so the custom build_ext strips the ABI suffix.
The Extension is marked optional: on systems without libjpeg/libpng the
install still succeeds and the package falls back to cv2/PIL decode at
runtime (io/imageio.py).
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CodecBuild(build_ext):
    def get_ext_filename(self, fullname):
        # plain .so for ctypes loading — no CPython ABI tag
        return os.path.join(*fullname.split(".")) + ".so"


setup(
    ext_modules=[
        Extension(
            "cvsteer_tpu.io.native.libcvsteer_codec",
            sources=["cvsteer_tpu/io/native/codec.cpp"],
            libraries=["jpeg", "png", "z"],
            extra_compile_args=["-O2", "-std=c++17", "-Wall"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": CodecBuild},
)
