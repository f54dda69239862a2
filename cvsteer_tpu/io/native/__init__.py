# Package marker so the native codec shared library built by setup.py
# (libcvsteer_codec.so) has an installable home; the library itself is
# loaded via ctypes by cvsteer_tpu.io.native_codec, never imported.
