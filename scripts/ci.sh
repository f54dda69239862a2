#!/usr/bin/env bash
# CI for cvsteer_tpu — the TPU-native equivalent of the reference's CI
# matrix (.travis.yml / appveyor.yml): build the native codec, run the full
# suite on an emulated 8-device CPU mesh, then a NaN-strict smoke leg (the
# device-code analog of the sanitizer builds).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native codec build (install path) =="
python setup.py build_ext --inplace

echo "== native codec sanitizer leg (ASan + LSan, reference .travis.yml:48-51) =="
# rebuild the codec with AddressSanitizer and run its tests with the asan
# runtime preloaded into python (the codec is ctypes-loaded, not linked)
make -C cvsteer_tpu/io/native clean
make -C cvsteer_tpu/io/native CXXFLAGS="-O1 -g -fPIC -std=c++17 -fsanitize=address"
ASAN_LIB="$(g++ -print-file-name=libasan.so)"
LD_PRELOAD="$ASAN_LIB" ASAN_OPTIONS="detect_leaks=1" \
    LSAN_OPTIONS="suppressions=$PWD/scripts/lsan.supp:print_suppressions=0" \
    python -m pytest tests/test_native_codec.py -q
make -C cvsteer_tpu/io/native clean
make -C cvsteer_tpu/io/native

echo "== test suite (8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== NaN-strict smoke (jax_debug_nans) =="
JAX_DEBUG_NANS=1 python - <<'EOF'
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)
import numpy as np, jax.numpy as jnp
from cvsteer_tpu.filters.g2 import steerable_pipeline_g2
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (64, 96)), jnp.float32)
maps = steerable_pipeline_g2(img, method="xla")
jax.block_until_ready(maps)
print("nan-strict pipeline ok")
EOF

echo "== multichip dryrun =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'EOF'
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun ok")
EOF

if [ "${CVSTEER_CI_TPU:-0}" = "1" ]; then
    echo "== TPU leg: Pallas kernels under Mosaic + golden bar on the chip =="
    CVSTEER_TEST_TPU=1 python -m pytest tests/test_pallas_frontend.py tests/test_golden.py -q
fi

echo "CI OK"
