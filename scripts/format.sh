#!/usr/bin/env bash
# Formatting for the native sources (the bin/cvsteer-format.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
if command -v clang-format >/dev/null 2>&1; then
    find cvsteer_tpu/io/native -name '*.cpp' -o -name '*.h' | xargs -r clang-format -i
    echo "native sources formatted"
else
    echo "clang-format not found; skipping" >&2
fi
