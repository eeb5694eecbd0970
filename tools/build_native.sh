#!/bin/bash
# Build the native host-IO library (csrc/ -> hipad_tpu/data/libhipad_io.so).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    "$ROOT/csrc/image_ops.cpp" -o "$ROOT/hipad_tpu/data/libhipad_io.so"
echo "built $ROOT/hipad_tpu/data/libhipad_io.so"
