#!/bin/sh
# Build the native host-ops library into the package.
set -e
cd "$(dirname "$0")"
OUT_DIR=../vjepa2_tpu/data/_native
mkdir -p "$OUT_DIR"
g++ -O3 -shared -fPIC -std=c++17 -pthread host_ops.cpp -o "$OUT_DIR/libhost_ops.so"
echo "built $OUT_DIR/libhost_ops.so"
