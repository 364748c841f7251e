#!/bin/bash
# Build the native entropy codec shared library (myyuv_tpu/native/entropy.cpp).
set -e
SRC_DIR="$(cd "$(dirname "$0")/.." && pwd)/myyuv_tpu/native"
OUT="${1:-$SRC_DIR/libmyyuv_entropy.so}"
g++ -O3 -std=c++17 -shared -fPIC -march=native -ffp-contract=off -pthread \
  "$SRC_DIR/entropy.cpp" -o "$OUT"
echo "built $OUT"
