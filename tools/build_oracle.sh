#!/bin/bash
# Build the reference myyuv_cli (CPU oracle for differential tests).
# Compiles the reference sources out-of-tree (reference is read-only); viewers
# (SDL3/OpenGL) are skipped. Single-threaded build (no OpenMP) for determinism
# per SURVEY.md §8 "Oracle reproducibility".
set -e
REF=${1:-/root/reference}
OUT=${2:-/root/repo/.oracle}
mkdir -p "$OUT"
if [ -x "$OUT/myyuv_cli" ]; then echo "oracle already built: $OUT/myyuv_cli"; exit 0; fi
g++ -O2 -std=c++17 -DNDEBUG -I "$REF/myyuv_lib" \
  "$REF/myyuv_lib/myyuv_bmp.cpp" \
  "$REF/myyuv_lib/myyuv_yuv.cpp" \
  "$REF/myyuv_lib/myyuv_DCT/DCT.cpp" \
  "$REF/myyuv_lib/myyuv_DCT/Huffman.cpp" \
  "$REF/myyuv_cli/main.cpp" \
  -o "$OUT/myyuv_cli"
echo "built $OUT/myyuv_cli"
