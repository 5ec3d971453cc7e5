#!/bin/bash
# Build the native host IO library into the package tree.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="$HERE/../iridium_tpu/_native"
mkdir -p "$OUT"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o "$OUT/libhostio.so" "$HERE/hostio.cpp"
echo "built $OUT/libhostio.so"
