#!/bin/sh
# Build the native runtime -> rakau_tpu/_native.so (see rakau_tpu/native.py,
# which also invokes this automatically when the .so is missing/stale).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 \
    rakau_native.cpp -o ../rakau_tpu/_native.so
echo "built rakau_tpu/_native.so"
