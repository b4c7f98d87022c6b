#!/bin/bash
# Build the native C++ kernels into shared libraries consumed via ctypes.
set -euo pipefail
cd "$(dirname "$0")/../native"
g++ -O3 -march=native -fPIC -shared -std=c++17 chips.cpp -o libsniper_chips.so
echo "built native/libsniper_chips.so"
