#!/bin/sh
# Build the native evaluation kernels -> _evalcore.so (ctypes C ABI).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o _evalcore.so evalcore.cpp
echo "built $(pwd)/_evalcore.so"
