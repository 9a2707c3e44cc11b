#!/bin/sh
# Build the native host-side helpers (C++ -> shared library, ctypes-loaded).
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -shared -fPIC -std=c++17 -o native/build/libmatting_oracle.so \
    native/matting_oracle.cpp
echo "built native/build/libmatting_oracle.so"
