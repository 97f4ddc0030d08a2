#!/bin/sh
# Build the native host-side kernels into native/libdsknn.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libdsknn.so knn.cpp
echo "built $(pwd)/libdsknn.so"
