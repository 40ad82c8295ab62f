#!/bin/sh
# Build the native runtime components into the package tree.
set -e
cd "$(dirname "$0")/.."
g++ -O2 -fPIC -shared -Wall native/image_io.cpp -lz \
    -o raytracingpbr_tpu/io/libimage_io.so
echo "built raytracingpbr_tpu/io/libimage_io.so"
