#!/bin/sh
# Build the native runtime library. Requires g++ (baked into the image).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    pose_graph.cpp io.cpp \
    -o libmola_native.so
echo "built $(pwd)/libmola_native.so"
