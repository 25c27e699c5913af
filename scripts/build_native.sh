#!/bin/sh
# Build the native BVH ray caster in place (the package also self-builds
# on first import when g++ is available; see polychase_tpu/native/__init__.py).
set -e
cd "$(dirname "$0")/../polychase_tpu/native"
g++ -O3 -march=native -shared -fPIC -std=c++17 bvh.cc -o _bvh.so
echo "built polychase_tpu/native/_bvh.so"
