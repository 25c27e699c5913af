#!/bin/sh
# Build the native BVH ray caster in place (the package also self-builds
# on first import when g++ is available; see polychase_tpu/native/__init__.py).
#
# PORTABLE=1 targets the x86-64-v2 ISA baseline instead of -march=native —
# used by the containerized release build (docker/Dockerfile.linux) so the
# shipped binary runs on any reasonably modern x86-64 host.
set -e
cd "$(dirname "$0")/../polychase_tpu/native"
if [ "${PORTABLE:-0}" = "1" ]; then
    ARCH="-march=x86-64-v2"
else
    ARCH="-march=native"
fi
g++ -O3 $ARCH -shared -fPIC -std=c++17 bvh.cc -o _bvh.so
echo "built polychase_tpu/native/_bvh.so ($ARCH)"
