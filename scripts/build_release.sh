#!/bin/sh
# One-command release build — the analogue of the reference's
# build_wheel.sh + docker/Dockerfile.linux release path
# (/root/reference/build_wheel.sh, /root/reference/docker/Dockerfile.linux:1-45).
#
# Produces, under dist/:
#   polychase_tpu-<ver>-py3-none-any.whl   installable wheel (engine + CLI
#                                          entry points + native BVH source;
#                                          the prebuilt _bvh.so rides along
#                                          when present, and the package
#                                          rebuilds it on first import when
#                                          the shipped binary doesn't match)
#   polychase_blender_addon.zip            Blender 4.2 extension zip
#
# The reference ships manylinux wheels vendored inside the addon zip; here
# the wheel is pure-Python + a self-building C++ helper, so one artifact
# works on any host with a toolchain and the zip stays Blender-installable.
set -e
cd "$(dirname "$0")/.."

# 1. Native BVH (best-effort: the wheel also self-builds on first import)
if command -v g++ >/dev/null 2>&1; then
    sh scripts/build_native.sh
fi

# 2. Wheel (no build isolation: no network in CI images)
rm -rf dist build
python -m build --wheel --no-isolation --outdir dist .

# 3. Blender extension zip
python scripts/package_addon.py dist/polychase_blender_addon.zip

echo "release artifacts:"
ls -l dist/
