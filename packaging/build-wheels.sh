#!/bin/bash
# Manylinux wheel build for vosk_tpu — the analogue of the reference's
# travis/build-wheels.sh (runs inside a manylinux docker image the same
# way; see also travis/build-wheels-dockcross.sh for cross-arch builds).
#
# STATUS: authored but UNTESTED IN THIS IMAGE — no docker / no
# manylinux toolchain available here (zero-egress build environment).
# The script is the documented, reviewable recipe for the day a release
# runner exists.
#
# Usage (on a host with docker):
#   docker run --rm -v $(pwd)/..:/io quay.io/pypa/manylinux2014_x86_64 \
#       /io/packaging/build-wheels.sh
set -e -x

REPO=${VOSK_TPU_SOURCE:-/io}
OUT=${WHEELHOUSE:-/io/wheelhouse}
mkdir -p "$OUT"

# 1. native core: libvosk_tpu.so (embedded-CPython C ABI bridge) + the
#    pure-C++ lattice library.  Only needs a C++17 toolchain + python dev
#    headers (no Kaldi/OpenFST — the engine is the vosk_tpu package).
make -C "$REPO/core" clean all

# 2. wheel: pyproject-based build; ships the python package plus the
#    shared objects under vosk_tpu/lib/.
mkdir -p "$REPO/vosk_tpu/lib"
cp "$REPO"/core/*.so "$REPO/vosk_tpu/lib/"
for PYBIN in /opt/python/cp3{9,10,11,12}*/bin; do
    [ -d "$PYBIN" ] || continue
    "$PYBIN/pip" wheel "$REPO" --no-deps -w /tmp/wheelhouse
done

# 3. manylinux repair (vendors the libstdc++ symbols the .so needs)
for whl in /tmp/wheelhouse/vosk_tpu-*.whl; do
    auditwheel repair "$whl" -w "$OUT" || cp "$whl" "$OUT"
done
ls -la "$OUT"
