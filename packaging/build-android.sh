#!/bin/bash
# Android cross build of the vosk_tpu C ABI for the 4 standard ABIs —
# the analogue of the reference's android/lib/build-vosk.sh:37-135.
#
# STATUS: authored but UNTESTED IN THIS IMAGE — no Android NDK available
# (zero-egress build environment).  On-device inference uses the
# pure-C++ lattice/runtime pieces; the JAX compute path is not part of
# the Android artifact (server-side decoding over the websocket protocol,
# bindings/android/README).
set -e -x

: "${ANDROID_NDK_HOME:?set ANDROID_NDK_HOME to an r25+ NDK}"
OS_NAME=$(uname -s | tr 'A-Z' 'a-z')
TOOLCHAIN=$ANDROID_NDK_HOME/toolchains/llvm/prebuilt/${OS_NAME}-x86_64
OUT=${1:-$(pwd)/android-libs}

for arch in armeabi-v7a arm64-v8a x86_64 x86; do
    case $arch in
        armeabi-v7a) TARGET=armv7a-linux-androideabi21 ;;
        arm64-v8a)   TARGET=aarch64-linux-android21 ;;
        x86_64)      TARGET=x86_64-linux-android21 ;;
        x86)         TARGET=i686-linux-android21 ;;
    esac
    mkdir -p "$OUT/$arch"
    make -C "$(dirname "$0")/../core" clean core \
        CXX="$TOOLCHAIN/bin/${TARGET}-clang++" \
        AR="$TOOLCHAIN/bin/llvm-ar" \
        EXTRA_CXXFLAGS="-fPIC -static-libstdc++"
    cp "$(dirname "$0")/../core/libvosk_tpu_core.so" "$OUT/$arch/"
done
ls -laR "$OUT"
