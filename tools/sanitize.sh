#!/usr/bin/env bash
# Sanitizer pass over the native (C++) layer: build libnfclab_native with
# ASan/TSan and run the native-heavy test files against it via the
# NFCLAB_NATIVE_LIB override (nfclab/native/binding.py).
#
# The reference configures no sanitizers at all (SURVEY §5); this makes the
# audit reproducible here.  Round-3 result: ASan (golden decode 18/18 +
# usb/streaming/sdr tests) and TSan (usb/sdr/logic-capture threaded tests)
# both clean, zero reports.
#
# Usage: tools/sanitize.sh [asan|tsan]   (default: both)

set -euo pipefail
cd "$(dirname "$0")/.."

BUILD=/tmp/nfclab_sanitize
mkdir -p "$BUILD"
ASAN_RT=$(gcc -print-file-name=libasan.so)
TSAN_RT=$(gcc -print-file-name=libtsan.so)

run_asan() {
    echo "== ASan build =="
    g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -std=c++17 \
        -shared -fPIC -fno-fast-math -ffp-contract=off \
        -o "$BUILD/libnfclab_native_asan.so" nfclab/native/src/*.cpp -ldl
    echo "== ASan: golden decode =="
    LD_PRELOAD="$ASAN_RT" NFCLAB_NATIVE_LIB="$BUILD/libnfclab_native_asan.so" \
        ASAN_OPTIONS="detect_leaks=0:log_path=$BUILD/asan" \
        python -m nfclab.apps.decode_cli test /root/reference/wav/
    echo "== ASan: native-path tests =="
    LD_PRELOAD="$ASAN_RT" NFCLAB_NATIVE_LIB="$BUILD/libnfclab_native_asan.so" \
        ASAN_OPTIONS="detect_leaks=0:log_path=$BUILD/asan" \
        python -m pytest tests/test_usb_logic.py tests/test_sdr_bridge.py \
            tests/test_streaming.py tests/test_windowed_streaming.py \
            tests/test_logic_capture.py -q
    if ls "$BUILD"/asan* >/dev/null 2>&1; then
        echo "ASAN REPORTS FOUND:"; cat "$BUILD"/asan*; exit 1
    fi
    echo "ASan clean."
}

run_tsan() {
    echo "== TSan build =="
    g++ -O1 -g -fsanitize=thread -fno-omit-frame-pointer -std=c++17 \
        -shared -fPIC -fno-fast-math -ffp-contract=off \
        -o "$BUILD/libnfclab_native_tsan.so" nfclab/native/src/*.cpp -ldl
    echo "== TSan: threaded native tests =="
    LD_PRELOAD="$TSAN_RT" NFCLAB_NATIVE_LIB="$BUILD/libnfclab_native_tsan.so" \
        TSAN_OPTIONS="log_path=$BUILD/tsan:exitcode=0" \
        python -m pytest tests/test_usb_logic.py tests/test_sdr_bridge.py \
            tests/test_logic_capture.py -q
    if ls "$BUILD"/tsan* >/dev/null 2>&1; then
        echo "TSAN REPORTS FOUND:"; cat "$BUILD"/tsan*; exit 1
    fi
    echo "TSan clean."
}

case "${1:-both}" in
    asan) run_asan ;;
    tsan) run_tsan ;;
    both) run_asan; run_tsan ;;
    *) echo "usage: $0 [asan|tsan]"; exit 2 ;;
esac
