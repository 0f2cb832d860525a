#!/bin/sh
# Build and run the ThreadSanitizer harness over the native runtime's
# threaded paths (see tools/tsan_check.cpp).  Any TSAN report fails the
# run (halt_on_error); results are recorded in docs/DESIGN.md.
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -fsanitize=thread -std=c++17 \
    tools/tsan_check.cpp libaec_tpu/native/aectpu_native.cpp \
    libaec_tpu/native/encoder.cpp libaec_tpu/native/libaec_abi.cpp \
    -o /tmp/tsan_check
TSAN_OPTIONS="halt_on_error=1" /tmp/tsan_check "$@"
