#!/bin/sh
# Build the unmodified reference encoder/decoder apps for baseline
# measurement (BASELINE.md) and golden end-to-end parity tests.
#
# The reference's CMake build fails under gcc 12 only in libs/thread.cpp
# (move-only IJThread in an initializer-list vector, thread.cpp:82); the
# apps never use that machinery, so we link thread_shim.cpp in its place
# and compile every other reference TU unmodified.
#
# Usage: build_reference_apps.sh [OUTDIR]   (default: /tmp/refbin)
set -e
REF=${SVC_REFERENCE_DIR:-/root/reference}
OUT=${1:-/tmp/refbin}
HERE=$(dirname "$(readlink -f "$0")")
mkdir -p "$OUT"

CXXFLAGS="-O3 -std=c++17 -msse2 -DSVC_MOTION_SSE2 -I$REF/libs -I/usr/include/opencv4"

g++ $CXXFLAGS \
  "$REF/apps/encoder.cpp" "$REF/libs/encoder.cpp" "$REF/libs/motion.cpp" \
  "$REF/libs/cli.cpp" "$HERE/thread_shim.cpp" \
  -lopencv_core -lopencv_imgproc -lopencv_videoio -o "$OUT/ref_encoder"

# decoder: CV_INTER_LINEAR is the OpenCV-3 macro (= cv::INTER_LINEAR = 1),
# removed from OpenCV 4 headers (reference targets OpenCV 3.4).
g++ $CXXFLAGS -DCV_INTER_LINEAR=1 \
  "$REF/apps/decoder.cpp" "$REF/libs/decoder.cpp" \
  "$REF/libs/cli.cpp" "$HERE/thread_shim.cpp" \
  -lopencv_core -lopencv_imgproc -lopencv_highgui -o "$OUT/ref_decoder"

echo "built: $OUT/ref_encoder $OUT/ref_decoder"
