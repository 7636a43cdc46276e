#!/bin/sh
# Build and run the native-runtime stress test under ThreadSanitizer
# (SURVEY.md §5.2). Usage: ./check_tsan.sh [path/to/test.jpg]
set -e
here="$(cd "$(dirname "$0")" && pwd)"
jpg="${1:-$here/../../tests/fixtures/test2.jpg}"
out="$here/build/stress_tsan"
mkdir -p "$here/build"
g++ -O1 -g -fsanitize=thread -fPIE -pie -std=c++17 \
    "$here/src/stress_test.cc" "$here/src/pngfilter.cc" \
    "$here/src/lzw.cc" "$here/src/jpegshim.cc" "$here/src/webpshim.cc" \
    "$here/src/jpegentropy.cc" \
    "$here/src/fax.cc" "$here/src/sparsepack.cc" "$here/src/hostresize.cc" \
    "$here/src/rawguard.cc" -mavx2 -mfma \
    -ljpeg -lwebp -lpthread -o "$out"
"$out" "$jpg"
echo "tsan check passed"
