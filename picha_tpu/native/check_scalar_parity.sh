#!/bin/sh
# Cross-build resize parity: compile hostresize.cc as the shipped AVX2
# kernel and as the scalar fallback (no -mavx2 -> the #ifndef __AVX2__
# leg), then assert picha_resize_u8/u16 outputs are BIT-IDENTICAL on
# randomized inputs (scalar_parity_test.cc). On this x86 host the
# scalar build's std::fmaf is the same hardware FMA the AVX2 kernel
# uses, so any mismatch is a real formulation drift, not platform
# rounding. Addresses the round-2 advisor note about the two builds
# differing (the scalar leg now replicates the AVX2 rounding events).
set -e
cd "$(dirname "$0")"
OUT=${TMPDIR:-/tmp}/picha_scalar_parity
mkdir -p "$OUT"
CXX=${CXX:-g++}
$CXX -O2 -shared -fPIC -std=c++17 -mavx2 -mfma -ffp-contract=off \
     src/hostresize.cc -o "$OUT/hr_avx2.so"
$CXX -O2 -shared -fPIC -std=c++17 -ffp-contract=off \
     src/hostresize.cc -o "$OUT/hr_scalar.so"
$CXX -O2 -std=c++17 src/scalar_parity_test.cc -ldl \
     -o "$OUT/parity_test"
"$OUT/parity_test" "$OUT/hr_avx2.so" "$OUT/hr_scalar.so"
