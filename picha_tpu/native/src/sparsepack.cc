// Gap-delta sparse packing of quantised JPEG coefficient planes for the
// host->TPU upload path (pipeline/jpeg_batch.py upload="gap8").
//
// Quantised AC coefficients are mostly zero (~85-90% at quality 85), so
// the wire format is one (gap uint8, value int8) pair per nonzero:
//   index_i = sum_{j<=i} gap_j - 1        (gaps accumulate, 1-based)
// Gaps longer than 255 insert dummy pairs (gap=255, value=0); values
// outside int8 are clamped and repaired by a separate correction list
// of (flat_index int32, residual int16), which the device applies with
// a second sorted scatter (same mechanism as the int8 upload mode).
// A final (gap to n-1, value 0) pair pins the last index at n-1 so the
// caller's zero padding keeps indices sorted — TPU scatter-add with
// indices_are_sorted stays on the fast path.
//
// This replaces the reference's "ship pixels" host->device story
// (there is none: src/picha.cc marshals buffers in-process); over a
// ~50 MB/s PCIe-oid link the coefficient bytes are the bottleneck, so
// the wire format is the perf-critical contract. The scan is AVX2
// (16 lanes/iteration + movemask) because the single host core is the
// next bottleneck after the link.
#include <cstddef>
#include <cstdint>
#include <cstring>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include "picha_native.h"

namespace {

struct Packer {
  uint8_t* gaps;
  int8_t* vals;
  int32_t* corr_idx;
  int16_t* corr_val;
  size_t k = 0, c = 0;
  size_t prev = (size_t)-1;

  inline void emit(size_t i, int16_t v) {
    size_t gap = i - prev;
    while (gap > 255) {
      gaps[k] = 255;
      vals[k] = 0;
      ++k;
      gap -= 255;
    }
    int16_t v8 = v < -128 ? -128 : (v > 127 ? 127 : v);
    gaps[k] = (uint8_t)gap;
    vals[k] = (int8_t)v8;
    ++k;
    if (v != v8) {
      corr_idx[c] = (int32_t)i;
      corr_val[c] = (int16_t)(v - v8);
      ++c;
    }
    prev = i;
  }
};

}  // namespace

PICHA_API int picha_gap8_pack(const int16_t* coefs, size_t n,
                              uint8_t* gaps, int8_t* vals, size_t* npairs,
                              int32_t* corr_idx, int16_t* corr_val,
                              size_t* ncorr) {
  Packer p{gaps, vals, corr_idx, corr_val};
  size_t i = 0;
#ifdef __AVX2__
  const __m256i zero = _mm256_setzero_si256();
  for (; i + 16 <= n; i += 16) {
    __m256i x = _mm256_loadu_si256((const __m256i*)(coefs + i));
    // movemask gives 2 bits per int16 lane, both set iff the lane is 0
    uint32_t zm = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi16(x, zero));
    uint32_t nz = ~zm;
    while (nz) {
      unsigned j = (unsigned)__builtin_ctz(nz) >> 1;
      p.emit(i + j, coefs[i + j]);
      nz &= ~(3u << (2 * j));
    }
  }
#endif
  for (; i < n; ++i)
    if (coefs[i] != 0) p.emit(i, coefs[i]);
  // pin the tail at index n-1 (zero value) so padded entries stay sorted
  {
    size_t gap = (n - 1) - p.prev;  // prev==-1 (all zero) wraps to n
    while (gap > 255) {
      p.gaps[p.k] = 255;
      p.vals[p.k] = 0;
      ++p.k;
      gap -= 255;
    }
    p.gaps[p.k] = (uint8_t)gap;
    p.vals[p.k] = 0;
    ++p.k;
  }
  *npairs = p.k;
  *ncorr = p.c;
  return 0;
}

// Nibble-packed variant: one byte per nonzero — (gap 4b | value-code
// 4b), value-code 0..14 -> v = code-7 in [-7,7] (7 adds zero, used by
// gap-extension dummies and the tail pin), 15 = escape: the true value
// rides a side gap8 stream (same index space, own gap chain) whose
// int8 overflows use the usual correction list. ~40% fewer wire bytes
// than gap8 at q85 statistics (P(|v|<=7) ~ 0.9).
PICHA_API int picha_gap4_pack(const int16_t* coefs, size_t n,
                              uint8_t* prim, size_t* nprim,
                              uint8_t* sgaps, int8_t* svals, size_t* nsec,
                              int32_t* corr_idx, int16_t* corr_val,
                              size_t* ncorr) {
  size_t k = 0, s = 0, c = 0;
  size_t prev = (size_t)-1, sprev = (size_t)-1;
  size_t i = 0;
#ifdef __AVX2__
  const __m256i zero = _mm256_setzero_si256();
#endif
  while (i < n) {
#ifdef __AVX2__
    for (; i + 16 <= n; i += 16) {
      __m256i x = _mm256_loadu_si256((const __m256i*)(coefs + i));
      uint32_t zm =
          (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi16(x, zero));
      if (~zm) break;
    }
#endif
    while (i < n && coefs[i] == 0) ++i;
    if (i >= n) break;
    int16_t v = coefs[i];
    size_t gap = i - prev;
    while (gap > 15) {
      prim[k++] = (15u << 4) | 7u;  // advance 15, add zero
      gap -= 15;
    }
    if (v >= -7 && v <= 7) {
      prim[k++] = ((uint8_t)gap << 4) | (uint8_t)(v + 7);
    } else {
      prim[k++] = ((uint8_t)gap << 4) | 15u;  // escape: side stream
      size_t sg = i - sprev;
      while (sg > 255) {
        sgaps[s] = 255;
        svals[s] = 0;
        ++s;
        sg -= 255;
      }
      int16_t v8 = v < -128 ? -128 : (v > 127 ? 127 : v);
      sgaps[s] = (uint8_t)sg;
      svals[s] = (int8_t)v8;
      ++s;
      if (v != v8) {
        corr_idx[c] = (int32_t)i;
        corr_val[c] = (int16_t)(v - v8);
        ++c;
      }
      sprev = i;
    }
    prev = i;
    ++i;
  }
  {  // pin both tails at n-1 with zero adds, keeping indices sorted
    size_t gap = (n - 1) - prev;
    if (prev == (size_t)-1) gap = n;
    while (gap > 15) {
      prim[k++] = (15u << 4) | 7u;
      gap -= 15;
    }
    prim[k++] = ((uint8_t)gap << 4) | 7u;
    size_t sg = (n - 1) - sprev;
    if (sprev == (size_t)-1) sg = n;
    while (sg > 255) {
      sgaps[s] = 255;
      svals[s] = 0;
      ++s;
      sg -= 255;
    }
    sgaps[s] = (uint8_t)sg;
    svals[s] = 0;
    ++s;
  }
  *nprim = k;
  *nsec = s;
  *ncorr = c;
  return 0;
}
