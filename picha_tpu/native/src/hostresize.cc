// Host separable resize — the native fast path for single images and
// the hybrid scheduler's host worker.
//
// Same architecture as the reference's resizer (src/resize.cc:66-134):
// one pass per axis accumulating float32 tap windows. The weight
// windows arrive from Python (ops/resize.py _iter_contribs) so the tap
// values are the reference's float32 construction bit-for-bit; taps
// accumulate sequentially in window order like resize.cc:111-115, and
// pack uses the pinned numerics floor(clip(acc + 0.5, 0, 255))
// (reference picha.h:98-114, here in raw 0..255 space — the 1/255
// unpack and 255 pack scales cancel; parity vs the numpy reference is
// pinned at <= 1 LSB in tests/test_resize.py).
//
// Windows are uniform: `ktaps` taps per output index, starting at
// start[i], zero-padded, starts clamped so every window is in range —
// the same banded layout the XLA plan uses.
//
// The AVX2 kernel runs the vertical pass first (contiguous 8-lane
// FMAs over each output row, u8 converted on the fly) and then the
// horizontal pass on 8-row transposed blocks: with rows in SIMD lanes
// every tap is one broadcast-FMA against 8 rows at once — no gathers,
// no horizontal reductions. Measured ~5x over the scalar loop on one
// core (the scalar form is kept as the non-x86 fallback).
#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <vector>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include "picha_native.h"

namespace {

#ifdef __AVX2__

inline void transpose8x8(__m256 r[8]) {
  __m256 t0 = _mm256_unpacklo_ps(r[0], r[1]);
  __m256 t1 = _mm256_unpackhi_ps(r[0], r[1]);
  __m256 t2 = _mm256_unpacklo_ps(r[2], r[3]);
  __m256 t3 = _mm256_unpackhi_ps(r[2], r[3]);
  __m256 t4 = _mm256_unpacklo_ps(r[4], r[5]);
  __m256 t5 = _mm256_unpackhi_ps(r[4], r[5]);
  __m256 t6 = _mm256_unpacklo_ps(r[6], r[7]);
  __m256 t7 = _mm256_unpackhi_ps(r[6], r[7]);
  __m256 s0 = _mm256_shuffle_ps(t0, t2, 0x44);
  __m256 s1 = _mm256_shuffle_ps(t0, t2, 0xEE);
  __m256 s2 = _mm256_shuffle_ps(t1, t3, 0x44);
  __m256 s3 = _mm256_shuffle_ps(t1, t3, 0xEE);
  __m256 s4 = _mm256_shuffle_ps(t4, t6, 0x44);
  __m256 s5 = _mm256_shuffle_ps(t4, t6, 0xEE);
  __m256 s6 = _mm256_shuffle_ps(t5, t7, 0x44);
  __m256 s7 = _mm256_shuffle_ps(t5, t7, 0xEE);
  r[0] = _mm256_permute2f128_ps(s0, s4, 0x20);
  r[1] = _mm256_permute2f128_ps(s1, s5, 0x20);
  r[2] = _mm256_permute2f128_ps(s2, s6, 0x20);
  r[3] = _mm256_permute2f128_ps(s3, s7, 0x20);
  r[4] = _mm256_permute2f128_ps(s0, s4, 0x31);
  r[5] = _mm256_permute2f128_ps(s1, s5, 0x31);
  r[6] = _mm256_permute2f128_ps(s2, s6, 0x31);
  r[7] = _mm256_permute2f128_ps(s3, s7, 0x31);
}

// sample-type traits: u8 and u16 (deep r16* formats) share the kernel;
// only the load-convert and the pack clamp differ
template <typename T>
struct SampleOps;

template <>
struct SampleOps<uint8_t> {
  static constexpr float kMax = 255.0f;
  static inline __m256 load8(const uint8_t* p) {
    return _mm256_cvtepi32_ps(
        _mm256_cvtepu8_epi32(_mm_loadl_epi64((const __m128i*)p)));
  }
  static inline void store8(uint8_t* p, __m256i xi) {
    __m128i p16 = _mm_packus_epi32(_mm256_castsi256_si128(xi),
                                   _mm256_extracti128_si256(xi, 1));
    _mm_storel_epi64((__m128i*)p, _mm_packus_epi16(p16, p16));
  }
};

template <>
struct SampleOps<uint16_t> {
  static constexpr float kMax = 65535.0f;
  static inline __m256 load8(const uint16_t* p) {
    return _mm256_cvtepi32_ps(
        _mm256_cvtepu16_epi32(_mm_loadu_si128((const __m128i*)p)));
  }
  static inline void store8(uint16_t* p, __m256i xi) {
    _mm_storeu_si128((__m128i*)p,
                     _mm_packus_epi32(_mm256_castsi256_si128(xi),
                                      _mm256_extracti128_si256(xi, 1)));
  }
};

template <typename T>
int resize_avx2(const T* src, int sh, int sw, int ch, T* dst,
                int dh, int dw, const int32_t* xstart, const float* xw,
                int xk, const int32_t* ystart, const float* yw, int yk) {
  (void)sh;
  const size_t rowlen = (size_t)sw * ch;   // source / intermediate width
  const size_t orow = (size_t)dw * ch;     // destination width
  // Fused tiling: the vertical pass produces only the 8 output rows
  // the horizontal pass is about to consume, so the f32 intermediate
  // lives in cache instead of round-tripping a (dh, rowlen) buffer
  // through memory (measured ~25% off a 1080p Y-plane resize).
  std::vector<float> tmpv(8 * rowlen);
  std::vector<float> fb(rowlen * 8 + 8);
  std::vector<float> ob(orow * 8 + 8);
  const __m256 half = _mm256_set1_ps(0.5f);
  const __m256 maxv = _mm256_set1_ps(SampleOps<T>::kMax);
  for (int y0 = 0; y0 < dh; y0 += 8) {
    // ---- vertical pass for this tile: u8/u16 -> f32, raw space ----
    int rmaxv = std::min(8, dh - y0);
    for (int r = 0; r < rmaxv; ++r) {
      int oy = y0 + r;
      const float* w = yw + (size_t)oy * yk;
      float* out = tmpv.data() + (size_t)r * rowlen;
      size_t j = 0;
      for (; j + 8 <= rowlen; j += 8) {
        __m256 acc = _mm256_setzero_ps();
        for (int k = 0; k < yk; ++k) {
          const T* p = src + (size_t)(ystart[oy] + k) * rowlen + j;
          acc = _mm256_fmadd_ps(_mm256_set1_ps(w[k]),
                                SampleOps<T>::load8(p), acc);
        }
        _mm256_storeu_ps(out + j, acc);
      }
      for (; j < rowlen; ++j) {
        float acc = 0.0f;
        for (int k = 0; k < yk; ++k)
          acc += w[k] * (float)src[(size_t)(ystart[oy] + k) * rowlen + j];
        out[j] = acc;
      }
    }
    // ---- horizontal pass on the 8-row transposed tile --------------
    // fb holds the tile column-major (lane = row), so each tap k of
    // each (ox, c) is one contiguous 8-float FMA.
    const float* rows[8];
    for (int r = 0; r < 8; ++r)
      rows[r] = tmpv.data() + (size_t)std::min(r, rmaxv - 1) * rowlen;
    size_t j = 0;
    for (; j + 8 <= rowlen; j += 8) {
      __m256 v[8];
      for (int r = 0; r < 8; ++r) v[r] = _mm256_loadu_ps(rows[r] + j);
      transpose8x8(v);
      for (int c = 0; c < 8; ++c)
        _mm256_storeu_ps(fb.data() + (j + c) * 8, v[c]);
    }
    for (; j < rowlen; ++j)
      for (int r = 0; r < 8; ++r) fb[j * 8 + r] = rows[r][j];
    for (int ox = 0; ox < dw; ++ox) {
      const float* w = xw + (size_t)ox * xk;
      const float* base = fb.data() + (size_t)xstart[ox] * ch * 8;
      for (int c = 0; c < ch; ++c) {
        __m256 acc = _mm256_setzero_ps();
        const float* bc = base + (size_t)c * 8;
        for (int k = 0; k < xk; ++k)
          acc = _mm256_fmadd_ps(_mm256_set1_ps(w[k]),
                                _mm256_loadu_ps(bc + (size_t)k * ch * 8),
                                acc);
        _mm256_storeu_ps(ob.data() + ((size_t)ox * ch + c) * 8, acc);
      }
    }
    // transpose back and pack: floor(clip(acc + 0.5, 0, max))
    int rmax = std::min(8, dh - y0);
    size_t jj = 0;
    for (; jj + 8 <= orow; jj += 8) {
      __m256 v[8];
      for (int c = 0; c < 8; ++c)
        v[c] = _mm256_loadu_ps(ob.data() + (jj + c) * 8);
      transpose8x8(v);
      for (int r = 0; r < rmax; ++r) {
        __m256 x = _mm256_add_ps(v[r], half);
        x = _mm256_min_ps(_mm256_max_ps(x, _mm256_setzero_ps()), maxv);
        x = _mm256_floor_ps(x);
        SampleOps<T>::store8(dst + (size_t)(y0 + r) * orow + jj,
                             _mm256_cvtps_epi32(x));
      }
    }
    for (; jj < orow; ++jj) {
      for (int r = 0; r < rmax; ++r) {
        float x = ob[jj * 8 + r] + 0.5f;
        x = x < 0.0f ? 0.0f : (x > SampleOps<T>::kMax ? SampleOps<T>::kMax
                                                      : x);
        dst[(size_t)(y0 + r) * orow + jj] = (T)(int)std::floor(x);
      }
    }
  }
  return 0;
}

#endif  // __AVX2__

}  // namespace

namespace {

#ifndef __AVX2__
// scalar reference: horizontal pass (sh, sw, ch) T -> (sh, dw, ch)
// f32 in 1/max-scaled space, then vertical accumulate + pack
// (reference resize.cc order; see the cross-arch note in
// picha_native.h)
template <typename T>
int resize_scalar(const T* src, int sh, int sw, int ch, T* dst, int dh,
                  int dw, const int32_t* xstart, const float* xw, int xk,
                  const int32_t* ystart, const float* yw, int yk) {
  const float maxv = (float)(T)~(T)0;
  std::vector<float> tmp((size_t)sh * dw * ch);
  const float inv = 1.0f / maxv;
  for (int y = 0; y < sh; ++y) {
    const T* row = src + (size_t)y * sw * ch;
    float* out = tmp.data() + (size_t)y * dw * ch;
    for (int ox = 0; ox < dw; ++ox) {
      const float* w = xw + (size_t)ox * xk;
      const T* p = row + (size_t)xstart[ox] * ch;
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < xk; ++k)
          acc += w[k] * ((float)p[(size_t)k * ch + c] * inv);
        out[(size_t)ox * ch + c] = acc;
      }
    }
  }
  for (int oy = 0; oy < dh; ++oy) {
    const float* w = yw + (size_t)oy * yk;
    const float* base = tmp.data() + (size_t)ystart[oy] * dw * ch;
    T* out = dst + (size_t)oy * dw * ch;
    for (int i = 0; i < dw * ch; ++i) {
      float acc = 0.0f;
      for (int k = 0; k < yk; ++k)
        acc += w[k] * base[(size_t)k * dw * ch + i];
      float v = acc * maxv + 0.5f;
      v = v < 0.0f ? 0.0f : (v > maxv ? maxv : v);
      out[i] = (T)(int)std::floor(v);
    }
  }
  return 0;
}
#endif

template <typename T>
int resize_any(const T* src, int sh, int sw, int ch, T* dst, int dh,
               int dw, const int32_t* xstart, const float* xw, int xk,
               const int32_t* ystart, const float* yw, int yk) {
  if (sh <= 0 || sw <= 0 || ch <= 0 || dh <= 0 || dw <= 0) return 1;
#ifdef __AVX2__
  return resize_avx2<T>(src, sh, sw, ch, dst, dh, dw, xstart, xw, xk,
                        ystart, yw, yk);
#else
  return resize_scalar<T>(src, sh, sw, ch, dst, dh, dw, xstart, xw, xk,
                          ystart, yw, yk);
#endif
}

}  // namespace

PICHA_API int picha_resize_u8(const uint8_t* src, int sh, int sw, int ch,
                              uint8_t* dst, int dh, int dw,
                              const int32_t* xstart, const float* xw,
                              int xk, const int32_t* ystart,
                              const float* yw, int yk) {
  return resize_any<uint8_t>(src, sh, sw, ch, dst, dh, dw, xstart, xw, xk,
                             ystart, yw, yk);
}

// deep (16-bit) formats: same kernel, 65535 pack clamp
// (reference resize.cc:136-149 dispatches all 8 formats through one
// template; this is the r16* leg)
PICHA_API int picha_resize_u16(const uint16_t* src, int sh, int sw, int ch,
                               uint16_t* dst, int dh, int dw,
                               const int32_t* xstart, const float* xw,
                               int xk, const int32_t* ystart,
                               const float* yw, int yk) {
  return resize_any<uint16_t>(src, sh, sw, ch, dst, dh, dw, xstart, xw,
                              xk, ystart, yw, yk);
}
