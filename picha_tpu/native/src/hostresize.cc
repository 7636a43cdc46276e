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

// ---- int16 fixed-point u8 kernel -----------------------------------
//
// 16 lanes per op instead of 8: samples are held as s*64 (s16), taps as
// q15 (w*32768), and _mm256_mulhrs_epi16 computes (a*b + 2^14) >> 15 —
// so each tap is one rounding multiply keeping the s*64 scale through
// both passes. Pack is (acc + 32) >> 6 with unsigned saturation, which
// is exactly the pinned floor(clip(v + 0.5)) in fixed point. Per-tap
// rounding is 1/128 sample, so outputs can differ from the f32 kernel
// by the occasional +-1 at a pack threshold (avg well under 0.05 LSB —
// tests pin it). Used by the raw-domain transcode path where the
// parity budget has room; the f32 kernel remains the golden-parity
// default.
//
// Overflow guard: |acc| <= 255*64*g and horizontal partials
// <= 255*64*g^2 must stay < 32768, so rows whose sum(|w|) exceeds
// g = 1.41 (or any single |w| >= 1.0, unrepresentable in q15) return 2
// and the caller falls back to the f32 kernel.

#ifdef __AVX2__

inline void transpose16x16_epi16(__m256i r[16]) {
  __m256i a[16], b[16];
  for (int i = 0; i < 8; ++i) {
    a[2 * i] = _mm256_unpacklo_epi16(r[2 * i], r[2 * i + 1]);
    a[2 * i + 1] = _mm256_unpackhi_epi16(r[2 * i], r[2 * i + 1]);
  }
  for (int i = 0; i < 4; ++i) {
    b[4 * i] = _mm256_unpacklo_epi32(a[4 * i], a[4 * i + 2]);
    b[4 * i + 1] = _mm256_unpackhi_epi32(a[4 * i], a[4 * i + 2]);
    b[4 * i + 2] = _mm256_unpacklo_epi32(a[4 * i + 1], a[4 * i + 3]);
    b[4 * i + 3] = _mm256_unpackhi_epi32(a[4 * i + 1], a[4 * i + 3]);
  }
  for (int i = 0; i < 2; ++i) {
    a[8 * i] = _mm256_unpacklo_epi64(b[8 * i], b[8 * i + 4]);
    a[8 * i + 1] = _mm256_unpackhi_epi64(b[8 * i], b[8 * i + 4]);
    a[8 * i + 2] = _mm256_unpacklo_epi64(b[8 * i + 1], b[8 * i + 5]);
    a[8 * i + 3] = _mm256_unpackhi_epi64(b[8 * i + 1], b[8 * i + 5]);
    a[8 * i + 4] = _mm256_unpacklo_epi64(b[8 * i + 2], b[8 * i + 6]);
    a[8 * i + 5] = _mm256_unpackhi_epi64(b[8 * i + 2], b[8 * i + 6]);
    a[8 * i + 6] = _mm256_unpacklo_epi64(b[8 * i + 3], b[8 * i + 7]);
    a[8 * i + 7] = _mm256_unpackhi_epi64(b[8 * i + 3], b[8 * i + 7]);
  }
  for (int i = 0; i < 8; ++i) {
    r[i] = _mm256_permute2x128_si256(a[i], a[i + 8], 0x20);
    r[i + 8] = _mm256_permute2x128_si256(a[i], a[i + 8], 0x31);
  }
}

int resize_avx2_i16(const uint8_t* src, int sh, int sw, int ch,
                    uint8_t* dst, int dh, int dw, const int32_t* xstart,
                    const float* xw, int xk, const int32_t* ystart,
                    const float* yw, int yk) {
  (void)sh;
  auto guard = [](const float* w, int n, int k) {
    for (int i = 0; i < n; ++i) {
      float s = 0.0f;
      for (int j = 0; j < k; ++j) {
        float a = w[(size_t)i * k + j];
        if (a >= 0.99997f || a <= -0.99997f) return false;
        s += a < 0 ? -a : a;
      }
      if (s > 1.41f) return false;
    }
    return true;
  };
  if (!guard(yw, dh, yk) || !guard(xw, dw, xk)) return 2;
  std::vector<int16_t> ywq((size_t)dh * yk), xwq((size_t)dw * xk);
  for (size_t i = 0; i < ywq.size(); ++i)
    ywq[i] = (int16_t)lrintf(yw[i] * 32768.0f);
  for (size_t i = 0; i < xwq.size(); ++i)
    xwq[i] = (int16_t)lrintf(xw[i] * 32768.0f);

  const size_t rowlen = (size_t)sw * ch;
  const size_t orow = (size_t)dw * ch;
  std::vector<int16_t> tmpv(16 * rowlen);
  std::vector<int16_t> fb(rowlen * 16 + 16);
  std::vector<int16_t> ob(orow * 16 + 16);
  for (int y0 = 0; y0 < dh; y0 += 16) {
    int rmax = std::min(16, dh - y0);
    // vertical pass: u8 -> s*64 int16, 16 samples per op
    for (int r = 0; r < rmax; ++r) {
      int oy = y0 + r;
      const int16_t* w = ywq.data() + (size_t)oy * yk;
      int16_t* out = tmpv.data() + (size_t)r * rowlen;
      size_t j = 0;
      for (; j + 16 <= rowlen; j += 16) {
        __m256i acc = _mm256_setzero_si256();
        for (int k = 0; k < yk; ++k) {
          const uint8_t* p = src + (size_t)(ystart[oy] + k) * rowlen + j;
          __m256i s = _mm256_slli_epi16(
              _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)p)), 6);
          acc = _mm256_add_epi16(
              acc, _mm256_mulhrs_epi16(s, _mm256_set1_epi16(w[k])));
        }
        _mm256_storeu_si256((__m256i*)(out + j), acc);
      }
      for (; j < rowlen; ++j) {
        int acc = 0;
        for (int k = 0; k < yk; ++k) {
          int s = (int)src[(size_t)(ystart[oy] + k) * rowlen + j] << 6;
          acc += (s * (int)w[k] + 16384) >> 15;
        }
        out[j] = (int16_t)acc;
      }
    }
    // transpose to column-major (lane = row)
    const int16_t* rows[16];
    for (int r = 0; r < 16; ++r)
      rows[r] = tmpv.data() + (size_t)std::min(r, rmax - 1) * rowlen;
    size_t j = 0;
    for (; j + 16 <= rowlen; j += 16) {
      __m256i v[16];
      for (int r = 0; r < 16; ++r)
        v[r] = _mm256_loadu_si256((const __m256i*)(rows[r] + j));
      transpose16x16_epi16(v);
      for (int c = 0; c < 16; ++c)
        _mm256_storeu_si256((__m256i*)(fb.data() + (j + c) * 16), v[c]);
    }
    for (; j < rowlen; ++j)
      for (int r = 0; r < 16; ++r) fb[j * 16 + r] = rows[r][j];
    // horizontal pass in lanes
    for (int ox = 0; ox < dw; ++ox) {
      const int16_t* w = xwq.data() + (size_t)ox * xk;
      const int16_t* base = fb.data() + (size_t)xstart[ox] * ch * 16;
      for (int c = 0; c < ch; ++c) {
        __m256i acc = _mm256_setzero_si256();
        const int16_t* bc = base + (size_t)c * 16;
        for (int k = 0; k < xk; ++k)
          acc = _mm256_add_epi16(
              acc, _mm256_mulhrs_epi16(
                       _mm256_loadu_si256(
                           (const __m256i*)(bc + (size_t)k * ch * 16)),
                       _mm256_set1_epi16(w[k])));
        _mm256_storeu_si256((__m256i*)(ob.data() + ((size_t)ox * ch + c)
                                       * 16), acc);
      }
    }
    // transpose back, round-pack: (acc + 32) >> 6, saturate to u8
    const __m256i r32 = _mm256_set1_epi16(32);
    size_t jj = 0;
    for (; jj + 16 <= orow; jj += 16) {
      __m256i v[16];
      for (int c = 0; c < 16; ++c)
        v[c] = _mm256_loadu_si256((const __m256i*)(ob.data() + (jj + c)
                                                   * 16));
      transpose16x16_epi16(v);
      for (int r = 0; r < rmax; ++r) {
        __m256i x = _mm256_srai_epi16(_mm256_add_epi16(v[r], r32), 6);
        __m256i p = _mm256_packus_epi16(x, x);  // lanes 0,1 duplicated
        __m128i lo = _mm256_castsi256_si128(p);
        __m128i hi = _mm256_extracti128_si256(p, 1);
        _mm_storeu_si128(
            (__m128i*)(dst + (size_t)(y0 + r) * orow + jj),
            _mm_unpacklo_epi64(lo, hi));
      }
    }
    for (; jj < orow; ++jj) {
      for (int r = 0; r < rmax; ++r) {
        int x = ((int)ob[jj * 16 + r] + 32) >> 6;
        dst[(size_t)(y0 + r) * orow + jj] =
            (uint8_t)(x < 0 ? 0 : (x > 255 ? 255 : x));
      }
    }
  }
  return 0;
}

// Same-size single-channel variant of the i16 kernel (the draft-Y
// correction path, ops/raw420.py transcode_raw420_draft): identical
// arithmetic — s<<6 samples, q15 mulhrs per tap in window order,
// (acc+32)>>6 pack, so outputs are BIT-IDENTICAL to resize_avx2_i16 —
// but transpose-free: the vertical pass is contiguous 16-wide ops for
// any windows, and the horizontal pass exploits that identity-size
// windows have consecutive starts and one shared tap vector over the
// interior columns (lanes slide along the row, no transpose needed).
// Edge/pad columns whose folded windows differ run the scalar form of
// the same fixed point. Returns 2 whenever the windows don't have that
// structure (or fail the q15 guard) so callers fall back to the
// generic kernel. Measured ~2.5-3x the generic i16 kernel on the
// 960x544 5-tap correction.
int correct_same_avx2_i16(const uint8_t* src, int h, int w, uint8_t* dst,
                          const int32_t* xstart, const float* xw, int xk,
                          const int32_t* ystart, const float* yw, int yk) {
  if (w < xk || h < yk || xk > 16 || yk > 16) return 2;
  auto guard = [](const float* wt, int n, int k) {
    for (int i = 0; i < n; ++i) {
      float s = 0.0f;
      for (int j = 0; j < k; ++j) {
        float a = wt[(size_t)i * k + j];
        if (a >= 0.99997f || a <= -0.99997f) return false;
        s += a < 0 ? -a : a;
      }
      if (s > 1.41f) return false;
    }
    return true;
  };
  if (!guard(yw, h, yk) || !guard(xw, w, xk)) return 2;
  std::vector<int16_t> ywq((size_t)h * yk), xwq((size_t)w * xk);
  for (size_t i = 0; i < ywq.size(); ++i)
    ywq[i] = (int16_t)lrintf(yw[i] * 32768.0f);
  for (size_t i = 0; i < xwq.size(); ++i)
    xwq[i] = (int16_t)lrintf(xw[i] * 32768.0f);

  // maximal interior run around the centre column: starts advance one
  // per output and the tap vector is shared (the identity-window
  // structure); everything outside — folded edges, repeated pad
  // windows — runs scalar
  const int half = xk / 2;
  const int cx = w / 2;
  auto uniform = [&](int x) {
    if (xstart[x] != x - half) return false;
    const int16_t* a = xwq.data() + (size_t)x * xk;
    const int16_t* b = xwq.data() + (size_t)cx * xk;
    for (int j = 0; j < xk; ++j)
      if (a[j] != b[j]) return false;
    return true;
  };
  if (!uniform(cx)) return 2;
  int x0 = cx, x1 = cx + 1;
  while (x0 > 0 && uniform(x0 - 1)) --x0;
  while (x1 < w && uniform(x1)) ++x1;

  // ---- vertical pass: contiguous 16-wide, any windows ----
  std::vector<int16_t> tmp((size_t)h * w);
  for (int oy = 0; oy < h; ++oy) {
    const int16_t* wv = ywq.data() + (size_t)oy * yk;
    int16_t* out = tmp.data() + (size_t)oy * w;
    int j = 0;
    for (; j + 16 <= w; j += 16) {
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < yk; ++k) {
        const uint8_t* p = src + (size_t)(ystart[oy] + k) * w + j;
        __m256i s = _mm256_slli_epi16(
            _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)p)), 6);
        acc = _mm256_add_epi16(
            acc, _mm256_mulhrs_epi16(s, _mm256_set1_epi16(wv[k])));
      }
      _mm256_storeu_si256((__m256i*)(out + j), acc);
    }
    for (; j < w; ++j) {
      int acc = 0;
      for (int k = 0; k < yk; ++k) {
        int s = (int)src[(size_t)(ystart[oy] + k) * w + j] << 6;
        acc += (s * (int)wv[k] + 16384) >> 15;
      }
      out[j] = (int16_t)acc;
    }
  }

  // ---- horizontal pass: sliding 16-wide over the interior run ----
  const __m256i r32 = _mm256_set1_epi16(32);
  __m256i tapv[16];
  for (int k = 0; k < xk; ++k)
    tapv[k] = _mm256_set1_epi16(xwq[(size_t)cx * xk + k]);
  for (int oy = 0; oy < h; ++oy) {
    const int16_t* row = tmp.data() + (size_t)oy * w;
    uint8_t* out = dst + (size_t)oy * w;
    auto scalar_one = [&](int x) {
      const int16_t* wt = xwq.data() + (size_t)x * xk;
      const int16_t* p = row + xstart[x];
      int acc = 0;
      for (int k = 0; k < xk; ++k)
        acc += ((int)p[k] * (int)wt[k] + 16384) >> 15;
      int v = (acc + 32) >> 6;
      out[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    };
    for (int x = 0; x < x0; ++x) scalar_one(x);
    int x = x0;
    for (; x + 16 <= x1; x += 16) {
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < xk; ++k)
        acc = _mm256_add_epi16(
            acc, _mm256_mulhrs_epi16(
                     _mm256_loadu_si256(
                         (const __m256i*)(row + x - half + k)),
                     tapv[k]));
      __m256i v = _mm256_srai_epi16(_mm256_add_epi16(acc, r32), 6);
      __m256i p = _mm256_packus_epi16(v, v);
      __m128i lo = _mm256_castsi256_si128(p);
      __m128i hi = _mm256_extracti128_si256(p, 1);
      _mm_storeu_si128((__m128i*)(out + x), _mm_unpacklo_epi64(lo, hi));
    }
    for (; x < x1; ++x) scalar_one(x);
    for (x = x1; x < w; ++x) scalar_one(x);
  }
  return 0;
}

#endif  // __AVX2__

}  // namespace

namespace {

#ifndef __AVX2__
// scalar fallback (non-x86 builds): BIT-IDENTICAL to the AVX2 kernel.
// Same raw 0..max space, same vertical-then-horizontal order, and the
// same rounding events per output: the AVX2 vertical pass accumulates
// taps with single-rounded FMAs over the 8-wide column body but plain
// double-rounded multiply-adds over the <8 tail columns, and the
// horizontal pass is FMA throughout — so this fallback uses std::fmaf
// over the same column split. Verified bit-for-bit against the AVX2
// build by native/check_scalar_parity.sh (compiles this leg on an x86
// host, where fmaf is the hardware FMA both paths share).
template <typename T>
int resize_scalar(const T* src, int sh, int sw, int ch, T* dst, int dh,
                  int dw, const int32_t* xstart, const float* xw, int xk,
                  const int32_t* ystart, const float* yw, int yk) {
  (void)sh;
  const float maxv = (float)(T)~(T)0;
  const size_t rowlen = (size_t)sw * ch;
  const size_t orow = (size_t)dw * ch;
  const size_t body = rowlen & ~(size_t)7;  // AVX2 8-wide column body
  std::vector<float> tmpv((size_t)dh * rowlen);
  for (int oy = 0; oy < dh; ++oy) {
    const float* w = yw + (size_t)oy * yk;
    float* out = tmpv.data() + (size_t)oy * rowlen;
    for (size_t j = 0; j < rowlen; ++j) {
      float acc = 0.0f;
      if (j < body) {
        for (int k = 0; k < yk; ++k)
          acc = std::fmaf(w[k],
                          (float)src[(size_t)(ystart[oy] + k) * rowlen + j],
                          acc);
      } else {  // tail columns: the AVX2 build double-rounds here
        for (int k = 0; k < yk; ++k)
          acc += w[k] * (float)src[(size_t)(ystart[oy] + k) * rowlen + j];
      }
      out[j] = acc;
    }
  }
  for (int oy = 0; oy < dh; ++oy) {
    const float* rowp = tmpv.data() + (size_t)oy * rowlen;
    T* out = dst + (size_t)oy * orow;
    for (int ox = 0; ox < dw; ++ox) {
      const float* w = xw + (size_t)ox * xk;
      const float* p = rowp + (size_t)xstart[ox] * ch;
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < xk; ++k)
          acc = std::fmaf(w[k], p[(size_t)k * ch + c], acc);
        float v = acc + 0.5f;
        v = v < 0.0f ? 0.0f : (v > maxv ? maxv : v);
        out[(size_t)ox * ch + c] = (T)(int)std::floor(v);
      }
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

// int16 fixed-point u8 variant (see block comment above): returns 2
// when the tap windows exceed the q15/overflow guard so callers fall
// back to the f32 kernel; non-AVX2 builds always return 2.
PICHA_API int picha_resize_u8_i16(const uint8_t* src, int sh, int sw,
                                  int ch, uint8_t* dst, int dh, int dw,
                                  const int32_t* xstart, const float* xw,
                                  int xk, const int32_t* ystart,
                                  const float* yw, int yk) {
  if (sh <= 0 || sw <= 0 || ch <= 0 || dh <= 0 || dw <= 0) return 1;
#ifdef __AVX2__
  return resize_avx2_i16(src, sh, sw, ch, dst, dh, dw, xstart, xw, xk,
                         ystart, yw, yk);
#else
  (void)src; (void)dst; (void)xstart; (void)xw; (void)xk;
  (void)ystart; (void)yw; (void)yk;
  return 2;
#endif
}

PICHA_API int picha_resize_u8_i16_same(const uint8_t* src, int h, int w,
                                       uint8_t* dst, const int32_t* xstart,
                                       const float* xw, int xk,
                                       const int32_t* ystart,
                                       const float* yw, int yk) {
  if (h <= 0 || w <= 0) return 1;
#ifdef __AVX2__
  return correct_same_avx2_i16(src, h, w, dst, xstart, xw, xk, ystart, yw,
                               yk);
#else
  (void)src; (void)dst; (void)xstart; (void)xw; (void)xk;
  (void)ystart; (void)yw; (void)yk;
  return 2;
#endif
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
