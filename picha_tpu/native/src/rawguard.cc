// Gamut-clip guard for the raw-domain (4:2:0) transcode fast path.
//
// The raw path (jpegshim.cc picha_jpeg_transcode_raw420) resizes the
// Y/Cb/Cr planes directly. In exact arithmetic that commutes with the
// staged reference chain (decode -> RGB -> resize -> re-encode): the
// colour transform is affine, the resize is linear, and the composed
// chroma operator is exactly downsample . resize . upsample. The one
// place the two pipelines genuinely diverge is gamut clipping: the
// staged path clamps every pixel's RGB to [0,255] BEFORE the resize
// (a nonlinearity), while the raw path stays linear throughout. On
// photographic content out-of-gamut (Y, Cb, Cr) combinations are rare
// and the paths agree to ~0.5 LSB; on heavily saturated content
// (4:2:0 chroma averaging across colour edges manufactures
// out-of-gamut samples) the clamp grows with the out-of-gamut mass.
//
// picha_raw420_clip_mass measures exactly that nonlinearity on the
// decoded source planes: the mean per-channel amount (LSB) by which
// the implied RGB exceeds [0,255]. The transcode entry point compares
// it against a caller threshold (ops/raw420.py GAMUT_GUARD_LSB, with
// the calibration table) and routes images beyond the measured-safe
// envelope back to the staged exact path (rc=2) — a tripwire bounding
// the one divergence mechanism that grows without bound, not a
// per-corpus tune.
//
// Arithmetic is integer 16-bit with a >>6 fixed point (constants
// round(k*64) of the BT.601 factors libjpeg uses in jdcolor.c) and is
// IDENTICAL between the AVX2 and scalar builds — the guard decision
// must not depend on the host architecture. Even rows only: the mass
// is an average, sampling halves the cost without bias.
#include <cstdint>
#include <cstddef>

#include "picha_native.h"

#ifdef __AVX2__
#include <immintrin.h>
#endif

namespace {

// >>6 fixed-point BT.601: R = Y + 1.402*Cr', G = Y - (0.344*Cb' +
// 0.714*Cr'), B = Y + 1.772*Cb' with Cb' = Cb-128, Cr' = Cr-128.
constexpr int kCrR = 90;   // round(1.402 * 64)
constexpr int kCbG = 22;   // round(0.344136 * 64)
constexpr int kCrG = 46;   // round(0.714136 * 64)
constexpr int kCbB = 113;  // round(1.772 * 64)

inline int clip_amount(int v) {
  int lo = v < 0 ? -v : 0;
  int hi = v > 255 ? v - 255 : 0;
  return lo + hi;
}

}  // namespace

// Core loop shared by the 4:2:0 and same-grid (scaled-decode 4:4:4)
// layouts: same_grid selects chroma indexed at (row, x) with stride
// cstride instead of (row/2, x/2).
static double clip_mass_impl(const uint8_t* y, const uint8_t* cb,
                             const uint8_t* cr, int w, int h, int wpad,
                             int cstride, int same_grid) {
  if (w <= 0 || h <= 0) return 0.0;
  uint64_t mass = 0;
  uint64_t count = 0;
  for (int row = 0; row < h; row += 2) {
    const uint8_t* yr = y + (size_t)row * wpad;
    const uint8_t* cbr =
        cb + (size_t)(same_grid ? row : row / 2) * cstride;
    const uint8_t* crr =
        cr + (size_t)(same_grid ? row : row / 2) * cstride;
    int x = 0;
#ifdef __AVX2__
    __m256i acc = _mm256_setzero_si256();
    const __m256i k128 = _mm256_set1_epi16(128);
    const __m256i k255 = _mm256_set1_epi16(255);
    const __m256i zero = _mm256_setzero_si256();
    const __m256i ones = _mm256_set1_epi16(1);
    for (; x + 16 <= w; x += 16) {
      __m256i yv = _mm256_cvtepu8_epi16(
          _mm_loadu_si128((const __m128i*)(yr + x)));
      __m256i cbv, crv;
      if (same_grid) {
        cbv = _mm256_sub_epi16(_mm256_cvtepu8_epi16(_mm_loadu_si128(
                                   (const __m128i*)(cbr + x))),
                               k128);
        crv = _mm256_sub_epi16(_mm256_cvtepu8_epi16(_mm_loadu_si128(
                                   (const __m128i*)(crr + x))),
                               k128);
      } else {
        // 8 chroma bytes cover 16 luma columns: duplicate each byte
        __m128i cb8 = _mm_loadl_epi64((const __m128i*)(cbr + x / 2));
        __m128i cr8 = _mm_loadl_epi64((const __m128i*)(crr + x / 2));
        cbv = _mm256_sub_epi16(
            _mm256_cvtepu8_epi16(_mm_unpacklo_epi8(cb8, cb8)), k128);
        crv = _mm256_sub_epi16(
            _mm256_cvtepu8_epi16(_mm_unpacklo_epi8(cr8, cr8)), k128);
      }
      __m256i roff = _mm256_srai_epi16(
          _mm256_mullo_epi16(crv, _mm256_set1_epi16(kCrR)), 6);
      __m256i goff = _mm256_srai_epi16(
          _mm256_add_epi16(
              _mm256_mullo_epi16(cbv, _mm256_set1_epi16(kCbG)),
              _mm256_mullo_epi16(crv, _mm256_set1_epi16(kCrG))), 6);
      __m256i boff = _mm256_srai_epi16(
          _mm256_mullo_epi16(cbv, _mm256_set1_epi16(kCbB)), 6);
      __m256i rv = _mm256_add_epi16(yv, roff);
      __m256i gv = _mm256_sub_epi16(yv, goff);
      __m256i bv = _mm256_add_epi16(yv, boff);
      __m256i clip = _mm256_add_epi16(
          _mm256_max_epi16(zero, _mm256_sub_epi16(zero, rv)),
          _mm256_max_epi16(zero, _mm256_sub_epi16(rv, k255)));
      clip = _mm256_add_epi16(clip, _mm256_add_epi16(
          _mm256_max_epi16(zero, _mm256_sub_epi16(zero, gv)),
          _mm256_max_epi16(zero, _mm256_sub_epi16(gv, k255))));
      clip = _mm256_add_epi16(clip, _mm256_add_epi16(
          _mm256_max_epi16(zero, _mm256_sub_epi16(zero, bv)),
          _mm256_max_epi16(zero, _mm256_sub_epi16(bv, k255))));
      acc = _mm256_add_epi32(acc, _mm256_madd_epi16(clip, ones));
    }
    // flush the row's 8x int32 partials (bounded: <=16-wide rows of
    // <=~700/channel clips cannot overflow int32 within one row)
    alignas(32) int32_t lanes[8];
    _mm256_store_si256((__m256i*)lanes, acc);
    for (int i = 0; i < 8; ++i) mass += (uint64_t)lanes[i];
#endif
    for (; x < w; ++x) {
      int dcb = (int)cbr[same_grid ? x : x / 2] - 128;
      int dcr = (int)crr[same_grid ? x : x / 2] - 128;
      int yy = yr[x];
      int r = yy + ((kCrR * dcr) >> 6);
      int g = yy - ((kCbG * dcb + kCrG * dcr) >> 6);
      int b = yy + ((kCbB * dcb) >> 6);
      mass += (uint64_t)(clip_amount(r) + clip_amount(g) + clip_amount(b));
    }
    count += (uint64_t)w;
  }
  return count ? (double)mass / (3.0 * (double)count) : 0.0;
}

PICHA_API double picha_raw420_clip_mass(const uint8_t* y, const uint8_t* cb,
                                        const uint8_t* cr, int w, int h,
                                        int wpad) {
  return clip_mass_impl(y, cb, cr, w, h, wpad, wpad / 2, 0);
}

// Same-grid layout: chroma planes share Y's geometry and stride (the
// scaled raw decode's effective-4:4:4 output).
PICHA_API double picha_raw444_clip_mass(const uint8_t* y, const uint8_t* cb,
                                        const uint8_t* cr, int w, int h,
                                        int wpad) {
  return clip_mass_impl(y, cb, cr, w, h, wpad, wpad, 1);
}
