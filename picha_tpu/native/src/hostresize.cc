// Host separable resize — the native fast path for single images and
// the hybrid scheduler's host worker.
//
// Same architecture as the reference's resizer (src/resize.cc:66-134):
// horizontal pass unpacks to float32 and accumulates tap windows, a
// vertical pass accumulates and packs. The weight windows arrive from
// Python (ops/resize.py _iter_contribs) so the tap values are the
// reference's float32 construction bit-for-bit; accumulation is
// sequential in tap order like resize.cc:111-115, and pack/unpack use
// the pinned numerics v/255.0f and floor(clip(v*255+0.5, 0, 255))
// (reference picha.h:98-114).
//
// Windows are uniform: `ktaps` taps per output index, starting at
// start[i], zero-padded — the same banded layout the XLA plan uses.
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <vector>

#include "picha_native.h"

PICHA_API int picha_resize_u8(const uint8_t* src, int sh, int sw, int ch,
                              uint8_t* dst, int dh, int dw,
                              const int32_t* xstart, const float* xw,
                              int xk, const int32_t* ystart,
                              const float* yw, int yk) {
  if (sh <= 0 || sw <= 0 || ch <= 0 || dh <= 0 || dw <= 0) return 1;
  // horizontal pass: (sh, sw, ch) u8 -> (sh, dw, ch) f32
  std::vector<float> tmp((size_t)sh * dw * ch);
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + (size_t)y * sw * ch;
    float* out = tmp.data() + (size_t)y * dw * ch;
    for (int ox = 0; ox < dw; ++ox) {
      const float* w = xw + (size_t)ox * xk;
      const uint8_t* p = row + (size_t)xstart[ox] * ch;
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < xk; ++k)
          acc += w[k] * ((float)p[(size_t)k * ch + c] * inv);
        out[(size_t)ox * ch + c] = acc;
      }
    }
  }
  // vertical pass: (sh, dw, ch) f32 -> (dh, dw, ch) u8
  for (int oy = 0; oy < dh; ++oy) {
    const float* w = yw + (size_t)oy * yk;
    const float* base = tmp.data() + (size_t)ystart[oy] * dw * ch;
    uint8_t* out = dst + (size_t)oy * dw * ch;
    for (int i = 0; i < dw * ch; ++i) {
      float acc = 0.0f;
      for (int k = 0; k < yk; ++k)
        acc += w[k] * base[(size_t)k * dw * ch + i];
      float v = acc * 255.0f + 0.5f;
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      out[i] = (uint8_t)(int)std::floor(v);
    }
  }
  return 0;
}
