// PNG scanline filter reconstruction and application.
//
// The PNG filter pass is the one inherently row-sequential stage of the
// PNG pipeline (filters Up/Average/Paeth reference the previous row,
// Sub/Average/Paeth the previous pixel), so it runs on the host while
// the TPU handles everything downstream (bit expansion, palette,
// colour mapping). Reference behaviour: libpng's reconstruction as
// driven by src/pngcodec.cc; this is an independent implementation of
// the PNG spec (RFC 2083 §6).
#include <cstdlib>
#include <cstring>

#include "picha_native.h"

namespace {

inline uint8_t paeth_predict(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return (uint8_t)a;
  if (pb <= pc) return (uint8_t)b;
  return (uint8_t)c;
}

void unfilter_row(uint8_t type, const uint8_t* in, uint8_t* out,
                  const uint8_t* prev, int rowbytes, int bpp) {
  switch (type) {
    case 0:  // None
      memcpy(out, in, rowbytes);
      break;
    case 1:  // Sub
      for (int i = 0; i < bpp; ++i) out[i] = in[i];
      for (int i = bpp; i < rowbytes; ++i) out[i] = (uint8_t)(in[i] + out[i - bpp]);
      break;
    case 2:  // Up
      if (prev)
        for (int i = 0; i < rowbytes; ++i) out[i] = (uint8_t)(in[i] + prev[i]);
      else
        memcpy(out, in, rowbytes);
      break;
    case 3:  // Average
      for (int i = 0; i < rowbytes; ++i) {
        int a = i >= bpp ? out[i - bpp] : 0;
        int b = prev ? prev[i] : 0;
        out[i] = (uint8_t)(in[i] + ((a + b) >> 1));
      }
      break;
    case 4:  // Paeth
      for (int i = 0; i < rowbytes; ++i) {
        int a = i >= bpp ? out[i - bpp] : 0;
        int b = prev ? prev[i] : 0;
        int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
        out[i] = (uint8_t)(in[i] + paeth_predict(a, b, c));
      }
      break;
  }
}

void filter_row(uint8_t type, const uint8_t* in, uint8_t* out,
                const uint8_t* prev, int rowbytes, int bpp) {
  switch (type) {
    case 0:
      memcpy(out, in, rowbytes);
      break;
    case 1:
      for (int i = 0; i < rowbytes; ++i)
        out[i] = (uint8_t)(in[i] - (i >= bpp ? in[i - bpp] : 0));
      break;
    case 2:
      for (int i = 0; i < rowbytes; ++i)
        out[i] = (uint8_t)(in[i] - (prev ? prev[i] : 0));
      break;
    case 3:
      for (int i = 0; i < rowbytes; ++i) {
        int a = i >= bpp ? in[i - bpp] : 0;
        int b = prev ? prev[i] : 0;
        out[i] = (uint8_t)(in[i] - ((a + b) >> 1));
      }
      break;
    case 4:
      for (int i = 0; i < rowbytes; ++i) {
        int a = i >= bpp ? in[i - bpp] : 0;
        int b = prev ? prev[i] : 0;
        int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
        out[i] = (uint8_t)(in[i] - paeth_predict(a, b, c));
      }
      break;
  }
}

// libpng-style heuristic: minimise the sum of absolute signed deltas.
uint32_t row_cost(const uint8_t* row, int rowbytes) {
  uint32_t s = 0;
  for (int i = 0; i < rowbytes; ++i) {
    int8_t v = (int8_t)row[i];
    s += v < 0 ? -v : v;
  }
  return s;
}

}  // namespace

PICHA_API int picha_png_unfilter(const uint8_t* in, uint8_t* out, int height,
                                 int rowbytes, int bpp) {
  const uint8_t* prev = nullptr;
  for (int y = 0; y < height; ++y) {
    const uint8_t* src = in + (size_t)y * (rowbytes + 1);
    uint8_t* dst = out + (size_t)y * rowbytes;
    uint8_t type = src[0];
    if (type > 4) return -1;
    unfilter_row(type, src + 1, dst, prev, rowbytes, bpp);
    prev = dst;
  }
  return 0;
}

PICHA_API int picha_png_filter(const uint8_t* in, uint8_t* out, int height,
                               int rowbytes, int bpp, int strategy) {
  if (strategy > 4) strategy = -1;  // unknown strategies fall back to adaptive
  uint8_t* scratch =
      strategy < 0 ? (uint8_t*)malloc((size_t)rowbytes) : nullptr;
  const uint8_t* prev = nullptr;
  for (int y = 0; y < height; ++y) {
    const uint8_t* src = in + (size_t)y * rowbytes;
    uint8_t* dst = out + (size_t)y * (rowbytes + 1);
    if (strategy >= 0 && strategy <= 4) {
      dst[0] = (uint8_t)strategy;
      filter_row((uint8_t)strategy, src, dst + 1, prev, rowbytes, bpp);
    } else {
      // adaptive: try each filter, keep the cheapest
      uint32_t best_cost = ~0u;
      int best = 0;
      for (int t = 0; t <= 4; ++t) {
        filter_row((uint8_t)t, src, scratch, prev, rowbytes, bpp);
        uint32_t c = row_cost(scratch, rowbytes);
        if (c < best_cost) {
          best_cost = c;
          best = t;
          memcpy(dst + 1, scratch, rowbytes);
        }
      }
      dst[0] = (uint8_t)best;
    }
    prev = src;
  }
  free(scratch);
  return 0;
}
