// libdeflate-backed whole-buffer zlib inflate/deflate.
//
// The reference streams PNG rows through libpng/zlib (pngcodec.cc:
// 172-176, 391-392); this rebuild always holds the complete IDAT /
// TIFF-strip payload in memory, which is exactly libdeflate's
// whole-buffer model — measured 2-3x faster than zlib on both
// directions at matched levels. Compiled with WITH_LIBDEFLATE when the
// system library is present; otherwise every entry point reports
// "unavailable" and the Python layer stays on zlib.
#include <cstddef>
#include <cstdint>

#ifdef WITH_LIBDEFLATE
#include <libdeflate.h>
#endif

#ifndef PICHA_API
#define PICHA_API extern "C" __attribute__((visibility("default")))
#endif

// returns 0 ok (actual filled), 1 corrupt stream, 2 output larger than
// dstcap (caller falls back to zlib to keep overlong-stream behavior),
// 3 libdeflate unavailable.
PICHA_API int picha_zlib_inflate(const uint8_t* src, size_t srclen,
                                 uint8_t* dst, size_t dstcap,
                                 size_t* actual) {
#ifdef WITH_LIBDEFLATE
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (!d) return 3;
  size_t out = 0;
  libdeflate_result r =
      libdeflate_zlib_decompress(d, src, srclen, dst, dstcap, &out);
  libdeflate_free_decompressor(d);
  if (r == LIBDEFLATE_SUCCESS) {
    *actual = out;
    return 0;
  }
  return r == LIBDEFLATE_INSUFFICIENT_SPACE ? 2 : 1;
#else
  (void)src; (void)srclen; (void)dst; (void)dstcap; (void)actual;
  return 3;
#endif
}

// level 0..12 (zlib's 0..9 map 1:1; 10-12 are libdeflate extras).
// returns compressed size, or -1 dstcap too small, -3 unavailable.
PICHA_API long long picha_zlib_deflate(const uint8_t* src, size_t srclen,
                                       int level, uint8_t* dst,
                                       size_t dstcap) {
#ifdef WITH_LIBDEFLATE
  if (level < 0) level = 0;
  if (level > 12) level = 12;
  libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  if (!c) return -3;
  size_t n = libdeflate_zlib_compress(c, src, srclen, dst, dstcap);
  libdeflate_free_compressor(c);
  return n == 0 ? -1 : (long long)n;
#else
  (void)src; (void)srclen; (void)level; (void)dst; (void)dstcap;
  return -3;
#endif
}

// worst-case output size for picha_zlib_deflate at `level`.
PICHA_API size_t picha_zlib_deflate_bound(size_t srclen, int level) {
#ifdef WITH_LIBDEFLATE
  if (level < 0) level = 0;
  if (level > 12) level = 12;
  libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  size_t b = c ? libdeflate_zlib_compress_bound(c, srclen)
               : srclen + srclen / 2 + 256;
  if (c) libdeflate_free_compressor(c);
  return b;
#else
  (void)level;
  return srclen + srclen / 2 + 256;
#endif
}
