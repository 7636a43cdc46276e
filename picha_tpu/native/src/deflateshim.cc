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
  // thread-local: many-strip TIFF/PNG decodes on the 1-core host were
  // paying an allocator round trip per strip
  static thread_local libdeflate_decompressor* d =
      libdeflate_alloc_decompressor();
  if (!d) return 3;
  size_t out = 0;
  libdeflate_result r =
      libdeflate_zlib_decompress(d, src, srclen, dst, dstcap, &out);
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
  // cache the last-used level's compressor per thread (level >= 7
  // allocates hundreds of KB of hash tables per call otherwise)
  static thread_local libdeflate_compressor* c = nullptr;
  static thread_local int c_level = -1;
  if (c_level != level) {
    if (c) libdeflate_free_compressor(c);
    c = libdeflate_alloc_compressor(level);
    c_level = c ? level : -1;
  }
  if (!c) return -3;
  size_t n = libdeflate_zlib_compress(c, src, srclen, dst, dstcap);
  return n == 0 ? -1 : (long long)n;
#else
  (void)src; (void)srclen; (void)level; (void)dst; (void)dstcap;
  return -3;
#endif
}

// crc32 (PNG chunk checksums): libdeflate's PCLMUL/SSE path runs ~10x
// zlib's table walk — chunk verification was ~2.5 ms of every 1080p
// PNG decode on this host. Returns -1 when libdeflate is absent
// (Python stays on zlib.crc32).
PICHA_API long long picha_crc32(uint32_t crc, const uint8_t* src,
                                size_t n) {
#ifdef WITH_LIBDEFLATE
  return (long long)libdeflate_crc32(crc, src, n);
#else
  (void)crc; (void)src; (void)n;
  return -1;
#endif
}

// worst-case output size for picha_zlib_deflate at `level`.
PICHA_API size_t picha_zlib_deflate_bound(size_t srclen, int level) {
#ifdef WITH_LIBDEFLATE
  (void)level;
  // libdeflate accepts NULL here (returns the worst-case over all
  // levels) — allocating a level-7+ compressor just for the bound
  // built hundreds of KB of hash tables per call
  return libdeflate_zlib_compress_bound(nullptr, srclen);
#else
  (void)level;
  return srclen + srclen / 2 + 256;
#endif
}
