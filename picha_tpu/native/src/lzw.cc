// TIFF-variant LZW codec (TIFF 6.0 §13) + PackBits decode.
//
// MSB-first bit packing, 9→12-bit codes with "early change" width
// bumps, ClearCode=256, EOI=257. Used by the TIFF codec for the
// reference's lzw compression option (src/tiffcodec.cc:413-431); this
// is an independent implementation from the TIFF 6.0 spec.
#include <cstdlib>
#include <cstring>
#include <vector>

#include "picha_native.h"

namespace {

constexpr int kClear = 256;
constexpr int kEoi = 257;
constexpr int kFirst = 258;
constexpr int kMaxCode = 4094;  // encoder clears before table overflows

struct BitReaderMSB {
  const uint8_t* p;
  size_t len, pos = 0;
  uint64_t acc = 0;  // top `nbits` bits valid (left-aligned)
  int nbits = 0;
  BitReaderMSB(const uint8_t* d, size_t n) : p(d), len(n) {}
  int read(int width) {
    if (nbits < width) {
      if (pos + 8 <= len) {
        // bulk refill: one 8-byte byteswapped load tops the
        // accumulator up to >= 56 bits (one load per ~6 codes instead
        // of a bounds-checked byte per iteration — same trick as the
        // jpegentropy refill)
        uint64_t w;
        memcpy(&w, p + pos, 8);
#if defined(__GNUC__) || defined(__clang__)
        w = __builtin_bswap64(w);
#else
        w = ((w & 0xffull) << 56) | ((w & 0xff00ull) << 40) |
            ((w & 0xff0000ull) << 24) | ((w & 0xff000000ull) << 8) |
            ((w >> 8) & 0xff000000ull) | ((w >> 24) & 0xff0000ull) |
            ((w >> 40) & 0xff00ull) | (w >> 56);
#endif
        int take = (64 - nbits) >> 3;  // whole bytes that fit
        uint64_t ins = (w >> nbits) & (~0ull << (64 - nbits - 8 * take));
        acc |= ins;
        nbits += 8 * take;
        pos += (size_t)take;
      } else {
        while (nbits < width) {
          if (pos >= len) return -1;
          acc |= (uint64_t)p[pos++] << (56 - nbits);
          nbits += 8;
        }
      }
    }
    int v = (int)(acc >> (64 - width));
    acc <<= width;
    nbits -= width;
    return v;
  }
};

struct BitWriterMSB {
  std::vector<uint8_t> out;
  uint32_t acc = 0;
  int nbits = 0;
  void write(int code, int width) {
    acc = (acc << width) | (uint32_t)code;
    nbits += width;
    while (nbits >= 8) {
      out.push_back((uint8_t)(acc >> (nbits - 8)));
      nbits -= 8;
    }
  }
  void flush() {
    if (nbits > 0) {
      out.push_back((uint8_t)(acc << (8 - nbits)));
      nbits = 0;
    }
  }
};

}  // namespace

PICHA_API int picha_lzw_decode(const uint8_t* src, size_t srclen, uint8_t* out,
                               size_t outcap, size_t* outlen) {
  // Every table entry's expansion already exists CONTIGUOUSLY in the
  // decoded output (entry = previous emission + first byte of the one
  // after it, and emissions are back to back), so the table stores
  // (output position, length) and emission is one forward copy — no
  // prefix-chain walk, no reversal stack (the usual 2-4x over the
  // linked-table form).
  std::vector<uint32_t> tpos(4096, 0);
  std::vector<uint32_t> tlen(4096, 0);

  BitReaderMSB br(src, srclen);
  size_t written = 0;
  int width = 9;
  int next = kFirst;
  int old_code = -1;
  size_t w_old = 0;   // where old_code's expansion was just written
  size_t len_old = 0;

  for (;;) {
    int code = br.read(width);
    if (code < 0 || code == kEoi) break;
    if (code == kClear) {
      width = 9;
      next = kFirst;
      old_code = -1;
      continue;
    }
    if (old_code < 0) {
      if (code >= kFirst) return -1;
      if (written >= outcap) break;  // full: ignore the rest (libtiff)
      out[written] = (uint8_t)code;
      w_old = written;
      len_old = 1;
      written += 1;
      old_code = code;
    } else {
      if (code > next) return -1;           // undefined code
      if (code == next && next >= 4096) return -1;
      if (next < 4096) {
        // new entry = expansion(old) + first(current emission); both
        // sit adjacent in the output: [w_old, w_old + len_old + 1)
        tpos[next] = (uint32_t)w_old;
        tlen[next] = (uint32_t)(len_old + 1);
        ++next;
      }
      size_t n, sp;
      if (code < 256) {
        n = 1;
        sp = 0;
        if (written >= outcap) break;  // full: truncate like libtiff
        out[written] = (uint8_t)code;
      } else {
        n = tlen[code];
        sp = tpos[code];
        if (n == 0) return -1;  // stale entry after a clear
        if (written + n > outcap) {
          // libtiff LZWDecode fills exactly the requested bytes and
          // ignores the remainder (strips padded to full RowsPerStrip
          // are common) — hard-failing here rejected files libtiff
          // reads fine
          n = outcap - written;
          for (size_t i = 0; i < n; ++i) out[written + i] = out[sp + i];
          written += n;
          break;
        }
        if (sp + n <= written) {
          memcpy(out + written, out + sp, n);
        } else {  // KwKwK: the entry's last byte IS its first output byte
          for (size_t i = 0; i < n; ++i) out[written + i] = out[sp + i];
        }
      }
      w_old = written;
      len_old = n;
      written += n;
      old_code = code;
      // TIFF early change (calibrated against libtiff): the decoder
      // widens when its table reaches (1<<w)-1; the encoder — whose
      // table leads by one entry — widens at (1<<w)
      if (next == (1 << width) - 1 && width < 12) ++width;
    }
  }
  *outlen = written;
  return 0;
}

// Batched strip decode: one crossing for a whole TIFF image's strips
// (per-call ctypes overhead measured ~50 us; 52 small strips cost more
// in call overhead than in LZW work). Segments are independent LZW
// streams (TIFF resets per strip). Returns 0, or the failing segment's
// (index+1) negated.
PICHA_API int picha_lzw_decode_multi(const uint8_t* src,
                                     const uint64_t* in_off,
                                     const uint64_t* in_len, int n,
                                     uint8_t* out, const uint64_t* out_off,
                                     const uint64_t* out_cap,
                                     uint64_t* out_len) {
  for (int i = 0; i < n; ++i) {
    size_t got = 0;
    int rc = picha_lzw_decode(src + in_off[i], (size_t)in_len[i],
                              out + out_off[i], (size_t)out_cap[i], &got);
    if (rc != 0) return -(i + 1);
    out_len[i] = got;
  }
  return 0;
}

PICHA_API int picha_lzw_encode(const uint8_t* src, size_t srclen, uint8_t** out,
                               size_t* outlen) {
  // hash-table keyed (prefix_code << 8 | byte) -> code; dictionary
  // clears bump a generation stamp instead of memsetting the table
  // (noise-heavy strips clear every ~4 KB — a 64 KB fill per clear
  // dominated the encode)
  constexpr int kHashSize = 1 << 14;
  std::vector<int32_t> hash_key(kHashSize, -1);
  std::vector<int16_t> hash_val(kHashSize, 0);
  std::vector<uint32_t> hash_gen(kHashSize, 0);
  uint32_t gen = 1;
  auto clear_table = [&]() { ++gen; };

  BitWriterMSB bw;
  bw.out.reserve(srclen / 2 + 64);
  int width = 9;
  int next = kFirst;

  bw.write(kClear, width);

  size_t i = 0;
  int cur = -1;
  while (i < srclen) {
    uint8_t c = src[i++];
    if (cur < 0) {
      cur = c;
      continue;
    }
    int32_t key = (cur << 8) | c;
    int slot = (int)((key * 0x9E3779B1u) >> 18) & (kHashSize - 1);
    int found = -1;
    while (hash_gen[slot] == gen) {
      if (hash_key[slot] == key) {
        found = hash_val[slot];
        break;
      }
      slot = (slot + 1) & (kHashSize - 1);
    }
    if (found >= 0) {
      cur = found;
    } else {
      bw.write(cur, width);
      hash_key[slot] = key;
      hash_val[slot] = (int16_t)next;
      hash_gen[slot] = gen;
      ++next;
      // see decoder note: encoder widens at (1<<w)
      if (next == (1 << width) && width < 12) ++width;
      if (next > kMaxCode) {
        bw.write(kClear, width);
        width = 9;
        next = kFirst;
        clear_table();
      }
      cur = c;
    }
  }
  if (cur >= 0) {
    bw.write(cur, width);
    // libtiff LZWPostEncode: the decoder ADDS a table entry for this
    // final code (and may widen at (1<<w)-1) before it reads EOI, so
    // the encoder must mirror the bump or streams whose insertion
    // count lands exactly on a width boundary (253/765/1789 since the
    // last clear) emit EOI one bit too narrow and fail to decode
    ++next;
    if (next == (1 << width) && width < 12) ++width;
  }
  bw.write(kEoi, width);
  bw.flush();

  *outlen = bw.out.size();
  *out = (uint8_t*)malloc(bw.out.size());
  if (!*out) return -2;
  memcpy(*out, bw.out.data(), bw.out.size());
  return 0;
}

PICHA_API int picha_packbits_decode(const uint8_t* src, size_t srclen,
                                    uint8_t* out, size_t outcap,
                                    size_t* outlen) {
  size_t i = 0, w = 0;
  while (i < srclen) {
    int8_t n = (int8_t)src[i++];
    // output overruns clamp and stop (libtiff PackBitsDecode discards
    // the excess with a warning — overlong padded strips are common);
    // input truncation stays a hard error
    if (n >= 0) {
      size_t cnt = (size_t)n + 1;
      if (i + cnt > srclen) return -1;
      size_t wr = cnt;
      if (w + wr > outcap) wr = outcap - w;
      memcpy(out + w, src + i, wr);
      i += cnt;
      w += wr;
      if (wr < cnt) break;
    } else if (n != -128) {
      size_t cnt = (size_t)(1 - n);
      if (i >= srclen) return -1;
      size_t wr = cnt;
      if (w + wr > outcap) wr = outcap - w;
      memset(out + w, src[i++], wr);
      w += wr;
      if (wr < cnt) break;
    }
  }
  *outlen = w;
  return 0;
}
