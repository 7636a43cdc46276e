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
  uint32_t acc = 0;
  int nbits = 0;
  BitReaderMSB(const uint8_t* d, size_t n) : p(d), len(n) {}
  int read(int width) {
    while (nbits < width) {
      if (pos >= len) return -1;
      acc = (acc << 8) | p[pos++];
      nbits += 8;
    }
    int v = (int)((acc >> (nbits - width)) & ((1u << width) - 1));
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
  // string table: prefix link + suffix byte
  std::vector<int> prefix(4096, -1);
  std::vector<uint8_t> suffix(4096, 0);
  std::vector<uint8_t> stack;
  stack.reserve(4096);

  BitReaderMSB br(src, srclen);
  size_t written = 0;
  int width = 9;
  int next = kFirst;
  int old_code = -1;

  auto emit = [&](int code) -> bool {
    stack.clear();
    while (code >= kFirst) {
      if (code >= next) return false;
      stack.push_back(suffix[code]);
      code = prefix[code];
    }
    stack.push_back((uint8_t)code);
    if (written + stack.size() > outcap) return false;
    for (size_t i = stack.size(); i-- > 0;) out[written++] = stack[i];
    return true;
  };
  auto first_byte = [&](int code) -> uint8_t {
    while (code >= kFirst) code = prefix[code];
    return (uint8_t)code;
  };

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
      if (written >= outcap) return -2;
      out[written++] = (uint8_t)code;
      old_code = code;
    } else {
      if (code < next) {
        if (!emit(code)) return -2;
        if (next < 4096) {
          prefix[next] = old_code;
          suffix[next] = first_byte(code);
          ++next;
        }
      } else if (code == next) {  // KwKwK
        uint8_t fb = first_byte(old_code);
        if (next < 4096) {
          prefix[next] = old_code;
          suffix[next] = fb;
          ++next;
        }
        if (!emit(code)) return -2;
      } else {
        return -1;
      }
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

PICHA_API int picha_lzw_encode(const uint8_t* src, size_t srclen, uint8_t** out,
                               size_t* outlen) {
  // hash-table keyed (prefix_code << 8 | byte) -> code
  constexpr int kHashSize = 1 << 14;
  std::vector<int32_t> hash_key(kHashSize, -1);
  std::vector<int16_t> hash_val(kHashSize, 0);
  auto clear_table = [&]() { std::fill(hash_key.begin(), hash_key.end(), -1); };

  BitWriterMSB bw;
  bw.out.reserve(srclen / 2 + 64);
  int width = 9;
  int next = kFirst;

  bw.write(kClear, width);
  clear_table();

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
    while (hash_key[slot] != -1) {
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
  if (cur >= 0) bw.write(cur, width);
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
    if (n >= 0) {
      size_t cnt = (size_t)n + 1;
      if (i + cnt > srclen || w + cnt > outcap) return -1;
      memcpy(out + w, src + i, cnt);
      i += cnt;
      w += cnt;
    } else if (n != -128) {
      size_t cnt = (size_t)(1 - n);
      if (i >= srclen || w + cnt > outcap) return -1;
      memset(out + w, src[i++], cnt);
      w += cnt;
    }
  }
  *outlen = w;
  return 0;
}
