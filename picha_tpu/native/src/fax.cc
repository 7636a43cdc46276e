// CCITT T.4 / T.6 bilevel decoder for TIFF compressions 2 (modified
// Huffman RLE), 3 (Group 3, 1-D and 2-D) and 4 (Group 4, MMR).
//
// The reference reaches these through TIFFReadRGBAImageOriented — any
// fax TIFF libtiff can read, it decodes (/root/reference/src/
// tiffcodec.cc:130-137). This is an independent implementation from
// the T.4/T.6 code tables; entropy decode is inherently serial per
// row, so it stays on the host (SURVEY.md §7 hard part (b)) and the
// pixel work downstream runs in numpy/XLA.
//
// Output is one byte per pixel, 0 = white, 1 = black (photometric
// interpretation is applied by the Python caller). Bits are consumed
// MSB-first; FillOrder=2 input must be bit-reversed by the caller.
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "picha_native.h"

namespace {

struct Code {
  short run;
  unsigned char len;
  unsigned short bits;  // left-aligned within len
};

// T.4 terminating + makeup codes, white runs
static const Code kWhite[] = {
    {0, 8, 0x35},    {1, 6, 0x07},    {2, 4, 0x07},    {3, 4, 0x08},
    {4, 4, 0x0B},    {5, 4, 0x0C},    {6, 4, 0x0E},    {7, 4, 0x0F},
    {8, 5, 0x13},    {9, 5, 0x14},    {10, 5, 0x07},   {11, 5, 0x08},
    {12, 6, 0x08},   {13, 6, 0x03},   {14, 6, 0x34},   {15, 6, 0x35},
    {16, 6, 0x2A},   {17, 6, 0x2B},   {18, 7, 0x27},   {19, 7, 0x0C},
    {20, 7, 0x08},   {21, 7, 0x17},   {22, 7, 0x03},   {23, 7, 0x04},
    {24, 7, 0x28},   {25, 7, 0x2B},   {26, 7, 0x13},   {27, 7, 0x24},
    {28, 7, 0x18},   {29, 8, 0x02},   {30, 8, 0x03},   {31, 8, 0x1A},
    {32, 8, 0x1B},   {33, 8, 0x12},   {34, 8, 0x13},   {35, 8, 0x14},
    {36, 8, 0x15},   {37, 8, 0x16},   {38, 8, 0x17},   {39, 8, 0x28},
    {40, 8, 0x29},   {41, 8, 0x2A},   {42, 8, 0x2B},   {43, 8, 0x2C},
    {44, 8, 0x2D},   {45, 8, 0x04},   {46, 8, 0x05},   {47, 8, 0x0A},
    {48, 8, 0x0B},   {49, 8, 0x52},   {50, 8, 0x53},   {51, 8, 0x54},
    {52, 8, 0x55},   {53, 8, 0x24},   {54, 8, 0x25},   {55, 8, 0x58},
    {56, 8, 0x59},   {57, 8, 0x5A},   {58, 8, 0x5B},   {59, 8, 0x4A},
    {60, 8, 0x4B},   {61, 8, 0x32},   {62, 8, 0x33},   {63, 8, 0x34},
    // makeup
    {64, 5, 0x1B},   {128, 5, 0x12},  {192, 6, 0x17},  {256, 7, 0x37},
    {320, 8, 0x36},  {384, 8, 0x37},  {448, 8, 0x64},  {512, 8, 0x65},
    {576, 8, 0x68},  {640, 8, 0x67},  {704, 9, 0xCC},  {768, 9, 0xCD},
    {832, 9, 0xD2},  {896, 9, 0xD3},  {960, 9, 0xD4},  {1024, 9, 0xD5},
    {1088, 9, 0xD6}, {1152, 9, 0xD7}, {1216, 9, 0xD8}, {1280, 9, 0xD9},
    {1344, 9, 0xDA}, {1408, 9, 0xDB}, {1472, 9, 0x98}, {1536, 9, 0x99},
    {1600, 9, 0x9A}, {1664, 6, 0x18}, {1728, 9, 0x9B},
};

// T.4 terminating + makeup codes, black runs
static const Code kBlack[] = {
    {0, 10, 0x37},   {1, 3, 0x02},    {2, 2, 0x03},    {3, 2, 0x02},
    {4, 3, 0x03},    {5, 4, 0x03},    {6, 4, 0x02},    {7, 5, 0x03},
    {8, 6, 0x05},    {9, 6, 0x04},    {10, 7, 0x04},   {11, 7, 0x05},
    {12, 7, 0x07},   {13, 8, 0x04},   {14, 8, 0x07},   {15, 9, 0x18},
    {16, 10, 0x17},  {17, 10, 0x18},  {18, 10, 0x08},  {19, 11, 0x67},
    {20, 11, 0x68},  {21, 11, 0x6C},  {22, 11, 0x37},  {23, 11, 0x28},
    {24, 11, 0x17},  {25, 11, 0x18},  {26, 12, 0xCA},  {27, 12, 0xCB},
    {28, 12, 0xCC},  {29, 12, 0xCD},  {30, 12, 0x68},  {31, 12, 0x69},
    {32, 12, 0x6A},  {33, 12, 0x6B},  {34, 12, 0xD2},  {35, 12, 0xD3},
    {36, 12, 0xD4},  {37, 12, 0xD5},  {38, 12, 0xD6},  {39, 12, 0xD7},
    {40, 12, 0x6C},  {41, 12, 0x6D},  {42, 12, 0xDA},  {43, 12, 0xDB},
    {44, 12, 0x54},  {45, 12, 0x55},  {46, 12, 0x56},  {47, 12, 0x57},
    {48, 12, 0x64},  {49, 12, 0x65},  {50, 12, 0x52},  {51, 12, 0x53},
    {52, 12, 0x24},  {53, 12, 0x37},  {54, 12, 0x38},  {55, 12, 0x27},
    {56, 12, 0x28},  {57, 12, 0x58},  {58, 12, 0x59},  {59, 12, 0x2B},
    {60, 12, 0x2C},  {61, 12, 0x5A},  {62, 12, 0x66},  {63, 12, 0x67},
    // makeup
    {64, 10, 0x0F},   {128, 12, 0xC8},  {192, 12, 0xC9},  {256, 12, 0x5B},
    {320, 12, 0x33},  {384, 12, 0x34},  {448, 12, 0x35},  {512, 13, 0x6C},
    {576, 13, 0x6D},  {640, 13, 0x4A},  {704, 13, 0x4B},  {768, 13, 0x4C},
    {832, 13, 0x4D},  {896, 13, 0x72},  {960, 13, 0x73},  {1024, 13, 0x74},
    {1088, 13, 0x75}, {1152, 13, 0x76}, {1216, 13, 0x77}, {1280, 13, 0x52},
    {1344, 13, 0x53}, {1408, 13, 0x54}, {1472, 13, 0x55}, {1536, 13, 0x5A},
    {1600, 13, 0x5B}, {1664, 13, 0x64}, {1728, 13, 0x65},
};

// extended makeup codes (T.4 §4.2.1.3), shared by both colours
static const Code kExt[] = {
    {1792, 11, 0x08}, {1856, 11, 0x0C}, {1920, 11, 0x0D},
    {1984, 12, 0x12}, {2048, 12, 0x13}, {2112, 12, 0x14},
    {2176, 12, 0x15}, {2240, 12, 0x16}, {2304, 12, 0x17},
    {2368, 12, 0x1C}, {2432, 12, 0x1D}, {2496, 12, 0x1E},
    {2560, 12, 0x1F},
};

constexpr int kLookupBits = 14;  // longest code is 13 bits
struct Lut {
  // value: run in low 16 bits (run+1 so 0 means invalid), len in high
  uint32_t e[1 << kLookupBits];
};

static void fill(Lut& t, const Code* codes, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    const Code& c = codes[i];
    uint32_t base = (uint32_t)c.bits << (kLookupBits - c.len);
    uint32_t span = 1u << (kLookupBits - c.len);
    for (uint32_t s = 0; s < span; ++s)
      t.e[base + s] = ((uint32_t)c.len << 16) | (uint16_t)(c.run + 1);
  }
}

struct Tables {
  Lut lut[2];  // [0]=white, [1]=black
  Tables() {
    fill(lut[0], kWhite, sizeof(kWhite) / sizeof(Code));
    fill(lut[0], kExt, sizeof(kExt) / sizeof(Code));
    fill(lut[1], kBlack, sizeof(kBlack) / sizeof(Code));
    fill(lut[1], kExt, sizeof(kExt) / sizeof(Code));
  }
};

// C++11 magic static: thread-safe one-time construction (the earlier
// bool-flag lazy init was a data race, caught by the TSAN harness)
static const Tables& tables() {
  static const Tables t;
  return t;
}

struct Bits {
  const uint8_t* p;
  size_t nbits;
  size_t pos = 0;

  uint32_t peek(int k) const {
    uint32_t v = 0;
    for (int i = 0; i < k; ++i) {
      size_t b = pos + i;
      int bit = 0;
      if (b < nbits) bit = (p[b >> 3] >> (7 - (b & 7))) & 1;
      v = (v << 1) | bit;
    }
    return v;
  }
  void skip(int k) { pos += k; }
  bool exhausted() const { return pos >= nbits; }
};

static int err_out(char** err, const char* msg) {
  if (err) *err = strdup(msg);
  return 1;
}

// Decode one MH run of the given colour. Returns total run (makeup
// chains included) or -1 on invalid code.
static int decode_run(Bits& br, int colour) {
  const Lut* g_lut = tables().lut;
  int total = 0;
  for (;;) {
    uint32_t key = br.peek(kLookupBits);
    uint32_t e = g_lut[colour].e[key];
    if ((e & 0xFFFF) == 0) return -1;
    int run = (int)(e & 0xFFFF) - 1;
    br.skip((int)(e >> 16));
    total += run;
    if (run < 64) return total;  // terminating code ends the run
    if (br.exhausted()) return total;
  }
}

// Skip fill bits and one EOL (000000000001). Returns 1 if an EOL was
// consumed, 0 if the next bits are not fill+EOL (position unchanged),
// -1 at end of data.
static int try_eol(Bits& br) {
  size_t save = br.pos;
  int zeros = 0;
  while (!br.exhausted() && br.peek(1) == 0 && zeros < 4096) {
    br.skip(1);
    ++zeros;
  }
  if (br.exhausted()) return -1;
  if (zeros >= 11 && br.peek(1) == 1) {
    br.skip(1);
    return 1;
  }
  br.pos = save;
  return 0;
}

// 2-D vertical/horizontal/pass mode codes (7-bit peek)
enum Mode { M_INVALID, M_V0, M_VR1, M_VR2, M_VR3, M_VL1, M_VL2, M_VL3,
            M_H, M_P, M_EXT, M_EOLISH };

static Mode read_mode(Bits& br) {
  if (br.peek(1) == 1) { br.skip(1); return M_V0; }
  if (br.peek(3) == 0x1) { br.skip(3); return M_H; }    // 001
  if (br.peek(3) == 0x3) { br.skip(3); return M_VR1; }  // 011
  if (br.peek(3) == 0x2) { br.skip(3); return M_VL1; }  // 010
  if (br.peek(4) == 0x1) { br.skip(4); return M_P; }    // 0001
  if (br.peek(6) == 0x3) { br.skip(6); return M_VR2; }  // 000011
  if (br.peek(6) == 0x2) { br.skip(6); return M_VL2; }  // 000010
  if (br.peek(7) == 0x3) { br.skip(7); return M_VR3; }  // 0000011
  if (br.peek(7) == 0x2) { br.skip(7); return M_VL3; }  // 0000010
  if (br.peek(7) == 0x1) { br.skip(7); return M_EXT; }  // 0000001
  return br.peek(7) == 0 ? M_EOLISH : M_INVALID;
}

// Paint a row from its changing elements. trans holds ascending
// positions where colour flips, starting from white.
static void paint(uint8_t* row, int width, const std::vector<int>& trans) {
  int col = 0, colour = 0;
  for (size_t i = 0; i < trans.size() && col < width; ++i) {
    int t = trans[i] < width ? trans[i] : width;
    // crafted 2-D streams can code non-monotonic elements; a t < col
    // here would cast a negative span to a near-SIZE_MAX memset
    if (t < col) t = col;
    if (colour) memset(row + col, 1, (size_t)(t - col));
    else memset(row + col, 0, (size_t)(t - col));
    col = t;
    colour ^= 1;
  }
  if (col < width) memset(row + col, colour, (size_t)(width - col));
}

// Decode one 1-D (MH) row into changing elements.
static int decode_row_1d(Bits& br, int width, std::vector<int>& trans) {
  trans.clear();
  int col = 0, colour = 0;
  while (col < width) {
    int run = decode_run(br, colour);
    if (run < 0) return -1;
    col += run;
    if (col > width) col = width;
    trans.push_back(col);
    colour ^= 1;
    if (br.exhausted() && col < width) return -1;
  }
  return 0;
}

// Decode one 2-D row given the reference row's changing elements.
static int decode_row_2d(Bits& br, int width, const std::vector<int>& ref,
                         std::vector<int>& trans) {
  trans.clear();
  int a0 = -1, colour = 0;
  while (a0 < width) {
    // b1: first changing element in ref > a0 with opposite colour to
    // a0's colour; ref[i] flips to black for even i (rows start white)
    int b1 = width, b2 = width;
    {
      size_t k = 0;
      // find first ref transition > a0 whose index parity matches colour
      while (k < ref.size() && (ref[k] <= a0 || ((k & 1) != (size_t)colour)))
        ++k;
      if (k < ref.size()) {
        b1 = ref[k];
        b2 = (k + 1 < ref.size()) ? ref[k + 1] : width;
      }
    }
    Mode m = read_mode(br);
    switch (m) {
      case M_P:
        a0 = b2;  // pass: colour continues through b2, no transition
        break;
      case M_H: {
        int start = a0 < 0 ? 0 : a0;
        int r1 = decode_run(br, colour);
        int r2 = decode_run(br, colour ^ 1);
        if (r1 < 0 || r2 < 0) return -1;
        int a1 = start + r1;
        if (a1 > width) a1 = width;
        // T.4 requires ascending changing elements; crafted streams
        // can violate it (confirmed heap-corrupting memset in paint)
        if (!trans.empty() && a1 < trans.back()) a1 = trans.back();
        int a2 = a1 + r2;
        if (a2 > width) a2 = width;
        trans.push_back(a1);
        trans.push_back(a2);
        a0 = a2;
        break;
      }
      case M_V0:
      case M_VR1: case M_VR2: case M_VR3:
      case M_VL1: case M_VL2: case M_VL3: {
        int d = 0;
        if (m == M_VR1) d = 1; else if (m == M_VR2) d = 2;
        else if (m == M_VR3) d = 3; else if (m == M_VL1) d = -1;
        else if (m == M_VL2) d = -2; else if (m == M_VL3) d = -3;
        int a1 = b1 + d;
        if (a1 < 0) a1 = 0;
        if (a1 > width) a1 = width;
        // keep the element list ascending under crafted VL moves
        if (!trans.empty() && a1 < trans.back()) a1 = trans.back();
        trans.push_back(a1);
        a0 = a1;
        colour ^= 1;
        break;
      }
      case M_EXT:
        return -2;  // uncompressed extension mode: unsupported
      case M_EOLISH:
        return 1;   // row ends at EOL/EOFB (short row: pad white)
      default:
        return -1;
    }
    if (br.exhausted()) break;
  }
  return 0;
}

}  // namespace

PICHA_API int picha_fax_decode(const uint8_t* src, size_t len, int width,
                               int height, int comp, uint32_t options,
                               uint8_t* out, int* rows_done, char** err) {
  tables();  // force one-time table construction (thread-safe)
  if (width <= 0 || height <= 0) return err_out(err, "bad fax dimensions");
  Bits br{src, len * 8};
  std::vector<int> ref, cur;
  // imaginary all-white reference line above the first row
  ref.assign(2, width);

  const bool is_g4 = comp == 4;
  const bool g3_2d = comp == 3 && (options & 1u);
  int y = 0;
  for (; y < height; ++y) {
    bool two_d = is_g4;
    if (comp == 2) {
      // modified Huffman: rows are byte-aligned, no EOLs
      if (y > 0) br.pos = (br.pos + 7) & ~(size_t)7;
    } else if (comp == 3) {
      // consume fill + EOL; tolerate streams with no leading EOL
      int got = try_eol(br);
      if (got < 0) break;
      if (got == 1 && g3_2d) {
        if (br.exhausted()) break;
        two_d = br.peek(1) == 0;  // tag bit: 1 = 1-D, 0 = 2-D
        br.skip(1);
      } else if (got == 1) {
        // RTC: another EOL immediately follows
        size_t save = br.pos;
        if (try_eol(br) == 1) { br.pos = save; break; }
        br.pos = save;
      }
    }
    if (br.exhausted()) break;
    int rc = two_d ? decode_row_2d(br, width, ref, cur)
                   : decode_row_1d(br, width, cur);
    if (rc == -2) return err_out(err, "fax uncompressed mode unsupported");
    if (rc < 0) {
      if (y == 0) return err_out(err, "invalid fax code");
      break;  // truncated stream: stop, pad remaining rows white
    }
    paint(out + (size_t)y * width, width, cur);
    ref = cur;
  }
  // missing rows decode as white (libtiff pads and warns)
  for (int fy = y; fy < height; ++fy)
    memset(out + (size_t)fy * width, 0, (size_t)width);
  if (rows_done) *rows_done = y;
  return 0;
}
