// Thread-safety stress test for the native host runtime, built with
// -fsanitize=thread by native/check_tsan.sh (SURVEY.md §5.2: "run CI
// under TSAN for any host C++ codec shims").
//
// Exercises the PNG filter, LZW and JPEG entry points concurrently
// from many threads over distinct and shared (read-only) inputs; any
// hidden global mutable state (the reference's libtiff handler hazard,
// tiffcodec.cc:21-41, is the cautionary tale) trips the sanitizer.
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "picha_native.h"

namespace {
std::atomic<int> failures{0};

void worker(int seed, const uint8_t* shared_jpeg, size_t jpeg_len) {
  unsigned state = (unsigned)seed * 2654435761u + 12345u;
  auto rnd = [&]() { state = state * 1664525u + 1013904223u; return state; };

  // gap8/gap4 sparse packing on private data (init_tables-free, pure)
  {
    std::vector<int16_t> coefs(4096);
    for (auto& c : coefs) c = (rnd() % 7 == 0) ? (int16_t)(rnd() % 600) - 300 : 0;
    size_t n = coefs.size();
    std::vector<uint8_t> gaps(n + n / 255 + 2);
    std::vector<int8_t> vals(n + n / 255 + 2);
    std::vector<int32_t> ci(n);
    std::vector<int16_t> cv(n);
    size_t np_ = 0, nc = 0;
    picha_gap8_pack(coefs.data(), n, gaps.data(), vals.data(), &np_,
                    ci.data(), cv.data(), &nc);
    std::vector<uint8_t> prim(n + n / 15 + 2);
    std::vector<uint8_t> sg(n + n / 255 + 2);
    std::vector<int8_t> sv(n + n / 255 + 2);
    size_t k1 = 0, k2 = 0;
    picha_gap4_pack(coefs.data(), n, prim.data(), &k1, sg.data(), sv.data(),
                    &k2, ci.data(), cv.data(), &nc);

    // batch wire assembly (handle-based, internal scratch) — several
    // images packed concurrently per thread
    const int16_t* planes[3] = {coefs.data(), coefs.data(), coefs.data()};
    int64_t np3[3], ns3[3], nc3[3];
    void* handle = nullptr;
    if (picha_gap4_batch_begin(planes, 3, n, &handle, np3, ns3, nc3) == 0) {
      size_t bk1 = 0, bk2 = 0, bkc = 1;
      for (int j = 0; j < 3; ++j) {
        if ((size_t)np3[j] > bk1) bk1 = (size_t)np3[j];
        if ((size_t)ns3[j] > bk2) bk2 = (size_t)ns3[j];
        bkc += (size_t)nc3[j];
      }
      std::vector<uint8_t> bprim(3 * bk1);
      std::vector<uint8_t> bsg(3 * bk2);
      std::vector<int8_t> bsv(3 * bk2);
      std::vector<int32_t> bci(bkc);
      std::vector<int16_t> bcv(bkc);
      if (picha_gap4_batch_finish(handle, bprim.data(), bk1, bsg.data(),
                                  bsv.data(), bk2, bci.data(), bcv.data(),
                                  bkc) != 0)
        failures.fetch_add(1);
    } else {
      failures.fetch_add(1);
    }
  }

  // CCITT fax decode of arbitrary bits (shared static tables, read-only
  // after first init — the TSAN-interesting part)
  {
    std::vector<uint8_t> bits(256);
    for (auto& b : bits) b = (uint8_t)rnd();
    std::vector<uint8_t> out(64 * 32);
    int rows_done = 0;
    char* err = nullptr;
    for (int comp = 2; comp <= 4; ++comp) {
      if (picha_fax_decode(bits.data(), bits.size(), 64, 32, comp, comp == 3,
                           out.data(), &rows_done, &err) != 0) {
        picha_free(err);
        err = nullptr;
      }
    }
  }

  // PNG filter round trip on private data
  const int rows = 37, rowbytes = 120, bpp = 3;
  std::vector<uint8_t> img(rows * rowbytes);
  for (auto& b : img) b = (uint8_t)rnd();
  std::vector<uint8_t> filt(rows * (rowbytes + 1));
  std::vector<uint8_t> back(rows * rowbytes);
  picha_png_filter(img.data(), filt.data(), rows, rowbytes, bpp, -1);
  picha_png_unfilter(filt.data(), back.data(), rows, rowbytes, bpp);
  if (memcmp(img.data(), back.data(), img.size()) != 0) ++failures;

  // LZW round trip
  std::vector<uint8_t> data(5000 + (rnd() % 5000));
  for (auto& b : data) b = (uint8_t)(rnd() % 7);
  uint8_t* enc = nullptr;
  size_t enclen = 0;
  picha_lzw_encode(data.data(), data.size(), &enc, &enclen);
  std::vector<uint8_t> dec(data.size());
  size_t declen = 0;
  picha_lzw_decode(enc, enclen, dec.data(), dec.size(), &declen);
  if (declen != data.size() || memcmp(dec.data(), data.data(), declen) != 0)
    ++failures;
  picha_free(enc);

  // concurrent JPEG decode of the SHARED buffer + private encode
  int w = 0, h = 0, ch = 0;
  if (picha_jpeg_stat(shared_jpeg, jpeg_len, &w, &h, &ch) == 0) {
    std::vector<uint8_t> out((size_t)w * h * 3);
    char* err = nullptr;
    if (picha_jpeg_decode(shared_jpeg, jpeg_len, 3, 1, out.data(), w * 3,
                          &err) != 0) {
      ++failures;
      picha_free(err);
    } else {
      uint8_t* jout = nullptr;
      size_t jlen = 0;
      if (picha_jpeg_encode(out.data(), w, h, w * 3, 3, 80, 4, seed & 1,
                            (seed >> 1) & 1, (seed >> 2) & 1, &jout,
                            &jlen, &err) != 0) {
        ++failures;
        picha_free(err);
      } else {
        picha_free(jout);
      }
    }
    // raw 4:2:0 round trip of the SHARED buffer (Huffman+IDCT only)
    int wp = (w + 15) & ~15, hp = (h + 15) & ~15;
    std::vector<uint8_t> yp((size_t)hp * wp);
    std::vector<uint8_t> cbp((size_t)(hp / 2) * (wp / 2));
    std::vector<uint8_t> crp(cbp.size());
    char* rerr = nullptr;
    int rrc = picha_jpeg_decode_raw420(shared_jpeg, jpeg_len, yp.data(),
                                       cbp.data(), crp.data(), 1, &rerr);
    if (rrc == 0) {
      uint8_t* r420 = nullptr;
      size_t rl = 0;
      if (picha_jpeg_encode_raw420(yp.data(), cbp.data(), crp.data(), w, h,
                                   80, 0, &r420, &rl, &rerr) == 0) {
        picha_free(r420);
      } else {
        ++failures;
        picha_free(rerr);
      }
    } else if (rrc < 0) {
      ++failures;
      picha_free(rerr);
    }
    // scaled (draft) raw decode: all three planes on the ceil(dim/2)
    // grid (chroma comes out at the Y geometry under scaling)
    {
      int ow = (w + 1) / 2, oh = (h + 1) / 2;
      int owp = (ow + 15) & ~15, ohp = (oh + 15) & ~15;
      std::vector<uint8_t> ys((size_t)ohp * owp), cbs((size_t)ohp * owp),
          crs((size_t)ohp * owp);
      char* serr = nullptr;
      int src = picha_jpeg_decode_raw420(shared_jpeg, jpeg_len, ys.data(),
                                         cbs.data(), crs.data(), 2, &serr);
      if (src < 0) {
        ++failures;
        picha_free(serr);
      } else if (src == 0) {
        (void)picha_raw444_clip_mass(ys.data(), cbs.data(), crs.data(), ow,
                                     oh, owp);
      }
    }
    // segment-parallel entropy decode (jpegentropy.cc): nested threads
    // under the outer stress threads; tiny synthetic 1-bit-code scan
    // (2 len-1 codes, all-zero stream decodes as DC size 0 + EOB)
    {
      const uint8_t zdata[4] = {0, 0, 0, 0};
      const int64_t zoff[5] = {0, 1, 2, 3, 4};
      int one = 1, four_w = 4, four_h = 4, zero = 0;
      int64_t lim[17] = {0}, minc[17] = {0}, vptr[17] = {0};
      for (int l = 1; l <= 16; ++l) lim[l] = 65536;
      int32_t hv[256] = {0};
      int32_t nb[17] = {0};
      nb[1] = 2;
      std::vector<int16_t> plane((size_t)4 * 4 * 64, -1);
      int16_t* outp[1] = {plane.data()};
      if (picha_jpeg_entropy_segments(zdata, zoff, 4, 16, 4, 4, 1, &one,
                                      &one, &four_w, &four_h, &zero, &zero,
                                      lim, minc, vptr, hv, nb, 1, 2,
                                      outp) != 0)
        ++failures;
      for (auto v : plane)
        if (v != 0) ++failures;
    }

    // one-call transcode of the SHARED buffer (2:1 box-ish windows)
    {
      int dw = w / 2, dh = h / 2;
      int dwp = (dw + 15) & ~15, dhp = (dh + 15) & ~15;
      auto mkwin = [](int n, int src) {
        std::pair<std::vector<int32_t>, std::vector<float>> p;
        p.first.resize(n);
        p.second.assign((size_t)n * 2, 0.5f);
        for (int i = 0; i < n; ++i)
          p.first[i] = std::min(2 * i, src - 2);
        return p;
      };
      auto yx = mkwin(dwp, (w + 15) & ~15), yy = mkwin(dhp, (h + 15) & ~15);
      auto cx = mkwin(dwp / 2, ((w + 15) & ~15) / 2),
           cy = mkwin(dhp / 2, ((h + 15) & ~15) / 2);
      uint8_t* tout = nullptr;
      size_t tlen = 0;
      char* terr = nullptr;
      int trc = picha_jpeg_transcode_raw420(
          shared_jpeg, jpeg_len, w, h, dw, dh, 1, yx.first.data(),
          yx.second.data(), 2, yy.first.data(), yy.second.data(), 2,
          cx.first.data(), cx.second.data(), 2, cy.first.data(),
          cy.second.data(), 2, 80, 0, 0.25, &tout, &tlen, &terr);
      if (trc == 0) {
        picha_free(tout);
      } else if (trc < 0) {
        ++failures;
        picha_free(terr);
      }
    }
  } else {
    ++failures;
  }

  // deep (u16) resize on private buffers: uniform 2-tap half/half taps
  {
    std::vector<uint16_t> s16((size_t)48 * 64 * 3);
    for (size_t i = 0; i < s16.size(); ++i) s16[i] = (uint16_t)(i * 2654435761u);
    std::vector<uint16_t> d16((size_t)24 * 32 * 3);
    std::vector<int32_t> xs(32), ys(24);
    std::vector<float> xw(32 * 2, 0.5f), yw(24 * 2, 0.5f);
    for (int i = 0; i < 32; ++i) xs[i] = i * 2 < 63 ? i * 2 : 62;
    for (int i = 0; i < 24; ++i) ys[i] = i * 2 < 47 ? i * 2 : 46;
    if (picha_resize_u16(s16.data(), 48, 64, 3, d16.data(), 24, 32,
                         xs.data(), xw.data(), 2, ys.data(), yw.data(), 2)
        != 0)
      ++failures;
    // int16 fixed-point u8 kernel on the same windows
    std::vector<uint8_t> s8((size_t)48 * 64 * 3);
    for (size_t i = 0; i < s8.size(); ++i) s8[i] = (uint8_t)(i * 97);
    std::vector<uint8_t> d8((size_t)24 * 32 * 3);
    int rc16 = picha_resize_u8_i16(s8.data(), 48, 64, 3, d8.data(), 24, 32,
                                   xs.data(), xw.data(), 2, ys.data(),
                                   yw.data(), 2);
    if (rc16 != 0 && rc16 != 2) ++failures;
  }
}
}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <some.jpg>\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> jpeg(n);
  if (fread(jpeg.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);

  std::vector<std::thread> threads;
  for (int t = 0; t < 8; ++t)
    threads.emplace_back(worker, t, jpeg.data(), jpeg.size());
  for (auto& th : threads) th.join();
  if (failures.load() != 0) {
    fprintf(stderr, "FAIL: %d worker failures\n", failures.load());
    return 1;
  }
  printf("ok\n");
  return 0;
}
