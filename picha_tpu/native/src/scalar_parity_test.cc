// Cross-build resize parity check (see check_scalar_parity.sh).
//
// Loads two builds of hostresize.cc — the shipped AVX2 kernel and the
// scalar fallback compiled without -mavx2 — and asserts picha_resize_u8
// / picha_resize_u16 produce BIT-IDENTICAL bytes on randomized images
// and tap windows. The scalar leg replicates the AVX2 kernel's exact
// rounding events (FMA over the 8-wide column body, double-rounded
// tail columns), so any divergence is a real formulation drift.
#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

typedef int (*resize_u8_fn)(const uint8_t*, int, int, int, uint8_t*, int,
                            int, const int32_t*, const float*, int,
                            const int32_t*, const float*, int);
typedef int (*resize_u16_fn)(const uint16_t*, int, int, int, uint16_t*,
                             int, int, const int32_t*, const float*, int,
                             const int32_t*, const float*, int);

static void make_windows(std::mt19937& rng, int dst, int src, int k,
                         std::vector<int32_t>& starts,
                         std::vector<float>& taps) {
  starts.resize(dst);
  taps.resize((size_t)dst * k);
  std::uniform_real_distribution<float> u(-0.3f, 1.0f);
  for (int i = 0; i < dst; ++i) {
    int hi = src - k;
    int s = hi <= 0 ? 0 : (int)(rng() % (unsigned)(hi + 1));
    starts[i] = s;
    float sum = 0.0f;
    for (int j = 0; j < k; ++j) {
      float v = u(rng);
      taps[(size_t)i * k + j] = v;
      sum += v;
    }
    if (sum == 0.0f) sum = 1.0f;
    for (int j = 0; j < k; ++j) taps[(size_t)i * k + j] /= sum;
  }
}

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <avx2.so> <scalar.so>\n", argv[0]);
    return 2;
  }
  void* ha = dlopen(argv[1], RTLD_NOW | RTLD_LOCAL);
  void* hb = dlopen(argv[2], RTLD_NOW | RTLD_LOCAL);
  if (!ha || !hb) {
    fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 2;
  }
  auto a8 = (resize_u8_fn)dlsym(ha, "picha_resize_u8");
  auto b8 = (resize_u8_fn)dlsym(hb, "picha_resize_u8");
  auto a16 = (resize_u16_fn)dlsym(ha, "picha_resize_u16");
  auto b16 = (resize_u16_fn)dlsym(hb, "picha_resize_u16");
  if (!a8 || !b8 || !a16 || !b16) {
    fprintf(stderr, "dlsym failed\n");
    return 2;
  }
  std::mt19937 rng(1234);
  int failures = 0;
  for (int t = 0; t < 60; ++t) {
    int sw = 5 + (int)(rng() % 200), sh = 5 + (int)(rng() % 160);
    int dw = 3 + (int)(rng() % 220), dh = 3 + (int)(rng() % 180);
    int ch = 1 + (int)(rng() % 4);
    int xk = 2 + (int)(rng() % 5), yk = 2 + (int)(rng() % 5);
    if (xk > sw) xk = sw;
    if (yk > sh) yk = sh;
    std::vector<int32_t> xs, ys;
    std::vector<float> xw, yw;
    make_windows(rng, dw, sw, xk, xs, xw);
    make_windows(rng, dh, sh, yk, ys, yw);
    std::vector<uint8_t> img((size_t)sh * sw * ch);
    for (auto& v : img) v = (uint8_t)(rng() & 0xff);
    std::vector<uint8_t> oa((size_t)dh * dw * ch), ob(oa.size());
    if (a8(img.data(), sh, sw, ch, oa.data(), dh, dw, xs.data(), xw.data(),
           xk, ys.data(), yw.data(), yk) != 0 ||
        b8(img.data(), sh, sw, ch, ob.data(), dh, dw, xs.data(), xw.data(),
           xk, ys.data(), yw.data(), yk) != 0) {
      fprintf(stderr, "trial %d: u8 resize rc != 0\n", t);
      ++failures;
      continue;
    }
    if (memcmp(oa.data(), ob.data(), oa.size()) != 0) {
      size_t nd = 0;
      for (size_t i = 0; i < oa.size(); ++i) nd += oa[i] != ob[i];
      fprintf(stderr, "trial %d: u8 MISMATCH %zu/%zu bytes\n", t, nd,
              oa.size());
      ++failures;
    }
    std::vector<uint16_t> img16((size_t)sh * sw * ch);
    for (auto& v : img16) v = (uint16_t)(rng() & 0xffff);
    std::vector<uint16_t> pa((size_t)dh * dw * ch), pb(pa.size());
    if (a16(img16.data(), sh, sw, ch, pa.data(), dh, dw, xs.data(),
            xw.data(), xk, ys.data(), yw.data(), yk) != 0 ||
        b16(img16.data(), sh, sw, ch, pb.data(), dh, dw, xs.data(),
            xw.data(), xk, ys.data(), yw.data(), yk) != 0) {
      fprintf(stderr, "trial %d: u16 resize rc != 0\n", t);
      ++failures;
      continue;
    }
    if (memcmp(pa.data(), pb.data(), pa.size() * 2) != 0) {
      size_t nd = 0;
      for (size_t i = 0; i < pa.size(); ++i) nd += pa[i] != pb[i];
      fprintf(stderr, "trial %d: u16 MISMATCH %zu/%zu samples\n", t, nd,
              pa.size());
      ++failures;
    }
  }
  if (failures) {
    fprintf(stderr, "FAIL: %d trials diverged\n", failures);
    return 1;
  }
  printf("scalar/AVX2 resize parity: 60 randomized trials bit-identical\n");
  return 0;
}
