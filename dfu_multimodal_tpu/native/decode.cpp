// decode.cpp — native threaded JPEG decode + resize for dfu_multimodal_tpu.
//
// The reference decodes every JPEG with PIL inside 4 torch DataLoader
// worker PROCESSES, re-decoding every epoch (reference
// notebooks/train_rgb_only.py:191-195, scripts/dataloader.py:136-196).
// Our loader decodes each image exactly once into a uint8 cache
// (data/loader.py) — this module makes that one pass native: libjpeg
// decode + resize across a C++ thread pool, no Python object churn and
// no GIL between images.
//
// The resize reproduces PIL's BILINEAR resample exactly (the parity
// anchor: torchvision Resize((S, S)) == Image.resize(..., BILINEAR),
// reference train_rgb_only.py:102-103): a separable two-pass triangle
// filter with support widened by the downscale factor, coefficients
// quantized to 22-bit fixed point, each pass rounding to uint8 — so the
// native cache is BIT-IDENTICAL to the PIL path (tested in
// tests/test_data.py) and converted-checkpoint eval parity is
// unaffected.  Non-JPEG or exotic-colorspace files report a nonzero
// status and the Python side falls back to PIL per file.
//
// C ABI via ctypes (no pybind11 in the image); build: native/__init__.py
// (g++ ... -ljpeg).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <cmath>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// libjpeg's default error handler exit()s the process; route fatal
// errors through longjmp instead and stay silent on warnings.
struct JmpErrorMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void on_fatal(j_common_ptr cinfo) {
  JmpErrorMgr* err = reinterpret_cast<JmpErrorMgr*>(cinfo->err);
  longjmp(err->jb, 1);
}

void on_message(j_common_ptr, int) {}

// ---------------------------------------------------------------- resize
// PIL-exact BILINEAR resample (separable triangle filter, 8-bit channels,
// fixed-point accumulation).  Semantics match Pillow's documented
// algorithm: filter support scales with the downscale ratio (proper
// area-style antialiasing, not naive 2-tap bilinear), per-output-pixel
// coefficient windows normalized then quantized, each pass rounds to
// uint8 before the next.

constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8(int64_t v) {
  if (v >= (int64_t(255) << kPrecisionBits)) return 255;
  if (v <= 0) return 0;
  return uint8_t(v >> kPrecisionBits);
}

inline double triangle(double x) {
  if (x < 0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Integer coefficient windows for one resampled axis.
struct AxisCoeffs {
  int ksize = 0;
  std::vector<int> bounds;   // per out pixel: xmin, xmax (window length)
  std::vector<int32_t> kk;   // per out pixel: ksize quantized weights
};

AxisCoeffs precompute(int in_size, int out_size) {
  AxisCoeffs c;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;        // bilinear support = 1
  c.ksize = int(std::ceil(support)) * 2 + 1;
  c.bounds.resize(size_t(out_size) * 2);
  c.kk.resize(size_t(out_size) * c.ksize);
  std::vector<double> w(c.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ss = 1.0 / filterscale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      w[x] = triangle((x + xmin - center + 0.5) * ss);
      ww += w[x];
    }
    int32_t* k = &c.kk[size_t(xx) * c.ksize];
    for (int x = 0; x < xmax; ++x) {
      double v = ww != 0.0 ? w[x] / ww : w[x];
      k[x] = int32_t(v < 0 ? v * (1 << kPrecisionBits) - 0.5
                           : v * (1 << kPrecisionBits) + 0.5);
    }
    for (int x = xmax; x < c.ksize; ++x) k[x] = 0;
    c.bounds[size_t(xx) * 2] = xmin;
    c.bounds[size_t(xx) * 2 + 1] = xmax;
  }
  return c;
}

// src: (in_h, in_w, 3) → dst: (in_h, out_w, 3)
void resample_horizontal(const uint8_t* src, int in_h, int in_w,
                         uint8_t* dst, int out_w, const AxisCoeffs& c) {
  for (int yy = 0; yy < in_h; ++yy) {
    const uint8_t* row = src + size_t(yy) * in_w * 3;
    uint8_t* orow = dst + size_t(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = c.bounds[size_t(xx) * 2];
      int xmax = c.bounds[size_t(xx) * 2 + 1];
      const int32_t* k = &c.kk[size_t(xx) * c.ksize];
      int64_t s0 = int64_t(1) << (kPrecisionBits - 1);
      int64_t s1 = s0, s2 = s0;
      for (int x = 0; x < xmax; ++x) {
        const uint8_t* p = row + size_t(xmin + x) * 3;
        s0 += int64_t(p[0]) * k[x];
        s1 += int64_t(p[1]) * k[x];
        s2 += int64_t(p[2]) * k[x];
      }
      orow[size_t(xx) * 3] = clip8(s0);
      orow[size_t(xx) * 3 + 1] = clip8(s1);
      orow[size_t(xx) * 3 + 2] = clip8(s2);
    }
  }
}

// src: (in_h, w, 3) → dst: (out_h, w, 3)
void resample_vertical(const uint8_t* src, int in_h, int w,
                       uint8_t* dst, int out_h, const AxisCoeffs& c) {
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = c.bounds[size_t(yy) * 2];
    int ymax = c.bounds[size_t(yy) * 2 + 1];
    const int32_t* k = &c.kk[size_t(yy) * c.ksize];
    uint8_t* orow = dst + size_t(yy) * w * 3;
    for (int xx = 0; xx < w * 3; ++xx) {
      int64_t s = int64_t(1) << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y)
        s += int64_t(src[size_t(ymin + y) * w * 3 + xx]) * k[y];
      orow[xx] = clip8(s);
    }
  }
}

// ---------------------------------------------------------------- decode

// status: 0 ok; 1 open fail; 2 decode error (not a JPEG / corrupt);
// 3 unsupported colorspace.
int decode_one(const char* path, int size, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JmpErrorMgr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_fatal;
  err.mgr.emit_message = on_message;
  std::vector<uint8_t> rgb;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;                      // PIL handles these; fall back
  }
  cinfo.out_color_space = JCS_RGB; // grayscale/YCbCr → RGB, like PIL
  jpeg_start_decompress(&cinfo);
  int w = int(cinfo.output_width), h = int(cinfo.output_height);
  if (w <= 0 || h <= 0 || cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  rgb.resize(size_t(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rgb.data() + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  if (w == size && h == size) {   // loader skips the no-op resize; match
    memcpy(out, rgb.data(), size_t(size) * size * 3);
    return 0;
  }
  AxisCoeffs ch = precompute(w, size);
  AxisCoeffs cv = precompute(h, size);
  std::vector<uint8_t> tmp(size_t(h) * size * 3);
  resample_horizontal(rgb.data(), h, w, tmp.data(), size, ch);
  resample_vertical(tmp.data(), h, size, out, size, cv);
  return 0;
}

}  // namespace

extern "C" {

// Decode n JPEGs, resize each to (size, size, 3) RGB uint8 into
// out[i * size*size*3]; status[i] per decode_one. `threads` <= 0 uses the
// hardware default.
void decode_jpegs_resized(const char** paths, int n, int size,
                          uint8_t* out, int* status, int threads) {
  if (threads <= 0) {
    threads = int(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 1;
  }
  if (threads > n) threads = n > 0 ? n : 1;
  size_t stride = size_t(size) * size * 3;
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n)
      status[i] = decode_one(paths[i], size, out + size_t(i) * stride);
  };
  if (threads == 1) { worker(); return; }
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
