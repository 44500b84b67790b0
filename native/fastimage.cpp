// fastimage: native batch image ops for the data/packing tier.
//
// The reference's data pipeline resizes tens of thousands of images through
// per-item Python/PIL calls (reference src/data.py transform pipelines); here
// packing happens once, natively, in parallel. Resampling implements PIL's
// separable triangle (bilinear) filter with downscale-widened support, so
// packed arrays match the PIL-based fallback within rounding.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Weights {
  std::vector<int> xmin;    // first source index per output pixel
  std::vector<int> xsize;   // number of taps per output pixel
  std::vector<double> w;    // taps, row-major [out, max_taps]
  int max_taps = 0;
};

// PIL-style triangle filter coefficient table (support widened on downscale).
Weights compute_weights(int in_size, int out_size) {
  Weights ws;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support = 1
  ws.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  ws.xmin.resize(out_size);
  ws.xsize.resize(out_size);
  ws.w.assign(static_cast<size_t>(out_size) * ws.max_taps, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      double x = (xmin + i + 0.5 - center) / filterscale;
      double wv = std::max(0.0, 1.0 - std::abs(x));
      ws.w[static_cast<size_t>(xx) * ws.max_taps + i] = wv;
      total += wv;
    }
    if (total != 0.0) {
      for (int i = 0; i < n; ++i)
        ws.w[static_cast<size_t>(xx) * ws.max_taps + i] /= total;
    }
    ws.xmin[xx] = xmin;
    ws.xsize[xx] = n;
  }
  return ws;
}

inline uint8_t clip8(double v) {
  if (v < 0.0) return 0;
  if (v > 255.0) return 255;
  return static_cast<uint8_t>(v + 0.5);
}

}  // namespace

extern "C" {

// Batch bilinear resize, uint8 NHWC → uint8 N,outH,outW,C.
void resize_bilinear_u8(const uint8_t* src, int64_t n, int64_t h, int64_t w,
                        int64_t c, uint8_t* dst, int64_t out_h, int64_t out_w) {
  Weights wx = compute_weights(static_cast<int>(w), static_cast<int>(out_w));
  Weights wy = compute_weights(static_cast<int>(h), static_cast<int>(out_h));
  const int64_t in_img = h * w * c;
  const int64_t out_img = out_h * out_w * c;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* s = src + img * in_img;
    uint8_t* d = dst + img * out_img;
    // horizontal pass into a float buffer [h, out_w, c]
    std::vector<double> tmp(static_cast<size_t>(h) * out_w * c);
    for (int64_t yy = 0; yy < h; ++yy) {
      for (int64_t xx = 0; xx < out_w; ++xx) {
        const double* taps = &wx.w[static_cast<size_t>(xx) * wx.max_taps];
        int x0 = wx.xmin[xx], nx = wx.xsize[xx];
        for (int64_t ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int i = 0; i < nx; ++i)
            acc += taps[i] * s[(yy * w + x0 + i) * c + ch];
          tmp[(static_cast<size_t>(yy) * out_w + xx) * c + ch] = acc;
        }
      }
    }
    // vertical pass
    for (int64_t yy = 0; yy < out_h; ++yy) {
      const double* taps = &wy.w[static_cast<size_t>(yy) * wy.max_taps];
      int y0 = wy.xmin[yy], ny = wy.xsize[yy];
      for (int64_t xx = 0; xx < out_w; ++xx) {
        for (int64_t ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int i = 0; i < ny; ++i)
            acc += taps[i] *
                   tmp[(static_cast<size_t>(y0 + i) * out_w + xx) * c + ch];
          d[(yy * out_w + xx) * c + ch] = clip8(acc);
        }
      }
    }
  }
}

// Tile [n, h, w, c] uint8 into a padded grid (torchvision make_grid analog).
void make_grid_u8(const uint8_t* src, int64_t n, int64_t h, int64_t w,
                  int64_t c, int64_t ncol, int64_t padding, uint8_t pad_value,
                  uint8_t* dst, int64_t grid_h, int64_t grid_w) {
  std::memset(dst, pad_value, static_cast<size_t>(grid_h) * grid_w * c);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = i / ncol, col = i % ncol;
    int64_t y0 = r * (h + padding) + padding;
    int64_t x0 = col * (w + padding) + padding;
    for (int64_t yy = 0; yy < h; ++yy) {
      std::memcpy(dst + ((y0 + yy) * grid_w + x0) * c,
                  src + (i * h + yy) * w * c,
                  static_cast<size_t>(w) * c);
    }
  }
}

// uint8 NHWC → float32 in [-1, 1] (loader normalization, host-side variant).
void normalize_u8_f32(const uint8_t* src, int64_t count, float* dst) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < count; ++i)
    dst[i] = src[i] * (2.0f / 255.0f) - 1.0f;
}

}  // extern "C"
