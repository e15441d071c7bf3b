// Native host-side image decode + resize for the input pipeline.
//
// TPU-native replacement for the reference's DataLoader-worker PIL decode
// (SURVEY.md section 2.2 row 5): libpng/libjpeg decode + a PIL-faithful
// separable triangle-filter (BILINEAR, antialiased) resize and a
// center-convention NEAREST resize for label maps. Called from Python via
// ctypes (data/native.py); the GIL is released during the call, so the
// Python-side decode thread pool gets true parallelism.
//
// Build: make -C dasemanticsegmentationaml_tpu/native

#include <png.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

bool ends_with(const std::string& s, const std::string& suffix) {
  if (s.size() < suffix.size()) return false;
  std::string tail = s.substr(s.size() - suffix.size());
  std::transform(tail.begin(), tail.end(), tail.begin(), ::tolower);
  return tail == suffix;
}

bool decode_png(const char* path, bool gray, std::vector<uint8_t>& out,
                int& w, int& h, int& channels) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = gray ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  w = static_cast<int>(image.width);
  h = static_cast<int>(image.height);
  channels = gray ? 1 : 3;
  out.resize(static_cast<size_t>(w) * h * channels);
  if (!png_image_finish_read(&image, nullptr, out.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool decode_jpeg(const char* path, bool gray, std::vector<uint8_t>& out,
                 int& w, int& h, int& channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  channels = cinfo.output_components;
  out.resize(static_cast<size_t>(w) * h * channels);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() +
                   static_cast<size_t>(cinfo.output_scanline) * w * channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode(const char* path, bool gray, std::vector<uint8_t>& data, int& w,
            int& h, int& channels) {
  std::string p(path);
  if (ends_with(p, ".png")) return decode_png(path, gray, data, w, h,
                                              channels);
  if (ends_with(p, ".jpg") || ends_with(p, ".jpeg"))
    return decode_jpeg(path, gray, data, w, h, channels);
  return false;
}

// PIL-style precomputed triangle-filter coefficients for one axis.
// (PIL Resample.c precompute_coeffs with the BILINEAR filter: support 1.0
// scaled by max(1, in/out) => proper antialiasing on downscale.)
struct AxisCoeffs {
  std::vector<int> bounds_lo;  // first source index per output pixel
  std::vector<int> counts;     // number of taps
  std::vector<float> weights;  // taps, row-major [out, kmax]
  int kmax = 0;
};

AxisCoeffs triangle_coeffs(int in_size, int out_size) {
  AxisCoeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // BILINEAR support = 1.0
  c.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.bounds_lo.resize(out_size);
  c.counts.resize(out_size);
  c.weights.assign(static_cast<size_t>(out_size) * c.kmax, 0.0f);
  for (int i = 0; i < out_size; i++) {
    double center = (i + 0.5) * scale;
    int lo = static_cast<int>(std::max(center - support + 0.5, 0.0));
    int hi = static_cast<int>(
        std::min(center + support + 0.5, static_cast<double>(in_size)));
    int n = hi - lo;
    double total = 0.0;
    std::vector<double> ww(n);
    for (int k = 0; k < n; k++) {
      double x = (lo + k - center + 0.5) / filterscale;
      double wgt = (x < 0 ? 1.0 + x : 1.0 - x);
      if (wgt < 0) wgt = 0;
      ww[k] = wgt;
      total += wgt;
    }
    if (total == 0.0) total = 1.0;
    c.bounds_lo[i] = lo;
    c.counts[i] = n;
    for (int k = 0; k < n; k++) {
      c.weights[static_cast<size_t>(i) * c.kmax + k] =
          static_cast<float>(ww[k] / total);
    }
  }
  return c;
}

inline uint8_t clamp8(float v) {
  return static_cast<uint8_t>(std::min(std::max(v + 0.5f, 0.0f), 255.0f));
}

// Separable bilinear (triangle) resize, uint8 HWC.
//
// Planar float passes: the horizontal pass is a contiguous dot product
// per output pixel, the vertical pass a SAXPY over contiguous rows.
// Identity axes (in == out, e.g. the height axis of the faithful
// 2048x1024 -> 512x1024 Cityscapes path) skip their accumulation
// entirely. Accumulation order per output pixel (k ascending, horizontal
// then vertical) matches the naive interleaved formulation and
// -ffp-contract=off forbids FMA contraction, so results are bit-identical
// to the scalar version (verified; measured idle-core speed is ~equal
// too -- the pass is memory-bound, see tools/bench_loader.py).
void resize_bilinear(const uint8_t* src, int in_w, int in_h, int ch,
                     uint8_t* dst, int out_w, int out_h) {
  const bool id_x = (in_w == out_w);
  const bool id_y = (in_h == out_h);
  AxisCoeffs cx, cy;
  if (!id_x) cx = triangle_coeffs(in_w, out_w);
  if (!id_y) cy = triangle_coeffs(in_h, out_h);

  // horizontal pass -> planar float intermediate [ch][in_h][out_w]
  std::vector<float> tmp(static_cast<size_t>(ch) * in_h * out_w);
  std::vector<float> plane(in_w);
  for (int y = 0; y < in_h; y++) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * ch;
    for (int c = 0; c < ch; c++) {
      for (int x = 0; x < in_w; x++) {
        plane[x] = static_cast<float>(row[x * ch + c]);
      }
      float* trow =
          tmp.data() + (static_cast<size_t>(c) * in_h + y) * out_w;
      if (id_x) {
        std::memcpy(trow, plane.data(), in_w * sizeof(float));
        continue;
      }
      for (int x = 0; x < out_w; x++) {
        const float* wv = &cx.weights[static_cast<size_t>(x) * cx.kmax];
        const float* pv = plane.data() + cx.bounds_lo[x];
        int n = cx.counts[x];
        float acc = 0.0f;
        for (int k = 0; k < n; k++) acc += wv[k] * pv[k];
        trow[x] = acc;
      }
    }
  }
  // vertical pass
  std::vector<float> acc(out_w);
  for (int y = 0; y < out_h; y++) {
    uint8_t* drow = dst + static_cast<size_t>(y) * out_w * ch;
    for (int c = 0; c < ch; c++) {
      const float* base = tmp.data() + static_cast<size_t>(c) * in_h * out_w;
      const float* arow;
      if (id_y) {
        arow = base + static_cast<size_t>(y) * out_w;
      } else {
        const float* wv = &cy.weights[static_cast<size_t>(y) * cy.kmax];
        int lo = cy.bounds_lo[y];
        int n = cy.counts[y];
        std::fill(acc.begin(), acc.end(), 0.0f);
        for (int k = 0; k < n; k++) {
          const float* trow = base + static_cast<size_t>(lo + k) * out_w;
          float w = wv[k];
          for (int x = 0; x < out_w; x++) acc[x] += w * trow[x];
        }
        arow = acc.data();
      }
      for (int x = 0; x < out_w; x++) drow[x * ch + c] = clamp8(arow[x]);
    }
  }
}

// PIL NEAREST: src index = floor((i + 0.5) * in/out), clamped.
void resize_nearest(const uint8_t* src, int in_w, int in_h, int ch,
                    uint8_t* dst, int out_w, int out_h) {
  std::vector<int> xs(out_w), ys(out_h);
  double sx = static_cast<double>(in_w) / out_w;
  double sy = static_cast<double>(in_h) / out_h;
  for (int x = 0; x < out_w; x++)
    xs[x] = std::min(static_cast<int>((x + 0.5) * sx), in_w - 1);
  for (int y = 0; y < out_h; y++)
    ys[y] = std::min(static_cast<int>((y + 0.5) * sy), in_h - 1);
  for (int y = 0; y < out_h; y++) {
    const uint8_t* srow = src + static_cast<size_t>(ys[y]) * in_w * ch;
    uint8_t* drow = dst + static_cast<size_t>(y) * out_w * ch;
    for (int x = 0; x < out_w; x++) {
      std::memcpy(drow + x * ch, srow + xs[x] * ch, ch);
    }
  }
}

}  // namespace

extern "C" {

int dseg_image_size(const char* path, int* w, int* h) {
  std::string p(path);
  if (ends_with(p, ".png")) {
    png_image image;
    std::memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, path)) return 1;
    *w = image.width;
    *h = image.height;
    png_image_free(&image);
    return 0;
  }
  if (ends_with(p, ".jpg") || ends_with(p, ".jpeg")) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return 1;
    }
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 0;
  }
  return 1;
}

// mode: 0 = bilinear (images), 1 = nearest (labels).
// Returns 0 on success. Caller allocates out (out_h * out_w * channels).
int dseg_decode_resize(const char* path, int out_w, int out_h, int mode,
                       int grayscale, uint8_t* out, int* got_w, int* got_h) {
  std::vector<uint8_t> data;
  int w = 0, h = 0, ch = 0;
  if (!decode(path, grayscale != 0, data, w, h, ch)) return 1;
  int want_ch = grayscale ? 1 : 3;
  if (ch != want_ch) return 2;
  if (out_w <= 0 || out_h <= 0 || (out_w == w && out_h == h)) {
    std::memcpy(out, data.data(), data.size());
    *got_w = w;
    *got_h = h;
    return 0;
  }
  if (mode == 1) {
    resize_nearest(data.data(), w, h, ch, out, out_w, out_h);
  } else {
    resize_bilinear(data.data(), w, h, ch, out, out_w, out_h);
  }
  *got_w = out_w;
  *got_h = out_h;
  return 0;
}

}  // extern "C"
