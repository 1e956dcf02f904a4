// Native image decode + resize for the host data path.
//
// The reference feeds its models through per-sample PIL decode/resize in
// forked DataLoader workers (`/root/reference/datasets/mmimdb.py:114-130`
// etc.). Here the equivalent host-side work is a C++ kernel: libjpeg/libpng
// decode, a Pillow-parity antialiased bicubic resampler (separable
// convolution, cubic a=-0.5, scale-widened support — the same algorithm
// Pillow's resize(BICUBIC) runs), ToTensor scaling and optional ImageNet
// normalization, fused into one pass per image and threaded across a batch
// (std::thread pool). Python falls back to PIL whenever this library is
// unavailable or a file fails to decode (see native/__init__.py).
//
// Build: make -C m2mixer_tpu/native (links -ljpeg -lpng; built as its own
// shared object so the projection kernel never depends on image libs).

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- decoding

struct JErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jump, 1);
}

void jerr_silent(j_common_ptr, int) {}

// decode a baseline/progressive JPEG to RGB8; returns false on any error
bool decode_jpeg(FILE* f, std::vector<uint8_t>* rgb, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  jerr.pub.emit_message = jerr_silent;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr to RGB
  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  if (cinfo.output_components != 3 || *h <= 0 || *w <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb->resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// decode a PNG to RGB8 via the libpng simplified API. Read as RGBA and
// STRIP the alpha channel: PIL's convert("RGB") drops alpha keeping the
// raw color channels, whereas asking libpng for PNG_FORMAT_RGB would
// composite transparent pixels against black — a silent data change.
bool decode_png(const char* path, std::vector<uint8_t>* rgb, int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGBA;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  const size_t n = static_cast<size_t>(*h) * *w;
  rgb->resize(n * 3);
  for (size_t i = 0; i < n; ++i) {
    (*rgb)[i * 3 + 0] = rgba[i * 4 + 0];
    (*rgb)[i * 3 + 1] = rgba[i * 4 + 1];
    (*rgb)[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return true;
}

bool decode_file(const char* path, std::vector<uint8_t>* rgb, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, rgb, h, w);
    std::fclose(f);
  } else if (got >= 8 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' &&
             magic[3] == 'G') {
    std::fclose(f);
    ok = decode_png(path, rgb, h, w);
  } else {
    std::fclose(f);  // unsupported container -> caller falls back to PIL
  }
  return ok && *h > 0 && *w > 0;
}

// ------------------------------------------------------------- resampling

inline double bicubic(double x) {
  // Pillow's BICUBIC filter: Catmull-Rom-family cubic with a = -0.5
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// per-output-pixel contribution table (Pillow ImagingPrecomputeCoeffs)
struct Coeffs {
  std::vector<int> first;             // first source index per output pixel
  std::vector<int> count;             // taps per output pixel
  std::vector<std::vector<double>> w; // normalized weights
};

Coeffs precompute(int in_size, int out_size) {
  Coeffs c;
  c.first.resize(out_size);
  c.count.resize(out_size);
  c.w.resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // bicubic support
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    std::vector<double>& w = c.w[xx];
    w.resize(xmax - xmin);
    double total = 0.0;
    for (int i = xmin; i < xmax; ++i) {
      double v = bicubic((i - center + 0.5) / filterscale);
      w[i - xmin] = v;
      total += v;
    }
    if (total != 0.0)
      for (double& v : w) v /= total;
    c.first[xx] = xmin;
    c.count[xx] = xmax - xmin;
  }
  return c;
}

// HWC float resize (horizontal then vertical, like Pillow but with a float
// intermediate — no per-pass uint8 rounding)
void resize_bicubic(const uint8_t* src, int in_h, int in_w, int out_h,
                    int out_w, std::vector<float>* dst_hwc) {
  Coeffs cx = precompute(in_w, out_w);
  Coeffs cy = precompute(in_h, out_h);
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * 3;
    float* orow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      const std::vector<double>& w = cx.w[x];
      const uint8_t* p = row + cx.first[x] * 3;
      for (int k = 0; k < cx.count[x]; ++k, p += 3) {
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      orow[x * 3 + 0] = static_cast<float>(acc[0]);
      orow[x * 3 + 1] = static_cast<float>(acc[1]);
      orow[x * 3 + 2] = static_cast<float>(acc[2]);
    }
  }
  dst_hwc->resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < out_h; ++y) {
    float* orow = dst_hwc->data() + static_cast<size_t>(y) * out_w * 3;
    const std::vector<double>& w = cy.w[y];
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      const float* p = tmp.data() + (static_cast<size_t>(cy.first[y]) * out_w + x) * 3;
      for (int k = 0; k < cy.count[y]; ++k, p += static_cast<size_t>(out_w) * 3) {
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      orow[x * 3 + 0] = static_cast<float>(acc[0]);
      orow[x * 3 + 1] = static_cast<float>(acc[1]);
      orow[x * 3 + 2] = static_cast<float>(acc[2]);
    }
  }
}

const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

// HWC float [0,255] -> CHW float, /255, optional ImageNet normalize
void to_chw(const float* hwc, int h, int w, int normalize, float* out) {
  for (int ch = 0; ch < 3; ++ch) {
    float* plane = out + static_cast<size_t>(ch) * h * w;
    const float inv = 1.0f / 255.0f;
    for (int i = 0; i < h * w; ++i) {
      float v = hwc[static_cast<size_t>(i) * 3 + ch] * inv;
      // Pillow rounds + clips the resampled value back to uint8 before
      // ToTensor; clip (but keep float precision) so out-of-range ringing
      // matches within rounding
      if (v < 0.0f) v = 0.0f;
      if (v > 1.0f) v = 1.0f;
      plane[i] = normalize ? (v - kMean[ch]) / kStd[ch] : v;
    }
  }
}

int load_one(const char* path, int out_h, int out_w, int normalize, float* out) {
  if (out_h <= 0 || out_w <= 0) return 1;  // out is sized 3*out_h*out_w
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_file(path, &rgb, &h, &w)) return 1;
  if (out_h == h && out_w == w) {
    // no resize needed: straight uint8 -> CHW float
    std::vector<float> hwc(rgb.begin(), rgb.end());
    to_chw(hwc.data(), h, w, normalize, out);
    return 0;
  }
  std::vector<float> hwc;
  resize_bicubic(rgb.data(), h, w, out_h, out_w, &hwc);
  to_chw(hwc.data(), out_h, out_w, normalize, out);
  return 0;
}

}  // namespace

extern "C" {

// Decode+resize+normalize one image into out (3*out_h*out_w floats, CHW).
// Returns 0 on success, nonzero on any failure (caller falls back to PIL);
// out_h/out_w must be positive — the buffer is always caller-sized to the
// target shape, so there is no "use the file's own dimensions" mode.
int m2m_load_image(const char* path, int out_h, int out_w, int normalize,
                   float* out) {
  return load_one(path, out_h, out_w, normalize, out);
}

// Batched threaded loader: out is (n, 3, out_h, out_w) float32; status[i]
// nonzero marks images that failed (caller re-loads those via PIL).
int m2m_load_images(const char** paths, long n, int out_h, int out_w,
                    int normalize, int nthreads, float* out, int* status) {
  if (n <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = static_cast<int>(n);
  const size_t stride = static_cast<size_t>(3) * out_h * out_w;
  std::atomic<long> next(0);
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = load_one(paths[i], out_h, out_w, normalize, out + stride * i);
    }
  };
  if (nthreads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
