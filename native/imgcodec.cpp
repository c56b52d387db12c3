// Native image codec for the langsplat4d host data path.
//
// The reference's per-iteration host work decodes PNG/JPEG frames with PIL
// and resizes them on the Python side (utils/general_utils.py:21-33 PILtoTorch,
// scene/neural_3D_dataset_NDC.py:228-231 half-res LANCZOS resize). This is the
// TPU-native framework's equivalent implemented in C++: libpng/libjpeg decode,
// PIL-style antialiased convolution resampling (separable, support scaled by
// the downscale factor — the same algorithm PIL's Resample.c uses, computed in
// the same int32 fixed-point arithmetic, so outputs are byte-identical), and the
// CHW float32 [0,1] conversion, all behind one GIL-free ctypes call.
//
// Build: native/build.py (g++ -O3 -shared -fPIC -pthread -lpng -ljpeg).

#include <png.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

// jpeglib.h needs stdio FILE; include after cstdio.
#include <jpeglib.h>

namespace {

template <typename F>
void parallel_rows(int64_t n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int threads = std::max(1u, std::min<unsigned>(hw, 16));
  if (n < 64 || threads == 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decodes path into interleaved uint8 rows. Returns 0 on success. When
// `data` is null only the header is read (w/h/c probe).
int decode_jpeg(FILE* f, uint8_t* data, int* w, int* h, int* c) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;  // let the PIL fallback handle CMYK
  }
  jpeg_calc_output_dimensions(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  *c = (int)cinfo.output_components;
  if (data == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  int64_t stride = (int64_t)(*w) * (*c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = data + (int64_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int decode_png(FILE* f, uint8_t* data, int* w, int* h, int* c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // Normalize to 8-bit gray/GA/RGB/RGBA (palette expanded, 16-bit stripped —
  // deviation from PIL's I;16 mode for 16-bit inputs, fine for this data).
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  png_read_update_info(png, info);
  *w = (int)png_get_image_width(png, info);
  *h = (int)png_get_image_height(png, info);
  *c = (int)png_get_channels(png, info);
  if (data == nullptr) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  int64_t stride = (int64_t)(*w) * (*c);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = data + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_any(const char* path, uint8_t* data, int* w, int* h, int* c) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  int rc;
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png(f, data, w, h, c);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, data, w, h, c);
  } else {
    rc = 3;  // unknown container; fallback decodes it
  }
  std::fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// PIL-style convolution resampling (Resample.c algorithm, int32 fixed point)

double filt_box(double x) { return (x > -0.5 && x <= 0.5) ? 1.0 : 0.0; }
double filt_bilinear(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}
double filt_bicubic(double x) {  // Keys, a = -0.5 (PIL's cubic)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}
double filt_sinc(double x) {
  if (x == 0.0) return 1.0;
  x *= M_PI;
  return std::sin(x) / x;
}
double filt_lanczos3(double x) {
  if (-3.0 <= x && x < 3.0) return filt_sinc(x) * filt_sinc(x / 3.0);
  return 0.0;
}

struct Filter {
  double (*fn)(double);
  double support;
};

Filter get_filter(int id) {
  switch (id) {
    case 0: return {filt_box, 0.5};
    case 1: return {filt_bilinear, 1.0};
    case 3: return {filt_lanczos3, 3.0};
    case 2:
    default: return {filt_bicubic, 2.0};
  }
}

// Precompute normalized weights + source bounds for one axis (PIL
// precompute_coeffs): support is scaled by the downscale factor so
// minification is antialiased.
void make_weights(int in_size, int out_size, const Filter& flt,
                  std::vector<int>& bounds, std::vector<double>& kk,
                  int* ksize_out) {
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = flt.support * filterscale;
  int ksize = (int)std::ceil(support) * 2 + 1;
  kk.assign((size_t)out_size * ksize, 0.0);
  bounds.assign((size_t)out_size * 2, 0);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    // PIL rounds the window bounds (Resample.c precompute_coeffs) — with
    // flat-topped filters like box, floor/ceil bounds admit full-weight
    // extra taps and visibly shift the result.
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double* k = &kk[(size_t)xx * ksize];
    double ww = 0.0;
    for (int x = 0; x < n; ++x) {
      double w = flt.fn((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < n; ++x) k[x] /= ww;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = n;
  }
  *ksize_out = ksize;
}

}  // namespace

extern "C" {

// Header-only probe. Returns 0 on success.
int img_header(const char* path, int* w, int* h, int* c) {
  return decode_any(path, nullptr, w, h, c);
}

// Decode to interleaved uint8 [h, w, c] (caller allocates from img_header
// dims). Returns 0 on success.
int img_decode_u8(const char* path, uint8_t* out) {
  int w, h, c;
  return decode_any(path, out, &w, &h, &c);
}

// Full load pipeline: decode, resize to (ow, oh) with `filter`
// (0=box 1=bilinear 2=bicubic 3=lanczos), emit CHW float32 in [0,1].
// out must hold c*oh*ow floats, c from img_header. Returns 0 on success.
int img_load_chw_f32(const char* path, int ow, int oh, int filter,
                     float* out) {
  int w, h, c;
  if (decode_any(path, nullptr, &w, &h, &c)) return 1;
  std::vector<uint8_t> raw((size_t)w * h * c);
  if (decode_any(path, raw.data(), &w, &h, &c)) return 1;
  int64_t out_hw = (int64_t)ow * oh;

  if (ow == w && oh == h) {  // no resize: straight CHW conversion
    parallel_rows(h, [&](int64_t lo, int64_t hi) {
      for (int64_t y = lo; y < hi; ++y)
        for (int64_t x = 0; x < w; ++x) {
          const uint8_t* px = raw.data() + (y * w + x) * c;
          for (int ch = 0; ch < c; ++ch)
            out[ch * out_hw + y * w + x] = px[ch] / 255.0f;
        }
    });
    return 0;
  }

  Filter flt = get_filter(filter);
  // PIL's 8bpc path runs both passes in int32 fixed point (Resample.c,
  // PRECISION_BITS coefficients, clip8 of a pre-offset accumulator) and
  // rounds the intermediate back to uint8 between them. Replicating the
  // arithmetic bit-for-bit makes resize outputs byte-identical to
  // Image.resize, ties included.
  constexpr int PREC = 32 - 8 - 2;
  auto clip8 = [](int32_t ss) -> uint8_t {
    if (ss >= (1 << PREC << 8)) return 255;
    if (ss <= 0) return 0;
    return (uint8_t)(ss >> PREC);
  };
  auto quantize = [](const std::vector<double>& kd) {
    std::vector<int32_t> ki(kd.size());
    for (size_t i = 0; i < kd.size(); ++i)
      ki[i] = (int32_t)(kd[i] < 0 ? kd[i] * (1 << PREC) - 0.5
                                  : kd[i] * (1 << PREC) + 0.5);
    return ki;
  };
  // PIL resizes alpha modes premultiplied (RGBA->"RGBa"/LA->"La" round-trip
  // in Image.resize): mirror it, including PIL's MULDIV255 rounding in and
  // truncating x*255/a division out.
  bool has_alpha = (c == 4 || c == 2);
  if (has_alpha) {
    int64_t npx = (int64_t)w * h;
    parallel_rows(npx, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        uint8_t* px = raw.data() + i * c;
        uint32_t a = px[c - 1];
        if (a == 255) continue;
        for (int ch = 0; ch < c - 1; ++ch) {
          uint32_t t = px[ch] * a + 128;
          px[ch] = (uint8_t)(((t >> 8) + t) >> 8);
        }
      }
    });
  }
  std::vector<int> hb, vb;
  std::vector<double> hkd, vkd;
  int hks, vks;
  make_weights(w, ow, flt, hb, hkd, &hks);
  make_weights(h, oh, flt, vb, vkd, &vks);
  std::vector<int32_t> hk = quantize(hkd), vk = quantize(vkd);
  const int32_t half = 1 << (PREC - 1);
  // Horizontal pass: [h, w, c] u8 -> [h, ow, c] u8.
  std::vector<uint8_t> mid((size_t)h * ow * c);
  parallel_rows(h, [&](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const uint8_t* src = raw.data() + y * (int64_t)w * c;
      uint8_t* dst = mid.data() + y * (int64_t)ow * c;
      for (int xx = 0; xx < ow; ++xx) {
        int xmin = hb[xx * 2], n = hb[xx * 2 + 1];
        const int32_t* k = &hk[(size_t)xx * hks];
        const uint8_t* s = src + (int64_t)xmin * c;
        if (c == 3) {
          int32_t a0 = half, a1 = half, a2 = half;
          for (int x = 0; x < n; ++x, s += 3) {
            int32_t kx = k[x];
            a0 += s[0] * kx;
            a1 += s[1] * kx;
            a2 += s[2] * kx;
          }
          dst[(int64_t)xx * 3 + 0] = clip8(a0);
          dst[(int64_t)xx * 3 + 1] = clip8(a1);
          dst[(int64_t)xx * 3 + 2] = clip8(a2);
        } else {
          for (int ch = 0; ch < c; ++ch) {
            int32_t acc = half;
            for (int x = 0; x < n; ++x) acc += s[(int64_t)x * c + ch] * k[x];
            dst[(int64_t)xx * c + ch] = clip8(acc);
          }
        }
      }
    }
  });
  // Vertical pass: [h, ow, c] u8 -> CHW [c, oh, ow] f32 via a final clip8.
  // Row-major accumulation (taps outer, pixels inner) keeps the walk linear.
  int64_t row_elems = (int64_t)ow * c;
  parallel_rows(oh, [&](int64_t lo, int64_t hi) {
    std::vector<int32_t> acc(row_elems);
    for (int64_t yy = lo; yy < hi; ++yy) {
      int ymin = vb[yy * 2], n = vb[yy * 2 + 1];
      const int32_t* k = &vk[(size_t)yy * vks];
      std::fill(acc.begin(), acc.end(), half);
      for (int y = 0; y < n; ++y) {
        const uint8_t* row = mid.data() + (int64_t)(ymin + y) * row_elems;
        int32_t ky = k[y];
        for (int64_t i = 0; i < row_elems; ++i) acc[i] += row[i] * ky;
      }
      for (int64_t x = 0; x < ow; ++x) {
        if (has_alpha) {
          uint32_t a8 = clip8(acc[x * c + c - 1]);
          for (int ch = 0; ch < c - 1; ++ch) {
            uint32_t v8 = clip8(acc[x * c + ch]);
            if (a8 != 0 && a8 != 255)
              v8 = std::min<uint32_t>(255u, v8 * 255u / a8);
            out[ch * out_hw + yy * ow + x] = v8 / 255.0f;
          }
          out[(c - 1) * out_hw + yy * ow + x] = a8 / 255.0f;
        } else {
          for (int ch = 0; ch < c; ++ch)
            out[ch * out_hw + yy * ow + x] =
                clip8(acc[x * c + ch]) / 255.0f;
        }
      }
    }
  });
  return 0;
}

}  // extern "C"
