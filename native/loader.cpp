// yolo_ms_tpu native data loader — JPEG/PNG decode + resize, C++.
//
// TPU-native equivalent of the decode path the reference delegates to
// PIL/libjpeg inside DataLoader worker subprocesses (reference
// dataset.py:154, SURVEY.md §2.1). Design:
//
//   - libjpeg / libpng decode straight into caller-provided buffers
//   - fused bilinear resize during/after decode (JPEG DCT-scaling is used to
//     decode at the nearest 1/1, 1/2, 1/4, 1/8 scale >= target, cutting IDCT
//     and memory traffic before the bilinear pass)
//   - a pthread worker pool for batch decode (decode releases the GIL on the
//     Python side; this pool parallelizes across images within one call)
//   - zero Python-object traffic: the Python binding (ctypes,
//     yolo_ms_tpu/data/native_loader.py) passes file paths and a single
//     preallocated uint8 output block
//
// Build: native/build.sh  ->  libyolodata.so
//
// Exported C ABI:
//   int yd_decode_image(const char* path, uint8_t* out, int* w, int* h,
//                       int max_bytes);
//   int yd_decode_resize(const char* path, uint8_t* out, int out_h, int out_w);
//   int yd_decode_resize_batch(const char** paths, int n, uint8_t* out,
//                              int out_h, int out_w, int num_threads);
// Return 0 on success, negative error codes on failure.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrDecode = -2;
constexpr int kErrTooLarge = -3;
constexpr int kErrFormat = -4;

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB. If target_w/h > 0, uses libjpeg DCT scaling to
// decode at the smallest power-of-two fraction whose size still covers the
// target. Caller owns *out (malloc'd).
int decode_jpeg(FILE* f, uint8_t** out, int* w, int* h, int target_w,
                int target_h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  uint8_t* buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    free(buffer);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (target_w > 0 && target_h > 0) {
    // pick scale 8/num so that scaled dims >= target
    unsigned num = 8;
    while (num > 1) {
      unsigned cand = num - 1;
      if ((cinfo.image_width * cand) / 8 >= static_cast<unsigned>(target_w) &&
          (cinfo.image_height * cand) / 8 >= static_cast<unsigned>(target_h)) {
        num = cand;
      } else {
        break;
      }
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }

  jpeg_start_decompress(&cinfo);
  const int width = cinfo.output_width;
  const int height = cinfo.output_height;
  const int stride = width * cinfo.output_components;
  buffer = static_cast<uint8_t*>(malloc(static_cast<size_t>(stride) * height));
  if (!buffer) {
    jpeg_destroy_decompress(&cinfo);
    return kErrTooLarge;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (cinfo.output_components != 3) {
    // grayscale -> expand to RGB
    uint8_t* rgb = static_cast<uint8_t*>(
        malloc(static_cast<size_t>(width) * height * 3));
    if (!rgb) {
      free(buffer);
      return kErrTooLarge;
    }
    for (size_t i = 0; i < static_cast<size_t>(width) * height; ++i) {
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = buffer[i];
    }
    free(buffer);
    buffer = rgb;
  }
  *out = buffer;
  *w = width;
  *h = height;
  return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int decode_png(FILE* f, uint8_t** out, int* w, int* h) {
  uint8_t header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    return kErrFormat;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  uint8_t* buffer = nullptr;
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(buffer);
    return kErrDecode;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA) {
    png_set_gray_to_rgb(png);
  }
  png_set_strip_alpha(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  const int width = png_get_image_width(png, info);
  const int height = png_get_image_height(png, info);
  const size_t stride = png_get_rowbytes(png, info);
  buffer = static_cast<uint8_t*>(malloc(stride * height));
  if (!buffer) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrTooLarge;
  }
  rows.resize(height);
  for (int y = 0; y < height; ++y) rows[y] = buffer + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  if (stride != static_cast<size_t>(width) * 3) {
    // stride includes padding or alpha already stripped; repack defensively
    uint8_t* rgb = static_cast<uint8_t*>(
        malloc(static_cast<size_t>(width) * height * 3));
    if (!rgb) {
      free(buffer);
      return kErrTooLarge;
    }
    const size_t comp = stride / width;
    for (int y = 0; y < height; ++y) {
      for (int x = 0; x < width; ++x) {
        memcpy(rgb + (static_cast<size_t>(y) * width + x) * 3,
               buffer + y * stride + x * comp, 3);
      }
    }
    free(buffer);
    buffer = rgb;
  }
  *out = buffer;
  *w = width;
  *h = height;
  return 0;
}

// ---------------------------------------------------------------------------
// Decode dispatch + bilinear resize
// ---------------------------------------------------------------------------

int decode_file(const char* path, uint8_t** out, int* w, int* h, int target_w,
                int target_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  int c1 = fgetc(f);
  int c2 = fgetc(f);
  rewind(f);
  int rc;
  if (c1 == 0xFF && c2 == 0xD8) {
    rc = decode_jpeg(f, out, w, h, target_w, target_h);
  } else if (c1 == 0x89 && c2 == 'P') {
    rc = decode_png(f, out, w, h);
  } else {
    rc = kErrFormat;
  }
  fclose(f);
  return rc;
}

// Bilinear resize RGB uint8 (half-pixel centers, matches
// cv2.INTER_LINEAR / the reference's A.Resize interpolation).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  if (sw == dw && sh == dh) {
    memcpy(dst, src, static_cast<size_t>(dw) * dh * 3);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> fxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    fxs[x] = fx - x0;
    x0s[x] = std::clamp(x0, 0, sw - 1);
    x1s[x] = std::clamp(x0 + 1, 0, sw - 1);
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* r0 = src + static_cast<size_t>(y0c) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1c) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float wx = fxs[x];
      const int x0 = x0s[x] * 3, x1 = x1s[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 + c] * (1 - wx) + r0[x1 + c] * wx;
        float bot = r1[x0 + c] * (1 - wx) + r1[x1 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode to original size. out must hold max_bytes; fails if image larger.
int yd_decode_image(const char* path, uint8_t* out, int* w, int* h,
                    int max_bytes) {
  uint8_t* buf = nullptr;
  int rc = decode_file(path, &buf, w, h, 0, 0);
  if (rc != 0) return rc;
  const size_t need = static_cast<size_t>(*w) * (*h) * 3;
  if (need > static_cast<size_t>(max_bytes)) {
    free(buf);
    return kErrTooLarge;
  }
  memcpy(out, buf, need);
  free(buf);
  return 0;
}

// Decode + bilinear resize to (out_h, out_w). out: out_h*out_w*3 bytes.
int yd_decode_resize(const char* path, uint8_t* out, int out_h, int out_w) {
  uint8_t* buf = nullptr;
  int w = 0, h = 0;
  int rc = decode_file(path, &buf, &w, &h, out_w, out_h);
  if (rc != 0) return rc;
  resize_bilinear(buf, w, h, out, out_w, out_h);
  free(buf);
  return 0;
}

// Batch decode+resize with a thread pool. out: n*out_h*out_w*3 bytes.
// Returns 0 if all succeeded; otherwise the first error code (failed slots
// are zero-filled).
int yd_decode_resize_batch(const char** paths, int n, uint8_t* out, int out_h,
                           int out_w, int num_threads) {
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next{0};
  std::atomic<int> first_err{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = yd_decode_resize(paths[i], out + i * img_bytes, out_h, out_w);
      if (rc != 0) {
        memset(out + i * img_bytes, 0, img_bytes);
        int expected = 0;
        first_err.compare_exchange_strong(expected, rc);
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt - 1);
  for (int t = 1; t < nt; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return first_err.load();
}

}  // extern "C"
