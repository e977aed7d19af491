// hi3d_loader — native data-loading core for the training input pipeline.
//
// The reference loads Objaverse render frames in Python (skimage.imread +
// PIL resize per frame — sgm/data/video_dataset.py:73-79,117-131), which
// serializes 16 PNG decodes per sample on the GIL. This core does
// decode (libpng/libjpeg) → white-background composite → bilinear resize →
// [-1,1] normalize for a whole clip in parallel C++ threads, exposed through
// a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC hi3d_loader.cpp -lpng -ljpeg -lz
//        (driven by hi3d_tpu/data/native_loader.py, cached per checksum)

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgba;  // always 4 channels
  bool ok = false;
};

Image decode_png(FILE* fp) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  // normalize every variant to 8-bit RGBA
  png_set_expand(png);
  if (png_get_bit_depth(png, info) == 16) png_set_strip_16(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);

  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.rgba.resize(size_t(img.w) * img.h * 4);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.rgba.data() + size_t(y) * img.w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

Image decode_jpeg(FILE* fp) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgba.resize(size_t(img.w) * img.h * 4, 0xFF);
  std::vector<uint8_t> row(size_t(img.w) * 3);
  for (int y = 0; y < img.h; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = img.rgba.data() + size_t(y) * img.w * 4;
    for (int x = 0; x < img.w; ++x) {
      dst[4 * x + 0] = row[3 * x + 0];
      dst[4 * x + 1] = row[3 * x + 1];
      dst[4 * x + 2] = row[3 * x + 2];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* fp = fopen(path, "rb");
  if (!fp) return img;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, fp) != 4) {
    fclose(fp);
    return img;
  }
  rewind(fp);
  if (magic[0] == 0x89 && magic[1] == 'P')
    img = decode_png(fp);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    img = decode_jpeg(fp);
  fclose(fp);
  return img;
}

// white-composite + bilinear resize + [-1,1]; also emit the binary alpha mask
void process_frame(const Image& img, int out_h, int out_w, float* out_rgb,
                   float* out_mask) {
  const float sx = float(img.w) / out_w;
  const float sy = float(img.h) / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    const float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(fy));
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= img.h ? img.h - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= img.h ? img.h - 1 : y1);
    for (int ox = 0; ox < out_w; ++ox) {
      const float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = int(std::floor(fx));
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = x0 < 0 ? 0 : (x0 >= img.w ? img.w - 1 : x0);
      x1 = x1 < 0 ? 0 : (x1 >= img.w ? img.w - 1 : x1);

      float px[4];
      for (int c = 0; c < 4; ++c) {
        const float v00 = img.rgba[(size_t(y0) * img.w + x0) * 4 + c];
        const float v01 = img.rgba[(size_t(y0) * img.w + x1) * 4 + c];
        const float v10 = img.rgba[(size_t(y1) * img.w + x0) * 4 + c];
        const float v11 = img.rgba[(size_t(y1) * img.w + x1) * 4 + c];
        px[c] = (v00 * (1 - wx) + v01 * wx) * (1 - wy) +
                (v10 * (1 - wx) + v11 * wx) * wy;
      }
      const float a = px[3] / 255.0f;
      float* dst = out_rgb + (size_t(oy) * out_w + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        const float composited = px[c] * a + 255.0f * (1.0f - a);
        dst[c] = composited / 127.5f - 1.0f;
      }
      out_mask[size_t(oy) * out_w + ox] = a > 0.5f ? 1.0f : 0.0f;
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` image files into (n, out_h, out_w, 3) float32 [-1,1] +
// (n, out_h, out_w) float32 masks. `paths` = NUL-separated concatenation.
// Returns the number of frames that FAILED (0 = success).
int hi3d_load_clip(const char* paths, int n, int out_h, int out_w,
                   float* out_video, float* out_masks, int num_threads) {
  std::vector<const char*> files;
  files.reserve(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  if (num_threads <= 0)
    num_threads = int(std::thread::hardware_concurrency());
  if (num_threads > n) num_threads = n;
  if (num_threads < 1) num_threads = 1;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      Image img = decode_file(files[i]);
      if (!img.ok) {
        failures.fetch_add(1);
        continue;
      }
      process_frame(img, out_h, out_w,
                    out_video + size_t(i) * out_h * out_w * 3,
                    out_masks + size_t(i) * out_h * out_w);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

int hi3d_loader_version() { return 1; }

}  // extern "C"
