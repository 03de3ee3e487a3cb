// mdloader — native image-decode + resize + batch-assembly pipeline.
//
// TPU-native equivalent of the host-side work the reference delegates to
// DataLoaders.jl worker threads + ImageTransformations (SURVEY.md §2b):
// PNG/JPEG decode (libpng/libjpeg), float bilinear resize, grayscale
// conversion, and multi-threaded triplet batch assembly, exposed through a
// plain C ABI consumed from Python via ctypes (no pybind11 in this image).
//
// The goal is to keep 8+ chips fed: one v5e step at ~25 ms for batch 4 means
// the host must decode+resize 12 frames in <25 ms; PIL on one core manages
// ~4 ms/frame (~48 ms/triplet-batch) while this pipeline is ~3x faster per
// core and scales with threads.

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // h*w*c, row-major
};

bool load_png(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  img->w = (int)w;
  img->h = (int)h;
  img->c = channels;
  img->data.resize((size_t)w * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; i++)
    rows[i] = img->data.data() + (size_t)i * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool load_jpeg(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->c = cinfo.output_components;
  img->data.resize((size_t)img->w * img->h * img->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->data.data() + (size_t)cinfo.output_scanline * img->w * img->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool load_image(const char* path, Image* img) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".jpg") == 0 || strcmp(path + n - 5, ".jpeg") == 0))
    return load_jpeg(path, img);
  if (load_png(path, img)) return true;
  return load_jpeg(path, img);
}

// Precomputed separable resampling weights, PIL-compatible: half-pixel
// centers with triangle (bilinear) filter whose support scales with the
// downsampling factor (antialiasing — what Pillow's BILINEAR does). Using
// the same algorithm keeps the native and PIL loader paths interchangeable.
struct ResampleAxis {
  std::vector<int> start;       // first source index per output index
  std::vector<int> count;       // taps per output index
  std::vector<float> weights;   // flattened [out][tap]
  int max_taps = 0;
};

ResampleAxis build_axis(int in_size, int out_size) {
  ResampleAxis ax;
  double scale = (double)in_size / out_size;
  double support = scale < 1.0 ? 1.0 : scale;  // triangle filter, radius 1
  int max_taps = (int)ceil(support * 2.0) + 2;
  ax.start.resize(out_size);
  ax.count.resize(out_size);
  ax.weights.assign((size_t)out_size * max_taps, 0.f);
  ax.max_taps = max_taps;
  double inv = scale < 1.0 ? 1.0 : 1.0 / scale;
  for (int o = 0; o < out_size; o++) {
    double center = (o + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    int n = xmax - xmin;
    for (int k = 0; k < n; k++) {
      double x = (xmin + k + 0.5 - center) * inv;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (wgt < 0) wgt = 0;
      ax.weights[(size_t)o * max_taps + k] = (float)wgt;
      total += wgt;
    }
    if (total > 0)
      for (int k = 0; k < n; k++)
        ax.weights[(size_t)o * max_taps + k] /= (float)total;
    ax.start[o] = xmin;
    ax.count[o] = n;
  }
  return ax;
}

// uint8 (h,w,c) -> float32 (out_h, out_w, out_c) in [0,1], separable
// antialiased resize + optional ITU-R 601 grayscale conversion (matching
// PIL convert("L") applied before the resize).
void resize_to_float(const Image& src, int out_w, int out_h, int out_c, float* out) {
  const bool to_gray = (out_c == 1 && src.c >= 3);
  const int work_c = to_gray ? 1 : out_c;

  // convert to float planes (and gray if needed)
  std::vector<float> fsrc((size_t)src.h * src.w * work_c);
  for (int y = 0; y < src.h; y++) {
    const uint8_t* row = src.data.data() + (size_t)y * src.w * src.c;
    float* frow = fsrc.data() + (size_t)y * src.w * work_c;
    for (int x = 0; x < src.w; x++) {
      const uint8_t* p = row + (size_t)x * src.c;
      if (to_gray) {
        frow[x] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) / 255.f;
      } else {
        for (int ch = 0; ch < work_c; ch++) {
          int sc = src.c == 1 ? 0 : ch;  // replicate gray into RGB if needed
          frow[(size_t)x * work_c + ch] = p[sc] / 255.f;
        }
      }
    }
  }

  ResampleAxis ah = build_axis(src.w, out_w);
  ResampleAxis av = build_axis(src.h, out_h);

  // horizontal pass: (src.h, out_w, work_c)
  std::vector<float> tmp((size_t)src.h * out_w * work_c);
  for (int y = 0; y < src.h; y++) {
    const float* srow = fsrc.data() + (size_t)y * src.w * work_c;
    float* trow = tmp.data() + (size_t)y * out_w * work_c;
    for (int ox = 0; ox < out_w; ox++) {
      const float* wrow = ah.weights.data() + (size_t)ox * ah.max_taps;
      for (int ch = 0; ch < work_c; ch++) {
        float acc = 0.f;
        for (int k = 0; k < ah.count[ox]; k++)
          acc += wrow[k] * srow[(size_t)(ah.start[ox] + k) * work_c + ch];
        trow[(size_t)ox * work_c + ch] = acc;
      }
    }
  }

  // vertical pass: (out_h, out_w, work_c)
  for (int oy = 0; oy < out_h; oy++) {
    const float* wcol = av.weights.data() + (size_t)oy * av.max_taps;
    float* orow = out + (size_t)oy * out_w * out_c;
    for (int ox = 0; ox < out_w; ox++) {
      for (int ch = 0; ch < work_c; ch++) {
        float acc = 0.f;
        for (int k = 0; k < av.count[oy]; k++)
          acc += wcol[k] *
                 tmp[((size_t)(av.start[oy] + k) * out_w + ox) * work_c + ch];
        orow[(size_t)ox * out_c + ch] = acc;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `path`, resize to (out_h, out_w), convert to `channels` (1=gray),
// write float32 [0,1] HWC into `out`. Returns 0 on success.
int md_load_resize(const char* path, int out_w, int out_h, int channels, float* out) {
  Image img;
  if (!load_image(path, &img)) return 1;
  resize_to_float(img, out_w, out_h, channels, out);
  return 0;
}

// Load a horizontal strip of `n_frames` frames each `frame_w` wide (Depth10k
// layout, reference src/dtk.jl:36) at native resolution into
// out (n_frames, h, frame_w, channels). Returns 0 on success; out_h receives
// the strip height.
int md_load_strip(const char* path, int frame_w, int n_frames, int channels,
                  float* out, int* out_h) {
  Image img;
  if (!load_image(path, &img)) return 1;
  if (img.w < frame_w * n_frames) return 2;
  *out_h = img.h;
  for (int f = 0; f < n_frames; f++) {
    Image sub;
    sub.w = frame_w;
    sub.h = img.h;
    sub.c = img.c;
    sub.data.resize((size_t)frame_w * img.h * img.c);
    for (int y = 0; y < img.h; y++)
      memcpy(sub.data.data() + (size_t)y * frame_w * img.c,
             img.data.data() + ((size_t)y * img.w + (size_t)f * frame_w) * img.c,
             (size_t)frame_w * img.c);
    resize_to_float(sub, frame_w, img.h, channels,
                    out + (size_t)f * img.h * frame_w * channels);
  }
  return 0;
}

// Threaded triplet batch: paths is n_triplets*3 C strings; out is
// (n_triplets, 3, out_h, out_w, channels) float32. Returns number of failed
// frames (0 = full success).
int md_load_triplet_batch(const char** paths, int n_triplets, int out_w,
                          int out_h, int channels, int n_threads, float* out) {
  std::atomic<int> next(0), failures(0);
  const size_t frame_elems = (size_t)out_w * out_h * channels;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_triplets * 3) return;
      float* dst = out + (size_t)i * frame_elems;
      if (md_load_resize(paths[i], out_w, out_h, channels, dst) != 0)
        failures.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt - 1; t++) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
