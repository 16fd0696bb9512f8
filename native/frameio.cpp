// frameio — native frame decode + geometry pipeline for ewvit_tpu.
//
// The reference's data path decodes every frame with cv2 inside the Python
// process (/root/reference/config/data_loader.py:323-331) and does geometry in
// torchvision transforms (transforms.py:91-117). At TPU ingest rates (the
// v5e chip consumes ~20k frames/s at 224px) the host decode is the
// bottleneck, so this framework moves it into a C++ library:
//
//   - PNG (libpng) and JPEG (libjpeg) decode to RGB8
//   - center-crop-square + bilinear resize to the model input size
//     (matches FrameTransform's fallback path: center square -> resize)
//   - a persistent pthread worker pool decodes a whole clip/batch of files
//     into ONE caller-owned contiguous uint8 [N, S, S, 3] buffer (zero
//     Python-side copies; the GIL is never held during decode)
//
// C ABI (ctypes-friendly), see ewvit_tpu/data/native.py for the wrapper.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

// ---------------------------------------------------------------------------
// Decoders -> RGB8 (heap buffer, caller frees)
// ---------------------------------------------------------------------------

struct Image {
  std::vector<uint8_t> data;  // H*W*3, RGB
  int h = 0, w = 0;
  bool ok() const { return h > 0 && w > 0; }
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.data.resize(size_t(img.h) * img.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return img;
}

Image decode_png(FILE* f) {
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
    img.h = img.w = 0;
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.w = int(w);
  img.h = int(h);
  img.data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img.data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  if (n >= 8 && !png_sig_cmp(magic, 0, 8)) {
    img = decode_png(f);
  } else if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  }
  fclose(f);
  return img;
}

// ---------------------------------------------------------------------------
// Geometry: center-square crop + bilinear resize to SxS (half-pixel centers,
// matching cv2 INTER_LINEAR / torch align_corners=False)
// ---------------------------------------------------------------------------

void crop_resize(const Image& img, int out_size, float crop_frac,
                 uint8_t* out) {
  // crop_frac < 1 keeps the central fraction of the square, reproducing the
  // reference's resize(450) -> center-crop(224) composition exactly
  // (crop_frac = 224/450) up to resampling (transforms.py:96-97).
  int side = img.h < img.w ? img.h : img.w;
  int full = side;
  if (crop_frac > 0.f && crop_frac < 1.f) {
    side = int(full * crop_frac + 0.5f);
    if (side < 1) side = 1;
  }
  const int top = (img.h - side) / 2;
  const int left = (img.w - side) / 2;
  const float scale = float(side) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    float sy = (oy + 0.5f) * scale - 0.5f;
    int y0 = int(sy) - (sy < 0 ? 1 : 0);  // floor
    float fy = sy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= side ? side - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= side ? side - 1 : y0 + 1);
    const uint8_t* row0 = img.data.data() + (size_t(top + y0c) * img.w + left) * 3;
    const uint8_t* row1 = img.data.data() + (size_t(top + y1c) * img.w + left) * 3;
    uint8_t* orow = out + size_t(oy) * out_size * 3;
    for (int ox = 0; ox < out_size; ++ox) {
      float sx = (ox + 0.5f) * scale - 0.5f;
      int x0 = int(sx) - (sx < 0 ? 1 : 0);
      float fx = sx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= side ? side - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= side ? side - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = row0[x0c * 3 + c], v01 = row0[x1c * 3 + c];
        float v10 = row1[x0c * 3 + c], v11 = row1[x1c * 3 + c];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        orow[ox * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Persistent worker pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> g(mu_);
      q_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> f;
      {
        std::unique_lock<std::mutex> g(mu_);
        cv_.wait(g, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        f = std::move(q_.front());
        q_.pop();
      }
      f();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* g_pool = nullptr;
std::mutex g_pool_mu;

Pool& pool(int nthreads) {
  std::lock_guard<std::mutex> g(g_pool_mu);
  if (!g_pool) {
    int n = nthreads > 0 ? nthreads
                         : int(std::thread::hardware_concurrency());
    if (n < 1) n = 1;
    g_pool = new Pool(n);
  }
  return *g_pool;
}

}  // namespace

extern "C" {

// Decode `n` image files, center-square-crop, bilinear-resize to
// `out_size`, and write RGB8 into `out` ([n, out_size, out_size, 3],
// caller-allocated). Failed decodes leave their slot zero-filled (blank-frame
// fallback ≙ data_loader.py:326-331) and are flagged 0 in `ok` (len n,
// nullable). Returns the number of successful decodes.
int ewvit_decode_batch(const char** paths, int n, int out_size,
                       float crop_frac, uint8_t* out, uint8_t* ok,
                       int nthreads) {
  const size_t stride = size_t(out_size) * out_size * 3;
  std::atomic<int> good{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;
  Pool& p = pool(nthreads);
  for (int i = 0; i < n; ++i) {
    p.submit([&, i] {
      Image img = decode_file(paths[i]);
      uint8_t* dst = out + size_t(i) * stride;
      if (img.ok()) {
        crop_resize(img, out_size, crop_frac, dst);
        if (ok) ok[i] = 1;
        good.fetch_add(1);
      } else {
        memset(dst, 0, stride);
        if (ok) ok[i] = 0;
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> g(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> g(done_mu);
  done_cv.wait(g, [&] { return done.load() == n; });
  return good.load();
}

// Decode one file; returns h<<32|w on success (buffer must hold h*w*3), 0 on
// failure. Two-call protocol: first call with out=null to get dimensions.
uint64_t ewvit_decode_file(const char* path, uint8_t* out) {
  Image img = decode_file(path);
  if (!img.ok()) return 0;
  if (out) memcpy(out, img.data.data(), img.data.size());
  return (uint64_t(img.h) << 32) | uint64_t(img.w);
}

}  // extern "C"
