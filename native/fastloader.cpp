// fastloader — native JPEG decode + resize + augment + normalize.
//
// The hot host-side path of the input pipeline: turning image files into
// normalized float32 (S, S, 3) tensors ready for device_put. The
// reference does this through PIL + torchvision transforms in DataLoader
// worker processes; here it is one C++ call per batch with a thread pool
// (PIL's Python-side loop and per-op temporaries disappear).
//
// Exposed C ABI (consumed via cffi, vivqa_tpu/data/fastloader.py):
//   fl_decode_resize_normalize: one JPEG buffer -> float32 HWC
//   fl_batch_load:              N file paths    -> float32 NHWC (threaded)
//   fl_batch_load_train:        N file paths    -> augmented float32 NHWC
//                               (flip / color jitter / grayscale /
//                                rotation / translation / random erasing,
//                                matching the PIL presets in
//                                vivqa_tpu/data/augmentation.py; the
//                                geometric ops compose into ONE affine
//                                bilinear sample instead of PIL's three
//                                sequential resampling passes)
//
// Build: native/build.sh  (g++ -O3 -shared -ljpeg)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer to tightly packed RGB8. Returns malloc'd buffer
// (caller frees) or nullptr.
uint8_t* decode_jpeg(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  size_t stride = static_cast<size_t>(*w) * 3;
  uint8_t* buf = static_cast<uint8_t*>(malloc(stride * (*h)));
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return buf;
}

// Bilinear resize RGB8 (h, w) -> normalized float32 (s, s, 3).
void resize_normalize(const uint8_t* src, int w, int h, int s,
                      const float* mean, const float* stdv, float* out) {
  const float sx = static_cast<float>(w) / s;
  const float sy = static_cast<float>(h) / s;
  for (int y = 0; y < s; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < s; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = src + (y0 * w + x0) * 3;
      const uint8_t* p01 = src + (y0 * w + x1) * 3;
      const uint8_t* p10 = src + (y1 * w + x0) * 3;
      const uint8_t* p11 = src + (y1 * w + x1) * 3;
      float* o = out + (y * s + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float v = (top + wy * (bot - top)) / 255.0f;
        o[c] = (v - mean[c]) / stdv[c];
      }
    }
  }
}

inline float clampf(float v) { return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v); }

// Read a whole file into `data`. Returns 0 on success.
int read_file(const char* path, std::vector<uint8_t>* data) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  data->resize(len > 0 ? len : 0);
  if (len <= 0 || fread(data->data(), 1, len, f) != static_cast<size_t>(len)) {
    fclose(f);
    return -2;
  }
  fclose(f);
  return 0;
}

// -- training-path augmentation ---------------------------------------------

// splitmix64: per-image deterministic RNG stream from (seed, index).
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next_u64() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // uniform in [0, 1)
  float next_f32() {
    return static_cast<float>(next_u64() >> 40) * (1.0f / 16777216.0f);
  }
  // uniform in [lo, hi)
  float uniform(float lo, float hi) { return lo + (hi - lo) * next_f32(); }
  // uniform integer in [lo, hi] inclusive
  int randint(int lo, int hi) {
    return lo + static_cast<int>(next_u64() % (static_cast<uint64_t>(hi - lo) + 1));
  }
};

struct TrainAugParams {
  float flip_p;
  float jitter;     // brightness/contrast/saturation factor range +-jitter
  float gray_p;
  float rot_deg;    // rotation sampled uniform in [-rot_deg, +rot_deg]
  float trans;      // translation as a fraction of width/height
  float erase_p;
};

// Augmented sample: compose flip + rotation + translation + scale into one
// inverse affine map (output pixel -> source pixel), bilinear sample with
// black fill out of bounds (PIL rotate/transform default), then apply
// color jitter / grayscale / normalize / random erasing.
void augment_sample(const uint8_t* src, int w, int h, int s,
                    const float* mean, const float* stdv,
                    const TrainAugParams& p, Rng& rng, float* out) {
  // draw all random decisions up front (stable order)
  const bool flip = rng.next_f32() < p.flip_p;
  float fb = 1.0f, fc = 1.0f, fs = 1.0f;
  if (p.jitter > 0.0f) {
    fb = 1.0f + rng.uniform(-p.jitter, p.jitter);   // brightness
    fc = 1.0f + rng.uniform(-p.jitter, p.jitter);   // contrast
    fs = 1.0f + rng.uniform(-p.jitter, p.jitter);   // saturation
  }
  const bool gray = p.gray_p > 0.0f && rng.next_f32() < p.gray_p;
  float angle = 0.0f;
  if (p.rot_deg > 0.0f)
    angle = rng.uniform(-p.rot_deg, p.rot_deg) * 3.14159265358979f / 180.0f;
  float dx = 0.0f, dy = 0.0f;
  if (p.trans > 0.0f) {
    dx = rng.uniform(-p.trans, p.trans) * w;
    dy = rng.uniform(-p.trans, p.trans) * h;
  }

  // Inverse map: out (x, y) -> source (sx, sy).
  //   1. scale s -> (w, h)
  //   2. rotate by -angle about the source center
  //   3. translate by (dx, dy) (inverse: add — PIL's AFFINE matrix is the
  //      inverse map with +dx meaning "sample from x+dx")
  //   4. horizontal flip in source space
  const float scale_x = static_cast<float>(w) / s;
  const float scale_y = static_cast<float>(h) / s;
  const float ca = cosf(angle), sa = sinf(angle);
  const float cx = 0.5f * w, cy = 0.5f * h;

  // PIL Contrast uses the mean of the L (luma) image as the pivot —
  // only worth a full pass when the contrast factor is active.
  float luma_mean = 0.5f;
  if (fc != 1.0f) {
    float luma_sum = 0.0f;
    const size_t npx = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < npx; ++i) {
      const uint8_t* q = src + i * 3;
      luma_sum += 0.299f * q[0] + 0.587f * q[1] + 0.114f * q[2];
    }
    luma_mean = luma_sum / (npx > 0 ? npx : 1) / 255.0f;
  }

  for (int y = 0; y < s; ++y) {
    for (int x = 0; x < s; ++x) {
      // center-aligned scale to source coords
      float sx0 = (x + 0.5f) * scale_x - 0.5f;
      float sy0 = (y + 0.5f) * scale_y - 0.5f;
      // rotate about center (inverse rotation)
      float rx = ca * (sx0 - cx) - sa * (sy0 - cy) + cx;
      float ry = sa * (sx0 - cx) + ca * (sy0 - cy) + cy;
      // translation (inverse)
      rx += dx;
      ry += dy;
      // flip
      if (flip) rx = (w - 1) - rx;

      float* o = out + (static_cast<size_t>(y) * s + x) * 3;
      float px[3] = {0.0f, 0.0f, 0.0f};     // black fill out of bounds
      if (rx >= -1.0f && rx < w && ry >= -1.0f && ry < h) {
        int x0 = rx < 0 ? -1 : static_cast<int>(rx);
        int y0 = ry < 0 ? -1 : static_cast<int>(ry);
        float wx = rx - x0, wy = ry - y0;
        int x0c = x0 < 0 ? 0 : x0, x1c = x0 + 1 >= w ? w - 1 : x0 + 1;
        int y0c = y0 < 0 ? 0 : y0, y1c = y0 + 1 >= h ? h - 1 : y0 + 1;
        // zero-weight rows/cols outside the image (black border)
        float w00 = (x0 >= 0 && y0 >= 0) ? (1 - wx) * (1 - wy) : 0.0f;
        float w01 = (x0 + 1 < w && y0 >= 0) ? wx * (1 - wy) : 0.0f;
        float w10 = (x0 >= 0 && y0 + 1 < h) ? (1 - wx) * wy : 0.0f;
        float w11 = (x0 + 1 < w && y0 + 1 < h) ? wx * wy : 0.0f;
        const uint8_t* p00 = src + (static_cast<size_t>(y0c) * w + x0c) * 3;
        const uint8_t* p01 = src + (static_cast<size_t>(y0c) * w + x1c) * 3;
        const uint8_t* p10 = src + (static_cast<size_t>(y1c) * w + x0c) * 3;
        const uint8_t* p11 = src + (static_cast<size_t>(y1c) * w + x1c) * 3;
        for (int c = 0; c < 3; ++c)
          px[c] = (w00 * p00[c] + w01 * p01[c] + w10 * p10[c] +
                   w11 * p11[c]) / 255.0f;
      }

      // color jitter (PIL enhance semantics, applied in PIL's order:
      // brightness -> contrast -> saturation)
      float r = px[0] * fb, g = px[1] * fb, b = px[2] * fb;
      r = luma_mean + fc * (r - luma_mean);
      g = luma_mean + fc * (g - luma_mean);
      b = luma_mean + fc * (b - luma_mean);
      float l = 0.299f * r + 0.587f * g + 0.114f * b;
      r = l + fs * (r - l);
      g = l + fs * (g - l);
      b = l + fs * (b - l);
      if (gray) {
        float gl = 0.299f * r + 0.587f * g + 0.114f * b;
        r = g = b = gl;
      }
      o[0] = (clampf(r) - mean[0]) / stdv[0];
      o[1] = (clampf(g) - mean[1]) / stdv[1];
      o[2] = (clampf(b) - mean[2]) / stdv[2];
    }
  }

  // random erasing: uniform-value rectangle (pre-normalization value)
  if (p.erase_p > 0.0f && rng.next_f32() < p.erase_p) {
    int eh = rng.randint(s / 8, s / 4 > s / 8 ? s / 4 : s / 8);
    int ew = rng.randint(s / 8, s / 4 > s / 8 ? s / 4 : s / 8);
    int ey = rng.randint(0, s - eh);
    int ex = rng.randint(0, s - ew);
    float v = rng.next_f32();
    for (int y = ey; y < ey + eh; ++y)
      for (int x = ex; x < ex + ew; ++x) {
        float* o = out + (static_cast<size_t>(y) * s + x) * 3;
        for (int c = 0; c < 3; ++c) o[c] = (v - mean[c]) / stdv[c];
      }
  }
}

int load_one(const char* path, int s, const float* mean, const float* stdv,
             float* out) {
  std::vector<uint8_t> data;
  int rc = read_file(path, &data);
  if (rc != 0) return rc;
  int w = 0, h = 0;
  uint8_t* rgb = decode_jpeg(data.data(), data.size(), &w, &h);
  if (!rgb) return -3;
  resize_normalize(rgb, w, h, s, mean, stdv, out);
  free(rgb);
  return 0;
}

int load_one_train(const char* path, int s, const float* mean,
                   const float* stdv, const TrainAugParams& p, Rng& rng,
                   float* out) {
  std::vector<uint8_t> data;
  int rc = read_file(path, &data);
  if (rc != 0) return rc;
  int w = 0, h = 0;
  uint8_t* rgb = decode_jpeg(data.data(), data.size(), &w, &h);
  if (!rgb) return -3;
  augment_sample(rgb, w, h, s, mean, stdv, p, rng, out);
  free(rgb);
  return 0;
}

}  // namespace

extern "C" {

// One in-memory JPEG -> normalized (s, s, 3) float32. Returns 0 on ok.
int fl_decode_resize_normalize(const uint8_t* jpeg, size_t len, int s,
                               const float* mean, const float* stdv,
                               float* out) {
  int w = 0, h = 0;
  uint8_t* rgb = decode_jpeg(jpeg, len, &w, &h);
  if (!rgb) return -3;
  resize_normalize(rgb, w, h, s, mean, stdv, out);
  free(rgb);
  return 0;
}

// N file paths -> (N, s, s, 3) float32, `threads` workers. Failed images
// are zero-filled and flagged in `status[i]` (0 = ok).
int fl_batch_load(const char** paths, int n, int s, const float* mean,
                  const float* stdv, float* out, int* status, int threads) {
  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  std::atomic_int next{0};
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + static_cast<size_t>(i) * s * s * 3;
      int rc = load_one(paths[i], s, mean, stdv, dst);
      if (rc != 0) memset(dst, 0, sizeof(float) * s * s * 3);
      status[i] = rc;
    }
  };
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Training-path batch: decode + one-pass affine augment + jitter +
// normalize + erase, per-image RNG derived from (seed, index) so a batch
// is deterministic given the seed regardless of thread scheduling.
int fl_batch_load_train(const char** paths, int n, int s, const float* mean,
                        const float* stdv, float* out, int* status,
                        int threads, uint64_t seed, float flip_p,
                        float jitter, float gray_p, float rot_deg,
                        float trans, float erase_p) {
  if (threads < 1) threads = 1;
  TrainAugParams p{flip_p, jitter, gray_p, rot_deg, trans, erase_p};
  std::vector<std::thread> pool;
  std::atomic_int next{0};
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + static_cast<size_t>(i) * s * s * 3;
      Rng rng(seed * 0x9e3779b97f4a7c15ull + static_cast<uint64_t>(i));
      int rc = load_one_train(paths[i], s, mean, stdv, p, rng, dst);
      if (rc != 0) memset(dst, 0, sizeof(float) * s * s * 3);
      status[i] = rc;
    }
  };
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
