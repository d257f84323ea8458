// fastloader — native JPEG decode + bilinear resize + normalize.
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
//
// Build: native/build.sh  (g++ -O3 -shared -ljpeg)

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

int load_one(const char* path, int s, const float* mean, const float* stdv,
             float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(len > 0 ? len : 0);
  if (len <= 0 || fread(data.data(), 1, len, f) != static_cast<size_t>(len)) {
    fclose(f);
    return -2;
  }
  fclose(f);
  int w = 0, h = 0;
  uint8_t* rgb = decode_jpeg(data.data(), data.size(), &w, &h);
  if (!rgb) return -3;
  resize_normalize(rgb, w, h, s, mean, stdv, out);
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

}  // extern "C"
