// fastvision_tpu native host kernels: batched letterbox (bilinear resize +
// center pad) for the input pipeline.
//
// Role: the reference's host data path is cv2 calls from Python per sample
// (datasets/detection_dataloader.py:43-79); the TPU framework's input
// bottleneck is the host CPU, so the hot resize+pad runs here as one C++
// pass per batch — no per-sample Python dispatch, one write into the
// pinned batch tensor, std::thread fan-out across images.
//
// Built by fastvision_tpu.native at import time (g++ -O3 -shared) and
// called through ctypes; the Python cv2 path remains as fallback.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize of src (h x w x 3, uint8) into dst region (nh x nw x 3)
// located at (top, left) inside a (size x size x 3) canvas.
void resize_into(const uint8_t* src, int h, int w, uint8_t* canvas, int size,
                 int nh, int nw, int top, int left) {
  const float sy = static_cast<float>(h) / nh;
  const float sx = static_cast<float>(w) / nw;
  for (int y = 0; y < nh; ++y) {
    // align_corners=False convention (matches cv2.INTER_LINEAR)
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), h - 1);
    int y1c = std::min(y0c + 1, h - 1);
    if (y0 < 0) { y1c = y0c; wy = 0.f; }
    uint8_t* row = canvas + ((top + y) * size + left) * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), w - 1);
      int x1c = std::min(x0c + 1, w - 1);
      if (x0 < 0) { x1c = x0c; wx = 0.f; }
      const uint8_t* p00 = src + (y0c * w + x0c) * 3;
      const uint8_t* p01 = src + (y0c * w + x1c) * 3;
      const uint8_t* p10 = src + (y1c * w + x0c) * 3;
      const uint8_t* p11 = src + (y1c * w + x1c) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = p00[c] * (1 - wy) * (1 - wx) + p01[c] * (1 - wy) * wx +
                  p10[c] * wy * (1 - wx) + p11[c] * wy * wx;
        row[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void one_image(const uint8_t* src, int h, int w, int size, uint8_t pad_value,
               uint8_t* out, float* scale, int32_t* pad_xy) {
  std::memset(out, pad_value, static_cast<size_t>(size) * size * 3);
  const float s = static_cast<float>(size) / std::max(h, w);
  const int nh = static_cast<int>(h * s + 0.5f);
  const int nw = static_cast<int>(w * s + 0.5f);
  const int top = (size - nh) / 2;
  const int left = (size - nw) / 2;
  resize_into(src, h, w, out, size, nh, nw, top, left);
  *scale = s;
  pad_xy[0] = left;
  pad_xy[1] = top;
}

}  // namespace

extern "C" {

// srcs: n pointers to HWC uint8 RGB images; hs/ws their shapes.
// out: [n, size, size, 3] uint8; scales: [n] f32; pads: [n, 2] i32 (x, y).
void letterbox_batch(const uint8_t** srcs, const int32_t* hs,
                     const int32_t* ws, int32_t n, int32_t size,
                     uint8_t pad_value, uint8_t* out, float* scales,
                     int32_t* pads, int32_t num_threads) {
  const size_t img_bytes = static_cast<size_t>(size) * size * 3;
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) {
      one_image(srcs[i], hs[i], ws[i], size, pad_value, out + i * img_bytes,
                scales + i, pads + i * 2);
    }
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int>* counter = new std::atomic<int>(0);
  int workers = std::min<int>(num_threads, n);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&, t]() {
      while (true) {
        int i = counter->fetch_add(1);
        if (i >= n) break;
        one_image(srcs[i], hs[i], ws[i], size, pad_value, out + i * img_bytes,
                  scales + i, pads + i * 2);
      }
    });
  }
  for (auto& th : pool) th.join();
  delete counter;
}

}  // extern "C"
