// Native host-side image preprocessing for the data loader.
//
// The reference's host pipeline does per-camera PIL resize/crop + numpy
// normalize in Python workers (`datasets/pipelines/augment.py:46-92`,
// `transform.py:285-321`) — at 6x 1600x900 -> 640x352 per frame this is the
// dominant host cost. This library fuses resize (bilinear) + crop + flip +
// BGR->RGB + mean/std normalization into one multithreaded pass, exposed via
// a C ABI for ctypes (no pybind11 dependency).
//
// Build: tools/build_native.sh  ->  hipad_tpu/data/libhipad_io.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Params {
  int src_h, src_w;      // input image
  int resize_w, resize_h; // resize target (full image)
  int crop_x, crop_y;    // crop origin in resized coords
  int out_h, out_w;      // crop size == network input
  int flip;              // horizontal flip after crop
  float mean[3], std[3]; // RGB stats
  int to_rgb;            // swap BGR -> RGB
};

// One output pixel: map through flip -> crop -> inverse resize, bilinear
// sample the uint8 source, normalize.
inline void process_rows(const uint8_t* src, float* dst, const Params& p,
                         int row_begin, int row_end) {
  const float sx = static_cast<float>(p.src_w) / p.resize_w;
  const float sy = static_cast<float>(p.src_h) / p.resize_h;
  for (int oy = row_begin; oy < row_end; ++oy) {
    const int ry = oy + p.crop_y;
    // PIL-style resize sampling: center-aligned
    float fy = (ry + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(p.src_h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, p.src_h - 1);
    const float wy = fy - y0;
    float* out_row = dst + static_cast<size_t>(oy) * p.out_w * 3;
    for (int ox = 0; ox < p.out_w; ++ox) {
      const int cx = p.flip ? (p.out_w - 1 - ox) : ox;
      const int rx = cx + p.crop_x;
      float fx = (rx + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(p.src_w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, p.src_w - 1);
      const float wx = fx - x0;
      const uint8_t* r0 = src + (static_cast<size_t>(y0) * p.src_w + x0) * 3;
      const uint8_t* r1 = src + (static_cast<size_t>(y0) * p.src_w + x1) * 3;
      const uint8_t* r2 = src + (static_cast<size_t>(y1) * p.src_w + x0) * 3;
      const uint8_t* r3 = src + (static_cast<size_t>(y1) * p.src_w + x1) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v =
            (1 - wy) * ((1 - wx) * r0[c] + wx * r1[c]) +
            wy * ((1 - wx) * r2[c] + wx * r3[c]);
        // channel in the *output* color order
        const int oc = p.to_rgb ? (2 - c) : c;
        out_row[ox * 3 + oc] = (v - p.mean[oc]) / p.std[oc];
      }
    }
  }
}

}  // namespace

extern "C" {

// Preprocess a multi-camera frame.
//   src:  num_cams contiguous HxWx3 uint8 images (BGR),
//   dst:  num_cams x out_h x out_w x 3 float32,
//   one Params per call shared by all cameras.
void preprocess_cameras(const uint8_t* src, float* dst, int num_cams,
                        int src_h, int src_w, int resize_w, int resize_h,
                        int crop_x, int crop_y, int out_h, int out_w, int flip,
                        const float* mean, const float* std_, int to_rgb,
                        int num_threads) {
  Params p;
  p.src_h = src_h; p.src_w = src_w;
  p.resize_w = resize_w; p.resize_h = resize_h;
  p.crop_x = crop_x; p.crop_y = crop_y;
  p.out_h = out_h; p.out_w = out_w;
  p.flip = flip; p.to_rgb = to_rgb;
  std::memcpy(p.mean, mean, 3 * sizeof(float));
  std::memcpy(p.std, std_, 3 * sizeof(float));

  const int total_rows = num_cams * out_h;
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, total_rows));

  std::atomic<int> next_chunk{0};
  const int chunk = 16;  // rows per work unit
  const int n_chunks = (total_rows + chunk - 1) / chunk;

  auto worker = [&]() {
    for (;;) {
      const int c = next_chunk.fetch_add(1);
      if (c >= n_chunks) return;
      int row = c * chunk;
      const int row_end = std::min(row + chunk, total_rows);
      while (row < row_end) {
        const int cam = row / out_h;
        const int cam_row = row % out_h;
        const int cam_row_end =
            std::min(out_h, cam_row + (row_end - row));
        process_rows(src + static_cast<size_t>(cam) * src_h * src_w * 3,
                     dst + static_cast<size_t>(cam) * out_h * out_w * 3, p,
                     cam_row, cam_row_end);
        row += cam_row_end - cam_row;
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 1; t < num_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
}

// Serving variant of preprocess_cameras: identical resize+crop+flip
// geometry and bilinear sampling, but the output stays uint8 (rounded to
// nearest) and un-normalized — the closed-loop agent ships uint8 frames to
// the device (4x less link traffic) and fuses (x-mean)/std into the jitted
// forward. src is num_cams contiguous HxWx3 uint8; dst num_cams x out_h x
// out_w x 3 uint8; to_rgb swaps the channel order (0 when src is already
// RGB, as CARLA camera frames are).
void resize_crop_cameras_u8(const uint8_t* src, uint8_t* dst, int num_cams,
                            int src_h, int src_w, int resize_w, int resize_h,
                            int crop_x, int crop_y, int out_h, int out_w,
                            int flip, int to_rgb, int num_threads) {
  Params p;
  p.src_h = src_h; p.src_w = src_w;
  p.resize_w = resize_w; p.resize_h = resize_h;
  p.crop_x = crop_x; p.crop_y = crop_y;
  p.out_h = out_h; p.out_w = out_w;
  p.flip = flip; p.to_rgb = to_rgb;

  const float sx = static_cast<float>(src_w) / resize_w;
  const float sy = static_cast<float>(src_h) / resize_h;
  const int total_rows = num_cams * out_h;
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, total_rows));

  std::atomic<int> next_row{0};
  auto worker = [&]() {
    for (;;) {
      const int row = next_row.fetch_add(1);
      if (row >= total_rows) return;
      const int cam = row / out_h;
      const int oy = row % out_h;
      const uint8_t* s = src + static_cast<size_t>(cam) * src_h * src_w * 3;
      uint8_t* out_row = dst + (static_cast<size_t>(cam) * out_h + oy) *
                                   out_w * 3;
      const int ry = oy + p.crop_y;
      float fy = (ry + 0.5f) * sy - 0.5f;
      fy = std::max(0.0f, std::min(fy, static_cast<float>(src_h - 1)));
      const int y0 = static_cast<int>(fy);
      const int y1 = std::min(y0 + 1, src_h - 1);
      const float wy = fy - y0;
      for (int ox = 0; ox < out_w; ++ox) {
        const int cx = p.flip ? (out_w - 1 - ox) : ox;
        const int rx = cx + p.crop_x;
        float fx = (rx + 0.5f) * sx - 0.5f;
        fx = std::max(0.0f, std::min(fx, static_cast<float>(src_w - 1)));
        const int x0 = static_cast<int>(fx);
        const int x1 = std::min(x0 + 1, src_w - 1);
        const float wx = fx - x0;
        const uint8_t* r0 = s + (static_cast<size_t>(y0) * src_w + x0) * 3;
        const uint8_t* r1 = s + (static_cast<size_t>(y0) * src_w + x1) * 3;
        const uint8_t* r2 = s + (static_cast<size_t>(y1) * src_w + x0) * 3;
        const uint8_t* r3 = s + (static_cast<size_t>(y1) * src_w + x1) * 3;
        for (int c = 0; c < 3; ++c) {
          const float v =
              (1 - wy) * ((1 - wx) * r0[c] + wx * r1[c]) +
              wy * ((1 - wx) * r2[c] + wx * r3[c]);
          const int oc = p.to_rgb ? (2 - c) : c;
          const int q = static_cast<int>(v + 0.5f);
          out_row[ox * 3 + oc] =
              static_cast<uint8_t>(std::max(0, std::min(255, q)));
        }
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 1; t < num_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
}

// Dense multi-scale LiDAR depth rasterization (`transform.py:57-104`):
// points [n, 3] in lidar frame, l2i row-major [cams, 4, 4]; writes one
// [cams, H/s, W/s] map per stride (dst pointers array).
void depth_maps(const float* points, int n_points, const float* l2i,
                int num_cams, int img_h, int img_w, const int* strides,
                int num_strides, float max_depth, float** dst) {
  for (int s = 0; s < num_strides; ++s) {
    const int h = img_h / strides[s], w = img_w / strides[s];
    std::memset(dst[s], 0, sizeof(float) * num_cams * h * w);
  }
  for (int c = 0; c < num_cams; ++c) {
    const float* M = l2i + c * 16;
    for (int i = 0; i < n_points; ++i) {
      const float x = points[i * 3], y = points[i * 3 + 1], z = points[i * 3 + 2];
      const float pz = M[8] * x + M[9] * y + M[10] * z + M[11];
      if (pz < 1e-5f || pz > max_depth) continue;
      const float px = (M[0] * x + M[1] * y + M[2] * z + M[3]) / pz;
      const float py = (M[4] * x + M[5] * y + M[6] * z + M[7]) / pz;
      for (int s = 0; s < num_strides; ++s) {
        const int st = strides[s];
        const int h = img_h / st, w = img_w / st;
        const int u = static_cast<int>(px / st), v = static_cast<int>(py / st);
        if (u >= 0 && u < w && v >= 0 && v < h)
          dst[s][(static_cast<size_t>(c) * h + v) * w + u] = pz;
      }
    }
  }
}

}  // extern "C"
