// vjepa2_tpu native host ops: fused video preprocessing.
//
// The reference's native-performance data path lives in decord (C++ video
// decode). Here the decode backends are pluggable (cv2/imageio) and the
// *transform* hot loop — crop + bilinear resize + /255 + imagenet normalize,
// run once per frame per sample per step — is this C library, called via
// ctypes. Fusing the three passes into one avoids two full-frame
// intermediates and the float32 temporary that the numpy path materializes,
// and threads across frames of a clip.
//
// Build: native/build.sh  ->  vjepa2_tpu/data/_native/libhost_ops.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// The one bilinear crop+resize sampling kernel, parameterized on the
// per-pixel write (normalize-to-float vs round-to-uint8) so the
// align-corners convention, clamps, and hflip indexing live in exactly one
// place for both the float and u8 pipelines.
template <typename OutT, typename WritePx>
void crop_resize_frame(const uint8_t* src, int W,
                       int top, int left, int ch, int cw,
                       OutT* dst, int oh, int ow, int hflip,
                       WritePx write_px) {
  // scale factors (align_corners=False convention, matches cv2.INTER_LINEAR)
  const float sy = (float)ch / (float)oh;
  const float sx = (float)cw / (float)ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = ((float)oy + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = std::min(y0 + 1, ch - 1);
    float wy = fy - (float)y0;
    const uint8_t* row0 = src + (size_t)(top + std::min(y0, ch - 1)) * W * 3 + left * 3;
    const uint8_t* row1 = src + (size_t)(top + y1) * W * 3 + left * 3;
    OutT* out_row = dst + (size_t)oy * ow * 3;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = ((float)ox + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = std::min(x0 + 1, cw - 1);
      float wx = fx - (float)x0;
      int out_x = hflip ? (ow - 1 - ox) : ox;
      OutT* out_px = out_row + (size_t)out_x * 3;
      for (int c = 0; c < 3; ++c) {
        float v00 = (float)row0[(size_t)x0 * 3 + c];
        float v01 = (float)row0[(size_t)x1 * 3 + c];
        float v10 = (float)row1[(size_t)x0 * 3 + c];
        float v11 = (float)row1[(size_t)x1 * 3 + c];
        float v = (v00 * (1 - wx) + v01 * wx) * (1 - wy) +
                  (v10 * (1 - wx) + v11 * wx) * wy;
        write_px(out_px, c, v);
      }
    }
  }
}

// Round-robin frames across `num_threads` workers (or run inline for 1).
template <typename FrameFn>
void run_clip_threaded(int T, int num_threads, FrameFn frame_fn) {
  int nt = std::max(1, std::min(num_threads, T));
  if (nt == 1) {
    for (int t = 0; t < T; ++t) frame_fn(t);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int w = 0; w < nt; ++w) {
    threads.emplace_back([&, w]() {
      for (int t = w; t < T; t += nt) frame_fn(t);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Fused: crop [top:top+ch, left:left+cw] from src (H x W x 3 uint8),
// bilinear-resize to (oh x ow), normalize to float32 (x/255 - mean)/std.
// dst: oh x ow x 3 float32.
void crop_resize_normalize_frame(
    const uint8_t* src, int H, int W,
    int top, int left, int ch, int cw,
    float* dst, int oh, int ow,
    const float* mean, const float* std_, int hflip) {
  (void)H;
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  crop_resize_frame<float>(
      src, W, top, left, ch, cw, dst, oh, ow, hflip,
      [&](float* out_px, int c, float v) {
        out_px[c] = (v * inv255 - mean[c]) * inv_std[c];
      });
}

// Whole-clip variant, threaded across frames.
// src: T x H x W x 3 uint8; per-frame crop boxes (motion shift support):
// tops/lefts/chs/cws arrays of length T. dst: T x oh x ow x 3 float32.
void crop_resize_normalize_clip(
    const uint8_t* src, int T, int H, int W,
    const int* tops, const int* lefts, const int* chs, const int* cws,
    float* dst, int oh, int ow,
    const float* mean, const float* std_, int hflip, int num_threads) {
  const size_t in_stride = (size_t)H * W * 3;
  const size_t out_stride = (size_t)oh * ow * 3;
  run_clip_threaded(T, num_threads, [&](int t) {
    crop_resize_normalize_frame(src + t * in_stride, H, W, tops[t], lefts[t],
                                chs[t], cws[t], dst + t * out_stride, oh, ow,
                                mean, std_, hflip);
  });
}

// uint8-out variant: crop + bilinear resize, round to uint8, NO normalize.
// Used by the deferred-normalization pipeline (clips stay uint8 through
// collate/IPC/H2D — 4x less host memory traffic than float32 — and the
// (x/255 - mean)/std runs on the device inside the jit step, where XLA
// fuses it into the patch-embed matmul). Rounding to uint8 after resize
// matches torchvision's uint8 resize in the reference pipeline.
void crop_resize_u8_frame(
    const uint8_t* src, int H, int W,
    int top, int left, int ch, int cw,
    uint8_t* dst, int oh, int ow, int hflip) {
  (void)H;
  crop_resize_frame<uint8_t>(
      src, W, top, left, ch, cw, dst, oh, ow, hflip,
      [](uint8_t* out_px, int c, float v) {
        out_px[c] = (uint8_t)std::min(255.0f, std::max(0.0f, v + 0.5f));
      });
}

void crop_resize_u8_clip(
    const uint8_t* src, int T, int H, int W,
    const int* tops, const int* lefts, const int* chs, const int* cws,
    uint8_t* dst, int oh, int ow, int hflip, int num_threads) {
  const size_t in_stride = (size_t)H * W * 3;
  const size_t out_stride = (size_t)oh * ow * 3;
  run_clip_threaded(T, num_threads, [&](int t) {
    crop_resize_u8_frame(src + t * in_stride, H, W, tops[t], lefts[t],
                         chs[t], cws[t], dst + t * out_stride, oh, ow, hflip);
  });
}

// In-place uint8 -> normalized float32 (no crop/resize), threaded.
void normalize_clip(const uint8_t* src, float* dst, int64_t n_pixels,
                    const float* mean, const float* std_, int num_threads) {
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  int nt = std::max(1, num_threads);
  int64_t chunk = (n_pixels + nt - 1) / nt;
  auto work = [&](int64_t s, int64_t e) {
    for (int64_t i = s; i < e; ++i) {
      const uint8_t* p = src + i * 3;
      float* q = dst + i * 3;
      q[0] = ((float)p[0] * inv255 - mean[0]) * inv_std[0];
      q[1] = ((float)p[1] * inv255 - mean[1]) * inv_std[1];
      q[2] = ((float)p[2] * inv255 - mean[2]) * inv_std[2];
    }
  };
  if (nt == 1) { work(0, n_pixels); return; }
  std::vector<std::thread> threads;
  for (int w = 0; w < nt; ++w) {
    int64_t s = w * chunk, e = std::min<int64_t>(n_pixels, s + chunk);
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
