// Native host-pipeline kernels for langsplat4d.
//
// TPU-native equivalent of the reference's native data path: where the CUDA
// pipeline leans on torch's C++ dataloader workers (train.py:146-151) and
// fancy-indexing on device (scene/cameras.py:92-118), this framework keeps
// the device for rendering and runs the per-iteration host work (GT
// language-feature gather, image normalization) in multithreaded C++,
// exposed to Python via ctypes (no pybind11 in the image).
//
// Build: native/build.py (g++ -O3 -shared -fPIC -pthread).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// Parallel-for over [0, n) with hardware-concurrency threads.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int threads = std::max(1u, std::min<unsigned>(hw, 16));
  if (n < 4096 || threads == 1) {
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

}  // namespace

extern "C" {

// Gather per-pixel language features from a seg map + per-segment table.
// seg:   [hw]     int32 segment ids, -1 = background
// feats: [s, c]   float32 per-segment features
// out:   [c, hw]  float32 (channel-major, zeros where seg == -1)
// mask:  [hw]     uint8 validity
// Mirrors Camera.get_language_feature's gather (scene/cameras.py:92-118).
void gather_language_features(const int32_t* seg, const float* feats,
                              int64_t hw, int64_t s, int64_t c, float* out,
                              uint8_t* mask) {
  parallel_for(hw, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int32_t id = seg[i];
      if (id < 0 || id >= s) {
        mask[i] = 0;
        for (int64_t ch = 0; ch < c; ++ch) out[ch * hw + i] = 0.0f;
      } else {
        mask[i] = 1;
        const float* row = feats + id * c;
        for (int64_t ch = 0; ch < c; ++ch) out[ch * hw + i] = row[ch];
      }
    }
  });
}

// Half-precision (IEEE fp16) feature tables — the preprocess pipeline writes
// *_f.npy as fp16 (preprocess/generate_clip_features.py:152).
static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {
      exp = 127 - 15 + 1;
      while ((man & 0x400) == 0) {
        man <<= 1;
        exp--;
      }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

void gather_language_features_f16(const int32_t* seg, const uint16_t* feats,
                                  int64_t hw, int64_t s, int64_t c,
                                  float* out, uint8_t* mask) {
  parallel_for(hw, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int32_t id = seg[i];
      if (id < 0 || id >= s) {
        mask[i] = 0;
        for (int64_t ch = 0; ch < c; ++ch) out[ch * hw + i] = 0.0f;
      } else {
        mask[i] = 1;
        const uint16_t* row = feats + id * c;
        for (int64_t ch = 0; ch < c; ++ch)
          out[ch * hw + i] = half_to_float(row[ch]);
      }
    }
  });
}

// HWC uint8 image -> CHW float32 in [0, 1] (PILtoTorch equivalent,
// utils/general_utils.py:21-33) — per-batch-item hot path.
void image_u8_to_chw_f32(const uint8_t* img, int64_t h, int64_t w, int64_t c,
                         float* out) {
  const float scale = 1.0f / 255.0f;
  int64_t hw = h * w;
  parallel_for(hw, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* px = img + i * c;
      for (int64_t ch = 0; ch < c; ++ch)
        out[ch * hw + i] = px[ch] * scale;
    }
  });
}

}  // extern "C"
