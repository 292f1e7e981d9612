// Per-row symmetric int8 quantization for the host->device wire format
// (multimodal_uncertainty_tpu/data/transfer_quant.py).
//
// The numpy implementation needs ~6 full passes over the batch (cast, abs,
// reduce, divide, rint, clip) with fresh allocations each — ~300 ms for a
// 64x320x768 bf16 batch on one core. Here each row (a ~1.5 KB embedding
// vector) stays in L1 across both passes, so the whole batch costs roughly
// one read of the input plus one write of the int8 output, and the batch
// is row-parallel across a std::thread pool with the GIL released for the
// duration of the ctypes call (same executor model as
// mmu_decode_resize_crop_batch in image_pipeline.cpp).
//
// Bit-parity with the numpy path is part of the contract
// (tests/test_transfer_quant.py): scale = amax/127 computed in fp32,
// q = nearbyintf(v/scale) — nearbyint under the default FP environment is
// round-half-to-even, exactly np.rint.
//
// Non-finite inputs: a row containing any NaN/Inf quantizes to zeros with
// scale 1.0 (same as an all-zero row) — defined behavior, mirrored exactly
// by _numpy_quantize_rows.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

inline float load_elem(const void* in, int dtype_code, int64_t i) {
  if (dtype_code == 0) {
    return static_cast<const float*>(in)[i];
  }
  // bf16: the high 16 bits of an IEEE f32
  uint32_t u = static_cast<uint32_t>(static_cast<const uint16_t*>(in)[i])
               << 16;
  float f;
  std::memcpy(&f, &u, sizeof(f));
  return f;
}

void quantize_rows_range(const void* in, int dtype_code, int64_t d,
                         int64_t row_begin, int64_t row_end, int8_t* q,
                         float* scale) {
  for (int64_t r = row_begin; r < row_end; ++r) {
    const int64_t base = r * d;
    float amax = 0.0f;
    bool finite = true;
    for (int64_t j = 0; j < d; ++j) {
      const float a = std::fabs(load_elem(in, dtype_code, base + j));
      // NaN fails the comparison, +Inf exceeds max(): both mark the row
      if (!(a <= std::numeric_limits<float>::max())) {
        finite = false;
        break;
      }
      amax = std::max(amax, a);
    }
    if (finite && amax > 0.0f) {
      const float s = amax / 127.0f;
      scale[r] = s;
      for (int64_t j = 0; j < d; ++j) {
        float v = std::nearbyintf(load_elem(in, dtype_code, base + j) / s);
        v = std::min(127.0f, std::max(-127.0f, v));
        q[base + j] = static_cast<int8_t>(v);
      }
    } else {
      scale[r] = 1.0f;
      std::memset(q + base, 0, static_cast<size_t>(d));
    }
  }
}

}  // namespace

extern "C" {

// in          — rows*d elements, C-contiguous
// dtype_code  — 0: float32, 1: bfloat16 (uint16 storage)
// n_threads   — worker threads (<=0 means hardware_concurrency)
// q           — out, rows*d int8
// scale       — out, rows fp32 (amax/127, or 1.0 for all-zero rows)
void mmu_quantize_rows_int8(const void* in, int dtype_code, int64_t rows,
                            int64_t d, int n_threads, int8_t* q,
                            float* scale) {
  if (rows <= 0 || d <= 0) return;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, rows));
  if (n_threads == 1) {
    quantize_rows_range(in, dtype_code, d, 0, rows, q, scale);
    return;
  }
  const int64_t chunk = (rows + n_threads - 1) / n_threads;
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min(rows, b + chunk);
    if (b >= e) break;
    threads.emplace_back(quantize_rows_range, in, dtype_code, d, b, e, q,
                         scale);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
