// Native JPEG decode + resize + center-crop pipeline for the raw-pixel
// data path (Food-101 MMBT training). C ABI, loaded via ctypes
// (data/native.py) — no pybind11 in this environment.
//
// Speed levers over the PIL path:
//  * libjpeg DCT-domain scaled decoding at M/8 granularity (PIL's draft()
//    only picks powers of two), so the IDCT emits pixels as close to the
//    256-target as possible;
//  * one fused bilinear resize + center-crop pass straight into the
//    caller's uint8 buffer (no intermediate allocations per stage).
//
// Resample note: after DCT scaling the residual resize ratio is <= 9/8, a
// regime where plain bilinear matches convolution-based (PIL) resampling
// closely; this is the native backend of the --fast_decode family, not a
// bit-exact replica of torchvision's full-resolution bilinear chain.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Undecodable inputs are an expected, handled case (caller falls back);
// don't spam stderr per image.
void output_message(j_common_ptr) {}

// Bilinear sample of src (h, w, 3) at fractional (fy, fx).
inline void sample_bilinear(const uint8_t* src, int w, int h, float fx,
                            float fy, uint8_t* out) {
  fx = std::min(std::max(fx, 0.0f), static_cast<float>(w - 1));
  fy = std::min(std::max(fy, 0.0f), static_cast<float>(h - 1));
  const int x0 = static_cast<int>(fx);
  const int y0 = static_cast<int>(fy);
  const int x1 = std::min(x0 + 1, w - 1);
  const int y1 = std::min(y0 + 1, h - 1);
  const float ax = fx - x0;
  const float ay = fy - y0;
  const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
  const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
  const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
  const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    const float top = p00[c] + ax * (p01[c] - p00[c]);
    const float bot = p10[c] + ax * (p11[c] - p10[c]);
    out[c] = static_cast<uint8_t>(top + ay * (bot - top) + 0.5f);
  }
}

}  // namespace

extern "C" {

// Decode `jpeg[0:len]`, resize so the SHORTER side == `resize`
// (aspect-preserving, torchvision Resize semantics), center-crop
// `crop` x `crop`, write RGB uint8 into `out` (crop*crop*3 bytes).
// Returns 0 on success, nonzero on decode failure.
int mmu_decode_resize_crop(const uint8_t* jpeg, size_t len, int resize,
                           int crop, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(jpeg),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain scale M/8: smallest M whose decoded shorter side still
  // covers `resize` (never decode more pixels than the resize needs).
  const int shorter = std::min(cinfo.image_width, cinfo.image_height);
  int m = 8;
  if (shorter > resize) {
    m = (8 * resize + shorter - 1) / shorter;  // ceil
    m = std::max(1, std::min(8, m));
  }
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int comps = cinfo.output_components;
  if (comps != 3) {  // out_color_space=JCS_RGB should guarantee 3
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // Aspect-preserving resize factor so shorter side -> `resize`
  // (torchvision: round the longer side).
  int nw, nh;
  if (w <= h) {
    nw = resize;
    nh = std::max(1, static_cast<int>(
        static_cast<double>(h) * resize / w + 0.5));
  } else {
    nh = resize;
    nw = std::max(1, static_cast<int>(
        static_cast<double>(w) * resize / h + 0.5));
  }
  const float sx = static_cast<float>(w) / nw;
  const float sy = static_cast<float>(h) / nh;
  const int left = (nw - crop) / 2 + ((nw - crop) % 2 != 0 && (nw - crop) < 0 ? 0 : 0);
  const int top = (nh - crop) / 2;

  for (int oy = 0; oy < crop; ++oy) {
    // pixel-center mapping of the virtual (nw, nh) grid back to source
    const float fy = (static_cast<float>(oy + top) + 0.5f) * sy - 0.5f;
    uint8_t* dst_row = out + static_cast<size_t>(oy) * crop * 3;
    for (int ox = 0; ox < crop; ++ox) {
      const float fx = (static_cast<float>(ox + left) + 0.5f) * sx - 0.5f;
      sample_bilinear(buf.data(), w, h, fx, fy, dst_row + ox * 3);
    }
  }
  return 0;
}

// Batch variant with an internal std::thread pool: decodes n images
// concurrently WITHOUT holding the Python GIL (the whole call is one C
// entry point; ctypes releases the GIL for its duration). This is the
// native data-loader executor for multi-core hosts: Python thread workers
// serialize on the GIL for the decode-heavy part of __getitem__, while
// here each worker thread owns a full decode+resize+crop independently.
//
//   blob      — concatenated encoded images
//   offsets   — n+1 int64 offsets into blob (image i = [offsets[i], offsets[i+1]))
//   n         — number of images
//   resize/crop — as mmu_decode_resize_crop
//   n_threads — worker threads (<=0 means hardware_concurrency)
//   out       — n * crop * crop * 3 bytes
//   rcs       — per-image return codes (0 ok; nonzero = caller falls back)
void mmu_decode_resize_crop_batch(const uint8_t* blob, const int64_t* offsets,
                                  int n, int resize, int crop, int n_threads,
                                  uint8_t* out, int32_t* rcs) {
  if (n <= 0) return;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, n);
  const size_t stride = static_cast<size_t>(crop) * crop * 3;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      rcs[i] = mmu_decode_resize_crop(
          blob + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]),
          resize, crop, out + stride * i);
    }
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
