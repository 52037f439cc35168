// Native host-side ops for the evaluation/data path.
//
// Capability match: the reference ships a C++/CUDA extension (ape/layers/csrc)
// for its hot device op; on TPU the device work is Pallas/XLA, so the native
// layer moves to where this framework is actually host-bound: COCO RLE
// encode/decode, mask IoU matrices and greedy NMS inside the evaluators and
// the copy-paste mapper. Exposed with a plain C ABI for ctypes (no pybind11).
//
// Build: ape_tpu/csrc/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE decode: counts (int32 array, n) -> mask bytes (h*w, column-major source)
// Returns row-major uint8 mask.
// ---------------------------------------------------------------------------
void rle_decode_counts(const int32_t* counts, int64_t n, int64_t h, int64_t w,
                       uint8_t* out_row_major) {
  std::vector<uint8_t> flat((size_t)h * w, 0);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t c = counts[i];
    if (val) {
      int64_t end = std::min(pos + c, (int64_t)flat.size());
      if (pos < end) memset(flat.data() + pos, 1, (size_t)(end - pos));
    }
    pos += c;
    val = 1 - val;
  }
  // column-major -> row-major
  for (int64_t x = 0; x < w; ++x)
    for (int64_t y = 0; y < h; ++y)
      out_row_major[y * w + x] = flat[(size_t)x * h + y];
}

// ---------------------------------------------------------------------------
// RLE encode: row-major uint8 mask -> counts; returns count length.
// out_counts must have room for h*w+1 entries.
// ---------------------------------------------------------------------------
int64_t rle_encode_counts(const uint8_t* mask_row_major, int64_t h, int64_t w,
                          int32_t* out_counts) {
  int64_t n = 0;
  int64_t run = 0;
  uint8_t cur = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = mask_row_major[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        out_counts[n++] = (int32_t)run;
        cur = v;
        run = 1;
      }
    }
  }
  out_counts[n++] = (int32_t)run;
  return n;
}

// ---------------------------------------------------------------------------
// Pairwise mask IoU: dets (n, h*w) uint8 row-major flat, gts (m, h*w).
// iscrowd (m) uint8: crowd gt -> intersection over det area.
// ---------------------------------------------------------------------------
void mask_iou_matrix(const uint8_t* dets, int64_t n, const uint8_t* gts,
                     int64_t m, const uint8_t* iscrowd, int64_t hw,
                     double* out /* n*m */) {
  std::vector<int64_t> det_area(n, 0), gt_area(m, 0);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t k = 0; k < hw; ++k) det_area[i] += dets[i * hw + k];
  for (int64_t j = 0; j < m; ++j)
    for (int64_t k = 0; k < hw; ++k) gt_area[j] += gts[j * hw + k];
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* d = dets + i * hw;
    for (int64_t j = 0; j < m; ++j) {
      const uint8_t* g = gts + j * hw;
      int64_t inter = 0;
      for (int64_t k = 0; k < hw; ++k) inter += (d[k] & g[k]);
      double denom = iscrowd && iscrowd[j]
                         ? (double)det_area[i]
                         : (double)(det_area[i] + gt_area[j] - inter);
      out[i * m + j] = denom > 0 ? (double)inter / denom : 0.0;
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy NMS on xyxy boxes (sorted or unsorted; sorts by score internally).
// keep_out: uint8 mask (n). Returns number kept.
// ---------------------------------------------------------------------------
int64_t greedy_nms(const float* boxes /* n*4 */, const float* scores, int64_t n,
                   float iou_thresh, uint8_t* keep_out) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> removed(n, 0);
  memset(keep_out, 0, (size_t)n);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (removed[i]) continue;
    keep_out[i] = 1;
    ++kept;
    const float* bi = boxes + i * 4;
    float area_i = std::max(0.f, bi[2] - bi[0]) * std::max(0.f, bi[3] - bi[1]);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (removed[j]) continue;
      const float* bj = boxes + j * 4;
      float xx0 = std::max(bi[0], bj[0]), yy0 = std::max(bi[1], bj[1]);
      float xx1 = std::min(bi[2], bj[2]), yy1 = std::min(bi[3], bj[3]);
      float iw = std::max(0.f, xx1 - xx0), ih = std::max(0.f, yy1 - yy0);
      float inter = iw * ih;
      float area_j =
          std::max(0.f, bj[2] - bj[0]) * std::max(0.f, bj[3] - bj[1]);
      float uni = area_i + area_j - inter;
      if (uni > 0 && inter / uni > iou_thresh) removed[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// Box IoU matrix with crowd handling (eval hot loop).
// ---------------------------------------------------------------------------
void box_iou_matrix(const double* a /* n*4 xyxy */, int64_t n,
                    const double* b /* m*4 */, int64_t m,
                    const uint8_t* iscrowd, double* out /* n*m */) {
  for (int64_t i = 0; i < n; ++i) {
    const double* bi = a + i * 4;
    double area_i = std::max(0.0, bi[2] - bi[0]) * std::max(0.0, bi[3] - bi[1]);
    for (int64_t j = 0; j < m; ++j) {
      const double* bj = b + j * 4;
      double xx0 = std::max(bi[0], bj[0]), yy0 = std::max(bi[1], bj[1]);
      double xx1 = std::min(bi[2], bj[2]), yy1 = std::min(bi[3], bj[3]);
      double inter = std::max(0.0, xx1 - xx0) * std::max(0.0, yy1 - yy0);
      double area_j =
          std::max(0.0, bj[2] - bj[0]) * std::max(0.0, bj[3] - bj[1]);
      double denom = iscrowd && iscrowd[j] ? area_i : area_i + area_j - inter;
      out[i * m + j] = denom > 0 ? inter / denom : 0.0;
    }
  }
}

}  // extern "C"
