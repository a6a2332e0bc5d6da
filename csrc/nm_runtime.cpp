// Native host runtime for neural_motifs_tpu.
//
// The reference ships Cython extensions for the host-side box math
// (lib/fpn/box_intersections_cpu/bbox.pyx) used by dataset filtering,
// frequency-count building and the evaluator. Device-side box math lives in
// XLA; this library covers the same HOST hot paths (tens of thousands of
// images of pairwise IoU during dataset load / get_counts / eval) without
// Cython. Exposed via a plain C ABI and loaded with ctypes
// (neural_motifs_tpu/runtime/__init__.py); pure-numpy fallback exists.
//
// Build: make -C csrc    (produces libnm_runtime.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pairwise IoU with the pixel-inclusive (+1) convention.
// boxes: [n, 4], queries: [k, 4], out: [n, k]
void nm_bbox_overlaps(const double* boxes, int64_t n, const double* queries,
                      int64_t k, double* out) {
  std::vector<double> qarea(k);
  for (int64_t j = 0; j < k; ++j) {
    const double* q = queries + 4 * j;
    qarea[j] = (q[2] - q[0] + 1.0) * (q[3] - q[1] + 1.0);
  }
  for (int64_t i = 0; i < n; ++i) {
    const double* b = boxes + 4 * i;
    const double barea = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
    double* row = out + k * i;
    for (int64_t j = 0; j < k; ++j) {
      const double* q = queries + 4 * j;
      const double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1.0;
      if (iw <= 0) { row[j] = 0.0; continue; }
      const double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1.0;
      if (ih <= 0) { row[j] = 0.0; continue; }
      const double inter = iw * ih;
      row[j] = inter / (barea + qarea[j] - inter);
    }
  }
}

// Intersection area over query-box area. out: [n, k]
void nm_bbox_intersections(const double* boxes, int64_t n,
                           const double* queries, int64_t k, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* b = boxes + 4 * i;
    double* row = out + k * i;
    for (int64_t j = 0; j < k; ++j) {
      const double* q = queries + 4 * j;
      const double qarea = (q[2] - q[0] + 1.0) * (q[3] - q[1] + 1.0);
      const double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1.0;
      const double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1.0;
      row[j] = (iw > 0 && ih > 0) ? iw * ih / qarea : 0.0;
    }
  }
}

// Greedy NMS over score-sorted candidates (host-side tooling / tests).
// boxes: [n, 4] float32; order must be score-descending indices.
// keep_out: [n] uint8 flags in ORIGINAL index space. Returns kept count.
int64_t nm_greedy_nms(const float* boxes, const int64_t* order, int64_t n,
                      float iou_thresh, uint8_t* keep_out) {
  std::memset(keep_out, 0, n);
  std::vector<uint8_t> dead(n, 0);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (dead[i]) continue;
    keep_out[i] = 1;
    ++kept;
    const float* bi = boxes + 4 * i;
    const float ai = (bi[2] - bi[0] + 1.f) * (bi[3] - bi[1] + 1.f);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (dead[j]) continue;
      const float* bj = boxes + 4 * j;
      const float iw = std::min(bi[2], bj[2]) - std::max(bi[0], bj[0]) + 1.f;
      if (iw <= 0) continue;
      const float ih = std::min(bi[3], bj[3]) - std::max(bi[1], bj[1]) + 1.f;
      if (ih <= 0) continue;
      const float inter = iw * ih;
      const float aj = (bj[2] - bj[0] + 1.f) * (bj[3] - bj[1] + 1.f);
      if (inter / (ai + aj - inter) > iou_thresh) dead[j] = 1;
    }
  }
  return kept;
}

// Batched triple counting for the frequency baseline: one pass over all
// (sub_cls, obj_cls, predicate) rows. rows: [n, 3]; table: [nc*nc*np].
void nm_count_triples(const int32_t* rows, int64_t n, int64_t nc, int64_t np,
                      int64_t* table) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t s = rows[3 * i], o = rows[3 * i + 1], p = rows[3 * i + 2];
    if (s >= 0 && s < nc && o >= 0 && o < nc && p >= 0 && p < np)
      ++table[(s * nc + o) * np + p];
  }
}

}  // extern "C"
