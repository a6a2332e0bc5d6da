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
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

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

// ---------------------------------------------------------------------------
// Bilinear (triangle-filter) resample on uint8 HWC images, bit-exact to
// Pillow's Image.resize(..., BILINEAR) 8-bit path. The reference pipeline
// resizes every image through PIL (dataloaders/image_transforms.py:8-43 via
// torchvision Resize), and PIL's scalar convolution is the single most
// expensive host-side step on this machine (~16 ms for 800x600 -> 592x444 vs
// ~7 ms JPEG decode). This reimplements the same algorithm — per-axis
// triangle filter whose support scales with the reduction factor, 22-bit
// fixed-point coefficients, horizontal pass then vertical pass with uint8
// rounding between them — so the output is byte-identical to PIL while the
// tighter loops (and a vectorizable vertical pass) run several times faster.
// Verified bit-exact against the installed Pillow in
// tests/test_data.py::test_native_resize_bitexact_vs_pil.

static const int kPrecisionBits = 32 - 8 - 2;  // Pillow's PRECISION_BITS

static inline uint8_t nm_clip8(int in) {
  if (in >= (1 << (kPrecisionBits + 8))) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> kPrecisionBits);
}

// Triangle-filter coefficient table for one axis (PIL precompute_coeffs +
// normalize_coeffs_8bpc, specialized to the bilinear filter, full-axis box).
// Fills bounds[out*2] = {first_tap, n_taps} and kk[out*ksize] int32 weights.
static int nm_precompute_coeffs(int64_t in_size, int64_t out_size,
                                std::vector<int>& bounds,
                                std::vector<int32_t>& kk) {
  double scale = (double)in_size / (double)out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // bilinear filter support = 1
  int ksize = (int)std::ceil(support) * 2 + 1;
  bounds.resize(out_size * 2);
  std::vector<double> prekk(out_size * ksize);
  double ss = 1.0 / filterscale;
  for (int64_t xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = (int)in_size;
    xmax -= xmin;
    double* k = &prekk[xx * ksize];
    double ww = 0.0;
    int x = 0;
    for (; x < xmax; ++x) {
      double arg = (x + xmin - center + 0.5) * ss;
      if (arg < 0) arg = -arg;
      double w = arg < 1.0 ? 1.0 - arg : 0.0;
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x)
      if (ww != 0.0) k[x] /= ww;
    for (; x < ksize; ++x) k[x] = 0;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  kk.resize(out_size * ksize);
  for (size_t i = 0; i < prekk.size(); ++i) {
    // PIL normalize_coeffs_8bpc: round-half-away-from-zero to fixed point
    kk[i] = prekk[i] < 0 ? (int32_t)(-0.5 + prekk[i] * (1 << kPrecisionBits))
                         : (int32_t)(0.5 + prekk[i] * (1 << kPrecisionBits));
  }
  return ksize;
}

// src: [in_h, in_w, ch] uint8 row-major -> dst: [out_h, out_w, ch].
// Two passes exactly like PIL ImagingResampleInner: horizontal into a
// uint8 temp image (rounding applied), then vertical.
void nm_resize_bilinear_u8(const uint8_t* src, int64_t in_h, int64_t in_w,
                           int64_t ch, uint8_t* dst, int64_t out_h,
                           int64_t out_w) {
  const int half = 1 << (kPrecisionBits - 1);

  std::vector<int> hb;
  std::vector<int32_t> hk;
  const bool need_h = out_w != in_w;
  const bool need_v = out_h != in_h;
  std::vector<uint8_t> tmp_store;
  const uint8_t* mid = src;
  int64_t mid_h = in_h;
  if (need_h) {
    int hksize = nm_precompute_coeffs(in_w, out_w, hb, hk);
    tmp_store.resize(in_h * out_w * ch);
    const int* bp = hb.data();
    const int32_t* kbase = hk.data();
    for (int64_t yy = 0; yy < in_h; ++yy) {
      const uint8_t* row = src + yy * in_w * ch;
      uint8_t* out_row = tmp_store.data() + yy * out_w * ch;
      if (ch == 3) {
        // Hot case: RGB. Trailing coefficients past xmax are zero (PIL
        // zero-fills them), so away from the right edge every pixel can
        // run a fixed-trip-count loop over all hksize taps — the compiler
        // unrolls/vectorizes it — with bit-identical results.
        for (int64_t xx = 0; xx < out_w; ++xx) {
          const int xmin = bp[xx * 2];
          const int32_t* k = kbase + xx * hksize;
          const uint8_t* p = row + xmin * 3;
          int a0 = half, a1 = half, a2 = half;
          if (xmin + hksize <= in_w) {
            for (int x = 0; x < hksize; ++x, p += 3) {
              const int32_t w = k[x];
              a0 += p[0] * w;
              a1 += p[1] * w;
              a2 += p[2] * w;
            }
          } else {
            const int xmax = bp[xx * 2 + 1];
            for (int x = 0; x < xmax; ++x, p += 3) {
              const int32_t w = k[x];
              a0 += p[0] * w;
              a1 += p[1] * w;
              a2 += p[2] * w;
            }
          }
          out_row[xx * 3] = nm_clip8(a0);
          out_row[xx * 3 + 1] = nm_clip8(a1);
          out_row[xx * 3 + 2] = nm_clip8(a2);
        }
      } else {
        for (int64_t xx = 0; xx < out_w; ++xx) {
          const int xmin = bp[xx * 2], xmax = bp[xx * 2 + 1];
          const int32_t* k = kbase + xx * hksize;
          for (int64_t c = 0; c < ch; ++c) {
            int acc = half;
            const uint8_t* p = row + xmin * ch + c;
            for (int x = 0; x < xmax; ++x) acc += p[x * ch] * k[x];
            out_row[xx * ch + c] = nm_clip8(acc);
          }
        }
      }
    }
    mid = tmp_store.data();
    mid_h = in_h;
  }
  const int64_t mid_w = need_h ? out_w : in_w;

  if (need_v) {
    std::vector<int> vb;
    std::vector<int32_t> vk;
    int vksize = nm_precompute_coeffs(mid_h, out_h, vb, vk);
    const int64_t row_elems = mid_w * ch;
    std::vector<int32_t> acc(row_elems);
    for (int64_t yy = 0; yy < out_h; ++yy) {
      const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
      const int32_t* k = &vk[yy * vksize];
      std::fill(acc.begin(), acc.end(), half);
      for (int y = 0; y < ymax; ++y) {
        const int32_t w = k[y];
        const uint8_t* row = mid + (int64_t)(ymin + y) * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) acc[j] += row[j] * w;
      }
      uint8_t* out_row = dst + yy * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) out_row[j] = nm_clip8(acc[j]);
    }
  } else {
    std::memcpy(dst, mid, (size_t)(mid_h * mid_w * ch));
  }
}

// ---------------------------------------------------------------------------
// Scaled-DCT JPEG decode (serving fast path). libjpeg can decode at any
// M/8 scale (M=1..8) by running the IDCT on a reduced block size — far
// cheaper than full decode + resample when the pipeline downscales anyway
// (every VG image is resized so its long side is IM_SCALE=592). Pillow's
// Image.draft() only exposes the power-of-two subset, which undershoots
// 592 for typical VG sizes; this exposes the full M/8 ladder so the loader
// can pick the smallest scale that still covers the target. NOT bit-exact
// to full decode + PIL resize — opt-in via NM_FAST_DECODE=1, never used by
// the parity runbook. Grayscale sources are up-converted to RGB by libjpeg;
// exotic colorspaces (CMYK/YCCK) are rejected so the caller falls back to
// PIL.

struct NmJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void nm_jpeg_error_exit(j_common_ptr cinfo) {
  NmJpegErr* err = (NmJpegErr*)cinfo->err;
  longjmp(err->jump, 1);
}

// Header-only parse: fills full-resolution dims + whether we can decode.
// Returns 1 on success.
int nm_jpeg_header(const uint8_t* buf, int64_t len, int64_t* w, int64_t* h,
                   int64_t* decodable) {
  jpeg_decompress_struct cinfo;
  NmJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = nm_jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  *decodable = (cinfo.jpeg_color_space == JCS_YCbCr ||
                cinfo.jpeg_color_space == JCS_GRAYSCALE ||
                cinfo.jpeg_color_space == JCS_RGB);
  jpeg_destroy_decompress(&cinfo);
  return 1;
}

// Decode at scale scale_num/8 into out (RGB, row-major, caller-sized via
// ceil(dim * scale_num / 8)). Returns 1 and the actual output dims on
// success, 0 on any decode error.
int nm_decode_jpeg_scaled(const uint8_t* buf, int64_t len, int64_t scale_num,
                          uint8_t* out, int64_t out_cap, int64_t* out_w,
                          int64_t* out_h) {
  jpeg_decompress_struct cinfo;
  NmJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = nm_jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (cinfo.jpeg_color_space != JCS_YCbCr &&
      cinfo.jpeg_color_space != JCS_GRAYSCALE &&
      cinfo.jpeg_color_space != JCS_RGB) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = (unsigned)scale_num;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  const int64_t w = cinfo.output_width, h = cinfo.output_height;
  if (cinfo.output_components != 3 || w * h * 3 > out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (int64_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return 1;
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
