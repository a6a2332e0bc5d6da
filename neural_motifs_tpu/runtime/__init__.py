"""Native host runtime bindings (ctypes over csrc/libnm_runtime.so) with
numpy fallbacks. Covers the host-side hot paths the reference served with
Cython: pairwise IoU/intersections (dataset filtering, frequency counts,
evaluator) and greedy NMS (tooling/tests)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                        "libnm_runtime.so")


def load_library(build_if_missing: bool = True):
    """Load (and lazily build) the native library; returns None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.nm_bbox_overlaps.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.nm_bbox_intersections.argtypes = lib.nm_bbox_overlaps.argtypes
    lib.nm_greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
    lib.nm_greedy_nms.restype = ctypes.c_int64
    lib.nm_count_triples.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    if hasattr(lib, "nm_resize_bilinear_u8"):  # absent in stale pre-built .so
        lib.nm_resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64]
    if hasattr(lib, "nm_decode_jpeg_scaled"):
        lib.nm_jpeg_header.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.nm_jpeg_header.restype = ctypes.c_int
        lib.nm_decode_jpeg_scaled.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.nm_decode_jpeg_scaled.restype = ctypes.c_int
    _LIB = lib
    return lib


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def bbox_overlaps(boxes: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """[N,4] x [K,4] -> [N,K] IoU (+1 inclusive convention)."""
    lib = load_library()
    b = _as(boxes, np.float64)
    q = _as(queries, np.float64)
    n, k = len(b), len(q)
    if lib is not None and n * k > 0:
        out = np.empty((n, k), np.float64)
        lib.nm_bbox_overlaps(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    # numpy fallback
    iw = (np.minimum(b[:, None, 2], q[None, :, 2]) -
          np.maximum(b[:, None, 0], q[None, :, 0]) + 1).clip(0)
    ih = (np.minimum(b[:, None, 3], q[None, :, 3]) -
          np.maximum(b[:, None, 1], q[None, :, 1]) + 1).clip(0)
    inter = iw * ih
    ab = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    aq = (q[:, 2] - q[:, 0] + 1) * (q[:, 3] - q[:, 1] + 1)
    return inter / np.maximum(ab[:, None] + aq[None, :] - inter, 1e-12)


def bbox_intersections(boxes: np.ndarray, queries: np.ndarray) -> np.ndarray:
    lib = load_library()
    b = _as(boxes, np.float64)
    q = _as(queries, np.float64)
    n, k = len(b), len(q)
    if lib is not None and n * k > 0:
        out = np.empty((n, k), np.float64)
        lib.nm_bbox_intersections(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    iw = (np.minimum(b[:, None, 2], q[None, :, 2]) -
          np.maximum(b[:, None, 0], q[None, :, 0]) + 1).clip(0)
    ih = (np.minimum(b[:, None, 3], q[None, :, 3]) -
          np.maximum(b[:, None, 1], q[None, :, 1]) + 1).clip(0)
    aq = (q[:, 2] - q[:, 0] + 1) * (q[:, 3] - q[:, 1] + 1)
    return iw * ih / aq[None, :]


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float
               ) -> np.ndarray:
    """Host greedy NMS; returns keep mask [N] bool."""
    lib = load_library()
    b = _as(boxes, np.float32)
    order = _as(np.argsort(-np.asarray(scores)), np.int64)
    n = len(b)
    if lib is not None and n:
        keep = np.zeros(n, np.uint8)
        lib.nm_greedy_nms(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            ctypes.c_float(iou_thresh),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return keep.astype(bool)
    keep = np.zeros(n, bool)
    dead = np.zeros(n, bool)
    iou = bbox_overlaps(b, b)
    for i in order:
        if dead[i]:
            continue
        keep[i] = True
        dead |= iou[i] > iou_thresh
        dead[i] = True
    return keep


def resize_bilinear_u8(img: np.ndarray, out_h: int, out_w: int):
    """PIL-bit-exact BILINEAR resize of a [H, W, C] uint8 image.

    Returns the resized [out_h, out_w, C] uint8 array, or None when the
    native library is unavailable (callers fall back to PIL). Byte-identical
    to `Image.resize((out_w, out_h), Image.BILINEAR)` — same triangle
    filter, fixed-point coefficients and two-pass rounding — but several
    times faster than Pillow's scalar loops (the resize is the hottest
    host-side step in the serving path; see csrc/nm_runtime.cpp).
    """
    lib = load_library()
    if lib is None or not hasattr(lib, "nm_resize_bilinear_u8"):
        return None
    src = _as(img, np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, ch = src.shape
    if h == 0 or w == 0 or out_h <= 0 or out_w <= 0:
        return None
    out = np.empty((out_h, out_w, ch), np.uint8)
    lib.nm_resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    return out if img.ndim == 3 else out[:, :, 0]


def jpeg_header(data: bytes):
    """(width, height, decodable) of a JPEG byte stream, or None when the
    native library is unavailable or the stream isn't a parseable JPEG."""
    lib = load_library()
    if lib is None or not hasattr(lib, "nm_jpeg_header"):
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    ok = ctypes.c_int64()
    if not lib.nm_jpeg_header(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(ok)):
        return None
    return w.value, h.value, bool(ok.value)


def decode_jpeg_scaled(data: bytes, scale_num: int, hdr=None):
    """Decode JPEG bytes to RGB uint8 at scale_num/8 of full resolution
    using libjpeg's scaled IDCT (serving fast path; see csrc). Returns the
    [h, w, 3] array or None on failure/unavailability. scale_num=8 is a
    full-resolution decode. Pass a jpeg_header() result as `hdr` to skip
    the sizing re-parse (the hot loader path already has one)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "nm_decode_jpeg_scaled"):
        return None
    if hdr is None:
        hdr = jpeg_header(data)
    if hdr is None or not hdr[2]:
        return None
    fw, fh, _ = hdr
    # libjpeg output dims at M/8: ceil(dim * M / 8)
    ow = -(-fw * scale_num // 8)
    oh = -(-fh * scale_num // 8)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((oh, ow, 3), np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    if not lib.nm_decode_jpeg_scaled(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            scale_num, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.size, ctypes.byref(w), ctypes.byref(h)):
        return None
    if (h.value, w.value) != (oh, ow):  # defensive: dims disagree with calc
        return None
    return out


def count_triples(rows: np.ndarray, nc: int, npred: int) -> np.ndarray:
    """[N,3] (sub_cls, obj_cls, predicate) -> [nc, nc, npred] counts."""
    lib = load_library()
    r = _as(rows, np.int32)
    if lib is not None and len(r):
        table = np.zeros(nc * nc * npred, np.int64)
        lib.nm_count_triples(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r), nc, npred,
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return table.reshape(nc, nc, npred)
    table = np.zeros((nc, nc, npred), np.int64)
    for s, o, p in r:
        table[s, o, p] += 1
    return table
