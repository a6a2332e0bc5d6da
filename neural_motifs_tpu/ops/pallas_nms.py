"""Greedy NMS as a single Pallas TPU kernel.

One kernel instance processes one lane (an image, or an (image, class)
pair) entirely in VMEM: boxes live as a coords-major [4, N] block (N on the
128-wide lane axis), and the score-ordered tiled greedy sweep — within-tile
fixpoint + one [T, N] cross-suppression row per tile — runs with zero HBM
round-trips between tiles. The XLA version (ops/nms.py) materializes the
per-tile IoU slabs through HBM; here they never leave VMEM.

Equivalent to ops.nms.greedy_nms_mask on score-sorted input (parity-tested
in interpret mode and on device). Grid = lanes; vmap is not needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

Array = jax.Array


def _pairwise_iou(a: Array, b: Array) -> Array:
    """a: [4, T], b: [4, N] -> IoU [T, N] (+1 inclusive convention)."""
    ax1, ay1, ax2, ay2 = a[0], a[1], a[2], a[3]          # [T]
    bx1, by1, bx2, by2 = b[0], b[1], b[2], b[3]          # [N]
    iw = jnp.minimum(ax2[:, None], bx2[None, :]) - \
        jnp.maximum(ax1[:, None], bx1[None, :]) + 1.0
    ih = jnp.minimum(ay2[:, None], by2[None, :]) - \
        jnp.maximum(ay1[:, None], by1[None, :]) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-8)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, tile: int, thresh: float):
    """boxes_ref: [1, 4, N] f32 (score-sorted); valid_ref/keep_ref: [1, 1, N]
    int32 0/1."""
    n = boxes_ref.shape[-1]
    keep_ref[...] = valid_ref[...]
    col_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    tri_r = lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    tri_c = lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    boxes = boxes_ref[0]                                  # [4, N]

    def tile_body(i, _):
        # NOTE: all masks are f32 0/1 — Mosaic only supports minor-dim
        # broadcasts ([:, None]) for 32-bit types.
        s = i * tile
        tb = boxes_ref[0, :, pl.ds(s, tile)]              # [4, T]
        ta0 = keep_ref[0, 0, pl.ds(s, tile)].astype(jnp.float32)  # [T]

        iou_tt = _pairwise_iou(tb, tb)                    # [T, T]
        sup = jnp.where((iou_tt > thresh) & (tri_r < tri_c), 1.0, 0.0)
        sup = sup * ta0[:, None] * ta0[None, :]

        def cond(st):
            _, changed, it = st
            return changed & (it < tile)

        def body(st):
            a, _, it = st
            suppressed = jnp.max(sup * a[:, None], axis=0)       # [T]
            new = ta0 * jnp.where(suppressed > 0.5, 0.0, 1.0)
            return new, jnp.any(new != a), it + 1

        ta, _, _ = lax.while_loop(cond, body, (ta0, jnp.bool_(True),
                                               jnp.int32(0)))
        keep_ref[0, 0, pl.ds(s, tile)] = ta.astype(jnp.int32)

        iou_tn = _pairwise_iou(tb, boxes)                 # [T, N]
        hit = jnp.where(iou_tn > thresh, 1.0, 0.0) * ta[:, None]
        kill = jnp.max(hit, axis=0)                       # [N] f32
        later = (col_ids[0] >= s + tile).astype(jnp.float32)
        dead = kill * later
        keep_ref[0, 0, :] = jnp.where(dead > 0.5, 0, keep_ref[0, 0, :])
        return 0

    lax.fori_loop(0, n // tile, tile_body, 0)


def _perclass_kernel(boxes_ref, valid_ref, keep_ref, *, thresh: float):
    """Rank-sequential greedy NMS, vectorized across classes.

    One grid step = one image. boxes_ref: [1, 4, C, K] f32, score-sorted
    descending along K within each class; valid_ref/keep_ref: [1, C, K]
    f32 0/1. K sequential steps of [C, K]-wide VPU work — a box's alive
    status is final before the step that uses it (only lower ranks can kill
    it), so a single pass is exact greedy. Replaces the v1 tiled kernel for
    the per-class route, whose grid of B*C sequential lanes was
    grid-overhead-bound (~22 ms at [8, 151, 256]).
    """
    k = boxes_ref.shape[-1]
    x1 = boxes_ref[0, 0]                                   # [C, K]
    y1 = boxes_ref[0, 1]
    x2 = boxes_ref[0, 2]
    y2 = boxes_ref[0, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    col = lax.broadcasted_iota(jnp.int32, x1.shape, 1)     # [C, K]
    keep_ref[...] = valid_ref[...]

    def step(i, _):
        # rank-i box of every class, extracted by a masked lane reduction
        # ([C, 1], broadcast back over the K lanes) — Mosaic has no dynamic
        # lane-dim slicing, but elementwise + minor-dim reduce/broadcast
        # lower cleanly.
        sel = jnp.where(col == i, 1.0, 0.0)                # [C, K]
        pick = lambda v: jnp.sum(v * sel, axis=1, keepdims=True)
        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        ba = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
        iw = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0
        ih = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / jnp.maximum(ba + area - inter, 1e-8)
        alive_i = pick(keep_ref[0])                        # [C, 1]
        kill = jnp.where((iou > thresh) & (col > i), 1.0, 0.0) * alive_i
        keep_ref[0] = keep_ref[0] * (1.0 - kill)
        return 0

    lax.fori_loop(0, k, step, 0)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def pallas_perclass_nms(boxes: Array, valid: Array, iou_thresh: float,
                        interpret: bool = False) -> Array:
    """Exact greedy NMS keep mask over score-sorted-per-class candidates.

    boxes: [B, C, K, 4] (K sorted by descending score within each (b, c));
    valid: [B, C, K] bool -> keep [B, C, K] bool.
    """
    b, c, k, _ = boxes.shape
    b_cm = jnp.moveaxis(boxes, -1, 1).astype(jnp.float32)   # [B, 4, C, K]
    kernel = functools.partial(_perclass_kernel, thresh=float(iou_thresh))
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, c, k), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, c, k), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, c, k), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, k), jnp.float32),
        interpret=interpret,
    )(b_cm, valid.astype(jnp.float32))
    return keep > 0.5


@functools.partial(jax.jit, static_argnames=("iou_thresh", "tile", "interpret"))
def pallas_greedy_nms(boxes: Array, scores: Array, valid: Array,
                      iou_thresh: float, tile: int = 128,
                      interpret: bool = False) -> Array:
    """Greedy NMS keep mask in original order. boxes: [L, N, 4] (L lanes);
    scores: [L, N]; valid: [L, N] bool -> keep [L, N] bool."""
    l, n, _ = boxes.shape
    pad = (-n) % tile
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((l, pad, 4), boxes.dtype)], 1)
        scores = jnp.concatenate([scores, jnp.full((l, pad), -jnp.inf,
                                                   scores.dtype)], 1)
        valid = jnp.concatenate([valid, jnp.zeros((l, pad), bool)], 1)
    m = boxes.shape[1]

    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, axis=1)                      # [L, M]
    b_sorted = jnp.take_along_axis(boxes, order[..., None], axis=1)
    v_sorted = jnp.take_along_axis(valid, order, axis=1)

    b_cm = jnp.swapaxes(b_sorted, 1, 2).astype(jnp.float32)  # [L, 4, M]
    kernel = functools.partial(_nms_kernel, tile=tile,
                               thresh=float(iou_thresh))
    keep_sorted = pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[pl.BlockSpec((1, 4, m), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((l, 1, m), jnp.int32),
        interpret=interpret,
    )(b_cm, v_sorted.astype(jnp.int32)[:, None, :])
    keep_sorted = keep_sorted[:, 0, :]

    keep = jnp.zeros((l, m), jnp.int32)
    keep = jax.vmap(lambda row, idx, kk: row.at[idx].set(kk))(
        keep, order, keep_sorted)
    return keep[:, :n].astype(bool)
