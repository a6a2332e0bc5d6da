"""Greedy NMS as a fixpoint iteration — fully on-device, static shapes.

The reference implements NMS as a CUDA bitmask kernel plus a *host-side*
greedy scan (reference lib/fpn/nms/src/cuda/nms_kernel.cu:33-132), forcing a
device<->host sync per call. On TPU we instead compute the pairwise IoU
matrix once and iterate

    alive_{k+1}[j] = valid[j] & !any_i( alive_k[i] & i<j & IoU(i,j) > t )

over score-sorted boxes. By induction on suppression-chain depth this
converges to exactly the greedy NMS solution (boxes at chain depth <= k are
fixed after k sweeps); real detection workloads converge in a handful of
sweeps, and the loop is bounded by N for worst-case exactness. Each sweep is
one masked [N, N] reduction — pure VPU work, no host round-trip.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from neural_motifs_tpu.ops.boxes import bbox_overlaps

Array = jax.Array

NEG_INF = -1e10


def use_pallas_nms() -> bool:
    """Route multi-lane NMS through the fused Pallas kernel
    (ops/pallas_nms.py) on TPU. Default ON on TPU backends; override with
    NM_PALLAS_NMS=0/1."""
    env = os.environ.get("NM_PALLAS_NMS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _fixpoint_alive(sup: Array, v: Array, max_iters: int) -> Array:
    """Greedy-NMS fixpoint over a suppression matrix in score order:
    alive_{k+1}[j] = v[j] & !any_i(alive_k[i] & sup[i, j]). Converges to the
    exact greedy solution in O(suppression-chain-depth) sweeps (boxes at
    chain depth <= k are fixed after k sweeps)."""

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        alive, _, it = state
        new = v & ~jnp.any(sup & alive[:, None], axis=0)
        return new, jnp.any(new != alive), it + 1

    alive, _, _ = lax.while_loop(cond, body, (v, jnp.bool_(True), jnp.int32(0)))
    return alive


def greedy_nms_mask(boxes: Array, scores: Array, valid: Array,
                    iou_thresh: float, tile: int = 128) -> Array:
    """Exact greedy NMS keep mask in the *original* box order — tiled.

    Boxes are processed in score order in `tile`-sized blocks: the block's
    internal suppression is resolved with a tiny fixpoint on [tile, tile],
    then the block's survivors suppress all later boxes in ONE [tile, N]
    sweep. The full IoU matrix is therefore touched exactly once (streamed
    tile-by-tile) instead of once per fixpoint sweep — the dominant NMS
    cost in the profile.

    boxes: [N, 4]; scores: [N]; valid: [N] bool. Padded/invalid rows are
    never kept and never suppress.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    b = boxes[order]
    v = valid[order]

    if n <= tile:
        iou = bbox_overlaps(b, b)
        idx = jnp.arange(n)
        sup = (iou > iou_thresh) & (idx[:, None] < idx[None, :])
        sup = sup & v[:, None] & v[None, :]
        alive = _fixpoint_alive(sup, v, n)
        return jnp.zeros_like(valid).at[order].set(alive)

    pad = (-n) % tile
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad,), bool)])
    m = b.shape[0]
    idx_all = jnp.arange(m)
    tri = jnp.arange(tile)

    def tile_step(i, alive):
        s = i * tile
        tb = lax.dynamic_slice(b, (s, 0), (tile, 4))
        ta = lax.dynamic_slice(alive, (s,), (tile,))
        # resolve within-tile greedy
        iou_tt = bbox_overlaps(tb, tb)
        sup_tt = (iou_tt > iou_thresh) & (tri[:, None] < tri[None, :])
        sup_tt = sup_tt & ta[:, None] & ta[None, :]
        ta = _fixpoint_alive(sup_tt, ta, tile)
        alive = lax.dynamic_update_slice(alive, ta, (s,))
        # survivors kill all later boxes in one sweep
        iou_tn = bbox_overlaps(tb, b)                 # [tile, M]
        kill = jnp.any(ta[:, None] & (iou_tn > iou_thresh), axis=0)
        kill = kill & (idx_all >= s + tile)
        return alive & ~kill

    alive = lax.fori_loop(0, m // tile, tile_step, v)
    alive = alive[:n]
    keep = jnp.zeros_like(valid).at[order].set(alive)
    return keep


def nms_topk(boxes: Array, scores: Array, valid: Array, iou_thresh: float,
             pre_topn: int, post_topn: int) -> tuple[Array, Array]:
    """apply_nms equivalent (reference lib/fpn/nms/functions/nms.py:7-45):
    score-sort, take pre_topn, greedy-suppress, return the post_topn
    surviving indices (into the original array) in score order.

    Returns (indices [post_topn] int32, keep_valid [post_topn] bool).
    Padded slots point at index 0 with keep_valid False.
    """
    n = boxes.shape[0]
    pre = min(pre_topn, n)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    top_scores, top_idx = lax.top_k(masked_scores, pre)
    top_valid = top_scores > NEG_INF / 2
    keep = greedy_nms_mask(boxes[top_idx], top_scores, top_valid, iou_thresh)

    # Order of top_idx is already score-descending; select kept slots stably.
    kscore = jnp.where(keep, top_scores, NEG_INF)
    _, sel = lax.top_k(kscore, min(post_topn, pre))
    out_idx = top_idx[sel]
    out_valid = keep[sel]
    if post_topn > pre:
        pad = post_topn - pre
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((pad,), bool)])
    return out_idx.astype(jnp.int32), out_valid


def per_class_nms_mask(boxes_per_cls: Array, probs: Array, valid: Array,
                       iou_thresh: float = 0.3, score_thresh: float = 0.05,
                       per_class_topk: int | None = 256) -> Array:
    """Per-class NMS keep mask over [N, C] detections.

    Equivalent of the per-class loop in filter_det (reference
    lib/object_detector.py:438-452): for every non-background class c, run
    greedy NMS over (boxes[:, c], probs[:, c]) and mark survivors. Classes
    whose max prob <= score_thresh are dropped entirely. Background (c=0)
    is never kept.

    per_class_topk: restrict each class's NMS to its top-K candidates by
    probability. Greedy survival of a box depends only on higher-scored
    boxes of the same class, so decisions for the top-K are exact; a box
    below rank K could only matter if >= K-64 higher-probability same-class
    boxes were all suppressed AND it still made the global top-64 — set
    None for the fully exact (but ~(N/K)^2 x costlier) variant.

    boxes_per_cls: [N, C, 4]; probs: [N, C]; valid: [N].
    Returns keep: [N, C] bool.
    """
    n, c = probs.shape
    k = per_class_topk
    if k is None or k >= n:
        def one_class(bc, pc):
            return greedy_nms_mask(bc, pc, valid, iou_thresh)

        keep = jax.vmap(one_class, in_axes=(1, 1), out_axes=1)(boxes_per_cls,
                                                               probs)
    else:
        p = jnp.where(valid[:, None], probs, -1.0)          # [N, C]
        top_p, top_i = jax.lax.top_k(p.T, k)                # [C, K]
        bc = jnp.take_along_axis(
            jnp.moveaxis(boxes_per_cls, 1, 0),              # [C, N, 4]
            top_i[..., None], axis=1)                       # [C, K, 4]

        if use_pallas_nms():
            # fused VMEM kernel: one rank-sequential pass vectorized across
            # all C classes (ops/pallas_nms._perclass_kernel; interpret mode
            # off-TPU so NM_PALLAS_NMS=1 is testable on CPU). top_p is
            # already descending per class (top_k output), so no re-sort.
            # The keep mask is a discrete decision — stop_gradient the
            # inputs so autodiff (sgdet training) never tries to linearize
            # through the pallas_call, matching the (gradient-free)
            # semantics of the XLA fixpoint path.
            from neural_motifs_tpu.ops.pallas_nms import pallas_perclass_nms
            keep_k = pallas_perclass_nms(
                lax.stop_gradient(bc)[None],
                lax.stop_gradient(top_p >= 0.0)[None], iou_thresh,
                interpret=jax.default_backend() != "tpu")[0]
        else:
            def one_class(bck, pck):
                return greedy_nms_mask(bck, pck, pck >= 0.0, iou_thresh)

            keep_k = jax.vmap(one_class)(bc, top_p)         # [C, K]
        keep = jnp.zeros((c, n), bool)
        keep = jax.vmap(lambda row, idx, kk: row.at[idx].set(kk))(
            keep, top_i, keep_k)
        keep = keep.T                                        # [N, C]
    cls_ok = (jnp.max(jnp.where(valid[:, None], probs, 0.0), axis=0) > score_thresh)
    keep = keep & cls_ok[None, :]
    keep = keep.at[:, 0].set(False)
    return keep
