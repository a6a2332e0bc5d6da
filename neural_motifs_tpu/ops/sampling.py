"""Device-side target assignment & sampling — the reference's numpy/CPU
samplers re-designed as masked, fixed-shape jnp ops.

The reference runs all of these on the host (anchor targets inside the
dataloader workers, lib/fpn/anchor_targets.py:16-105; proposal/rel samplers
as numpy round-trips, lib/fpn/proposal_assignments/*), which would serialize
a TPU step. Here every sampler is a pure function of (arrays, rng) with
static output shapes, vmapped over the image batch inside the jitted step.

Randomness: "choose k of n candidates uniformly without replacement" becomes
"rank candidates by iid uniform noise, keep rank < k"; weighted choice uses
the Gumbel-max trick. RNG parity with the reference's numpy.random is
impossible (and not needed) — tests assert distributional properties.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neural_motifs_tpu import config as C
from neural_motifs_tpu.ops.boxes import bbox_overlaps

Array = jax.Array


def _topk_pad(score: Array, k: int) -> tuple[Array, Array]:
    """top_k that tolerates k > len(score): pads with zeros/index 0."""
    n = score.shape[0]
    if k <= n:
        return jax.lax.top_k(score, k)
    vals, idx = jax.lax.top_k(score, n)
    pad = k - n
    vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
    idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    return vals, idx


def _rank_among(rng: jax.Array, cand: Array) -> Array:
    """Uniform-random rank of each candidate among all candidates
    (non-candidates get rank >= n). cand: [N] bool -> [N] int32."""
    n = cand.shape[0]
    noise = jax.random.uniform(rng, (n,))
    key = jnp.where(cand, noise, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(cand, ranks, n)


class AnchorTargets(NamedTuple):
    labels: Array        # [H, W, A] int32 in {-1 ignore, 0 bg, 1 fg} (post-subsample)
    target_boxes: Array  # [H, W, A, 4] matched GT box (valid where labels == 1)


def anchor_targets(rng: jax.Array, anchors_flat: Array, gt_boxes: Array,
                   gt_mask: Array, im_h: Array, im_w: Array,
                   grid_shape: tuple[int, int, int]) -> AnchorTargets:
    """RPN anchor labeling + subsampling for ONE image, fully in-graph.

    Semantics of lib/fpn/anchor_targets.py:16-105: drop out-of-image anchors;
    positives are (a) each GT's argmax anchors and (b) anchors with IoU >=
    0.7; negatives have max IoU < 0.3; subsample to <= 128 fg and 256 total.
    Instead of gathering 256 rows, we emit a dense label grid; the RPN loss
    is a masked reduction over it (labels == -1 contribute nothing).
    """
    n = anchors_flat.shape[0]
    inside = ((anchors_flat[:, 0] >= 0) & (anchors_flat[:, 1] >= 0) &
              (anchors_flat[:, 2] < im_w) & (anchors_flat[:, 3] < im_h))

    iou = bbox_overlaps(anchors_flat, gt_boxes, mask_b=gt_mask)   # [N, G]
    iou = iou * inside[:, None]
    anchor_to_gt = jnp.argmax(iou, axis=1)
    max_ov = jnp.max(iou, axis=1)

    # each GT's best anchors (ties included, anchor_targets.py:57-59)
    gt_max = jnp.max(iou, axis=0)                                  # [G]
    is_gt_best = jnp.any((iou == gt_max[None, :]) & (gt_max[None, :] > 0)
                         & gt_mask[None, :], axis=1)

    fg = inside & (is_gt_best | (max_ov >= C.RPN_POSITIVE_OVERLAP))
    bg = inside & (max_ov < C.RPN_NEGATIVE_OVERLAP) & ~fg

    num_fg_budget = int(C.RPN_FG_FRACTION * C.RPN_BATCHSIZE)
    r1, r2 = jax.random.split(rng)
    keep_fg = fg & (_rank_among(r1, fg) < num_fg_budget)
    num_fg = jnp.sum(keep_fg)
    keep_bg = bg & (_rank_among(r2, bg) < (C.RPN_BATCHSIZE - num_fg))

    labels = jnp.where(keep_fg, 1, jnp.where(keep_bg, 0, -1)).astype(jnp.int32)
    targets = gt_boxes[anchor_to_gt]
    return AnchorTargets(labels.reshape(grid_shape),
                         targets.reshape(grid_shape + (4,)))


class DetSample(NamedTuple):
    rois: Array      # [S, 4]
    labels: Array    # [S] int32 (0 = bg)
    targets: Array   # [S, 4] matched GT boxes (meaningful where labels > 0)
    valid: Array     # [S] bool


def proposal_assign_det(rng: jax.Array, rois: Array, roi_valid: Array,
                        gt_boxes: Array, gt_classes: Array, gt_mask: Array,
                        fg_thresh: float = 0.5,
                        rois_per_img: int = C.ROIS_PER_IMG,
                        fg_fraction: float = C.FG_FRACTION) -> DetSample:
    """Detector RoI sampling for ONE image
    (lib/fpn/proposal_assignments/proposal_assignments_det.py:11-116):
    candidates = RPN proposals + GT boxes; sample 25% fg (IoU >= 0.5) and
    fill with bg (IoU in [0, 0.5)) to 256.
    """
    all_boxes = jnp.concatenate([rois, gt_boxes], axis=0)
    all_valid = jnp.concatenate([roi_valid, gt_mask], axis=0)
    iou = bbox_overlaps(all_boxes, gt_boxes, mask_a=all_valid, mask_b=gt_mask)
    max_ov = jnp.max(iou, axis=1)
    gt_assign = jnp.argmax(iou, axis=1)

    fg = all_valid & (max_ov >= fg_thresh)
    bg = all_valid & (max_ov < C.BG_THRESH_HI) & (max_ov >= C.BG_THRESH_LO) & ~fg

    fg_budget = int(round(rois_per_img * fg_fraction))
    r1, r2, r3 = jax.random.split(rng, 3)
    keep_fg = fg & (_rank_among(r1, fg) < fg_budget)
    num_fg = jnp.sum(keep_fg)
    keep_bg = bg & (_rank_among(r2, bg) < (rois_per_img - num_fg))

    noise = jax.random.uniform(r3, (all_boxes.shape[0],))
    score = jnp.where(keep_fg, 2.0 + noise, jnp.where(keep_bg, 1.0 + noise, 0.0))
    vals, idx = _topk_pad(score, rois_per_img)
    sel_valid = vals > 0.5
    sel_fg = keep_fg[idx]

    labels = jnp.where(sel_fg, gt_classes[gt_assign[idx]], 0)
    labels = jnp.where(sel_valid, labels, 0).astype(jnp.int32)
    return DetSample(rois=all_boxes[idx], labels=labels,
                     targets=gt_boxes[gt_assign[idx]], valid=sel_valid)


class RelSample(NamedTuple):
    sub: Array    # [S] int32 index into the image's object list
    obj: Array    # [S] int32
    label: Array  # [S] int32 predicate (0 = bg)
    valid: Array  # [S] bool


def rel_assign_gtbox(rng: jax.Array, gt_mask: Array, gt_rels: Array,
                     rel_mask: Array,
                     rels_per_img: int = C.RELS_PER_IMG,
                     fg_fraction: float = C.REL_FG_FRACTION) -> RelSample:
    """Relation sampling on GT boxes for ONE image (predcls/sgcls training;
    lib/fpn/proposal_assignments/proposal_assignments_gtbox.py:8-87).

    fg = (subsampled) GT relations; bg = ordered same-image pairs that are
    not the diagonal and not ANY GT pair; fill to rels_per_img.
    gt_rels: [R, 3] (sub, obj, predicate) local indices.
    """
    g = gt_mask.shape[0]
    r = gt_rels.shape[0]

    # bg candidate grid: all ordered valid pairs minus diagonal minus GT pairs
    pair_ok = gt_mask[:, None] & gt_mask[None, :]
    pair_ok = pair_ok & ~jnp.eye(g, dtype=bool)
    flat_gt_pair = gt_rels[:, 0] * g + gt_rels[:, 1]
    is_gt_pair = jnp.zeros((g * g,), bool).at[flat_gt_pair].max(rel_mask)
    bg_cand = pair_ok.reshape(-1) & ~is_gt_pair

    fg_budget = int(rels_per_img * fg_fraction)
    r1, r2, r3 = jax.random.split(rng, 3)
    keep_fg = rel_mask & (_rank_among(r1, rel_mask) < fg_budget)
    num_fg = jnp.sum(keep_fg)
    keep_bg = bg_cand & (_rank_among(r2, bg_cand) < (rels_per_img - num_fg))

    # compact fg rows + bg grid cells into rels_per_img slots
    pair_i = jnp.arange(g * g, dtype=jnp.int32) // g
    pair_j = jnp.arange(g * g, dtype=jnp.int32) % g
    cand_sub = jnp.concatenate([gt_rels[:, 0].astype(jnp.int32), pair_i])
    cand_obj = jnp.concatenate([gt_rels[:, 1].astype(jnp.int32), pair_j])
    cand_lbl = jnp.concatenate([gt_rels[:, 2].astype(jnp.int32),
                                jnp.zeros((g * g,), jnp.int32)])
    noise = jax.random.uniform(r3, (r + g * g,))
    keep = jnp.concatenate([keep_fg, keep_bg])
    is_fg = jnp.concatenate([keep_fg, jnp.zeros((g * g,), bool)])
    score = jnp.where(keep, jnp.where(is_fg, 2.0, 1.0) + noise, 0.0)
    vals, idx = _topk_pad(score, rels_per_img)
    sel_valid = vals > 0.5
    return RelSample(sub=cand_sub[idx], obj=cand_obj[idx],
                     label=jnp.where(sel_valid, cand_lbl[idx], 0),
                     valid=sel_valid)


def rel_assign_sgdet(rng: jax.Array, pred_boxes: Array, pred_labels: Array,
                     pred_valid: Array, gt_boxes: Array, gt_classes: Array,
                     gt_mask: Array, gt_rels: Array, rel_mask: Array,
                     fg_thresh: float = 0.5,
                     rels_per_img: int = C.RELS_PER_IMG_REFINE,
                     fg_fraction: float = C.REL_FG_FRACTION,
                     filter_non_overlap: bool = True) -> RelSample:
    """Relation sampling on detections for ONE image (sgdet training;
    lib/fpn/proposal_assignments/rel_assignments.py:14-145).

    For each GT relation, one (pred_i, pred_j) pair matching both endpoints
    (label equality + IoU >= 0.5) is sampled with probability proportional to
    the IoU product (Gumbel-max over log-weights); bg pairs are overlapping
    non-matching pairs; 16 fg / 64 total.
    """
    p = pred_boxes.shape[0]
    rl = gt_rels.shape[0]

    iou_pg = bbox_overlaps(pred_boxes, gt_boxes, mask_a=pred_valid, mask_b=gt_mask)
    is_match = (pred_labels[:, None] == gt_classes[None, :]) & (iou_pg >= fg_thresh)
    is_match = is_match & pred_valid[:, None] & gt_mask[None, :] & (gt_classes[None, :] > 0)

    iou_pp = bbox_overlaps(pred_boxes, pred_boxes, mask_a=pred_valid, mask_b=pred_valid)
    if filter_non_overlap:
        rel_poss = (iou_pp < 1.0) & (iou_pp > 0.0)
    else:
        rel_poss = pred_valid[:, None] & pred_valid[None, :] & ~jnp.eye(p, dtype=bool)
    rel_poss = rel_poss & (pred_labels[:, None] > 0) & (pred_labels[None, :] > 0)
    rel_poss = rel_poss & pred_valid[:, None] & pred_valid[None, :]

    # per-GT-relation candidate pair grids and weighted sampling
    sub_match = is_match[:, gt_rels[:, 0]]        # [P, R]
    obj_match = is_match[:, gt_rels[:, 1]]        # [P, R]
    cand = (sub_match[:, None, :] & obj_match[None, :, :]
            & ~jnp.eye(p, dtype=bool)[:, :, None] & rel_mask[None, None, :])  # [P,P,R]
    w = (iou_pg[:, gt_rels[:, 0]][:, None, :] *
         iou_pg[:, gt_rels[:, 1]][None, :, :])                                # [P,P,R]
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    gumbel = jax.random.gumbel(r1, (p, p, rl))
    logit = jnp.where(cand, jnp.log(jnp.maximum(w, 1e-12)) + gumbel, -jnp.inf)
    flat = logit.reshape(p * p, rl)
    pick = jnp.argmax(flat, axis=0)               # [R] flat pair index per gt rel
    pick_valid = rel_mask & jnp.any(cand.reshape(p * p, rl), axis=0)

    # all matched pairs are removed from the bg pool (rel_assignments.py:93)
    matched_any = jnp.any(cand, axis=2)
    rel_poss = rel_poss & ~matched_any

    fg_budget = int(round(fg_fraction * rels_per_img))
    keep_fg = pick_valid & (_rank_among(r2, pick_valid) < fg_budget)
    num_fg = jnp.sum(keep_fg)
    bg_cand = rel_poss.reshape(-1)
    keep_bg = bg_cand & (_rank_among(r3, bg_cand) < (rels_per_img - num_fg))

    pair_i = jnp.arange(p * p, dtype=jnp.int32) // p
    pair_j = jnp.arange(p * p, dtype=jnp.int32) % p
    cand_sub = jnp.concatenate([(pick // p).astype(jnp.int32), pair_i])
    cand_obj = jnp.concatenate([(pick % p).astype(jnp.int32), pair_j])
    cand_lbl = jnp.concatenate([gt_rels[:, 2].astype(jnp.int32),
                                jnp.zeros((p * p,), jnp.int32)])
    keep = jnp.concatenate([keep_fg, keep_bg])
    is_fg = jnp.concatenate([keep_fg, jnp.zeros((p * p,), bool)])
    noise = jax.random.uniform(r4, (rl + p * p,))
    score = jnp.where(keep, jnp.where(is_fg, 2.0, 1.0) + noise, 0.0)
    vals, idx = _topk_pad(score, rels_per_img)
    sel_valid = vals > 0.5
    return RelSample(sub=cand_sub[idx], obj=cand_obj[idx],
                     label=jnp.where(sel_valid, cand_lbl[idx], 0),
                     valid=sel_valid)


def assign_labels_by_iou(pred_boxes: Array, pred_valid: Array, gt_boxes: Array,
                         gt_classes: Array, gt_mask: Array,
                         thresh: float = 0.5) -> Array:
    """Post-NMS label assignment for sgdet training
    (lib/object_detector.py:319-326): GT class of the argmax-IoU GT if that
    IoU >= thresh, else 0."""
    iou = bbox_overlaps(pred_boxes, gt_boxes, mask_a=pred_valid, mask_b=gt_mask)
    best = jnp.argmax(iou, axis=1)
    max_ov = jnp.max(iou, axis=1)
    return jnp.where(max_ov >= thresh, gt_classes[best], 0).astype(jnp.int32)
