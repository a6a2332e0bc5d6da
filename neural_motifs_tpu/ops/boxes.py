"""Box math in jnp, with the reference's pixel-inclusive conventions.

Semantics match reference lib/fpn/box_utils.py and the Cython
lib/fpn/box_intersections_cpu/bbox.pyx:

  * widths/heights are pixel-inclusive: w = x2 - x1 + 1
  * center_size:  (cx, cy, w, h) with cx = x1 + 0.5*w
  * point_form:   x1 = cx - 0.5*w, x2 = cx + 0.5*(w - 2)  (exact inverse)
  * IoU uses the +1 convention in both intersection and areas

All functions broadcast over leading batch dims and take optional validity
masks so padded rows can't contaminate results (the TPU replacement for the
reference's ragged tensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def center_size(boxes: Array) -> Array:
    """(x1,y1,x2,y2) -> (cx,cy,w,h), inclusive widths. box_utils.py:51-63."""
    wh = boxes[..., 2:4] - boxes[..., 0:2] + 1.0
    ctr = boxes[..., 0:2] + 0.5 * wh
    return jnp.concatenate([ctr, wh], axis=-1)


def point_form(boxes: Array) -> Array:
    """(cx,cy,w,h) -> (x1,y1,x2,y2); inverse of center_size. box_utils.py:66-78."""
    xy1 = boxes[..., 0:2] - 0.5 * boxes[..., 2:4]
    xy2 = boxes[..., 0:2] + 0.5 * (boxes[..., 2:4] - 2.0)
    return jnp.concatenate([xy1, xy2], axis=-1)


def bbox_preds(boxes: Array, deltas: Array) -> Array:
    """Decode (tx,ty,tw,th) deltas on prior boxes -> (x1,y1,x2,y2).

    box_utils.py:28-48. Center offset scaled by prior wh; sizes via exp.
    """
    prior = center_size(boxes)
    xy = prior[..., 0:2] + prior[..., 2:4] * deltas[..., 0:2]
    wh = jnp.exp(deltas[..., 2:4]) * prior[..., 2:4]
    return point_form(jnp.concatenate([xy, wh], axis=-1))


def bbox_encode(prior_boxes: Array, gt_boxes: Array) -> Array:
    """Regression targets: inverse of bbox_preds (box_utils.py:16-21)."""
    prior = center_size(prior_boxes)
    gt = center_size(gt_boxes)
    txy = (gt[..., 0:2] - prior[..., 0:2]) / prior[..., 2:4]
    twh = jnp.log(gt[..., 2:4]) - jnp.log(prior[..., 2:4])
    return jnp.concatenate([txy, twh], axis=-1)


def smooth_l1(x: Array, beta: float = 1.0) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def bbox_loss(prior_boxes: Array, deltas: Array, gt_boxes: Array,
              mask: Array | None = None, eps: float = 1e-4) -> Array:
    """Smooth-L1 on encoded targets, summed then / (eps + n_valid).

    box_utils.py:8-25 (F.smooth_l1_loss size_average=False / N). `mask`
    zeroes padded rows and adjusts the denominator.
    """
    targets = bbox_encode(prior_boxes, gt_boxes)
    per = smooth_l1(deltas - targets).sum(axis=-1)
    if mask is not None:
        per = per * mask
        n = mask.sum()
    else:
        n = float(per.size)  # number of boxes (static)
    return per.sum() / (eps + n)


def area(boxes: Array) -> Array:
    """Inclusive pixel area."""
    return ((boxes[..., 2] - boxes[..., 0] + 1.0) *
            (boxes[..., 3] - boxes[..., 1] + 1.0))


def bbox_intersections(box_a: Array, box_b: Array) -> Array:
    """Pairwise intersection area [..., A, B], +1 convention (bbox.pyx:64-108)."""
    max_xy = jnp.minimum(box_a[..., :, None, 2:4], box_b[..., None, :, 2:4])
    min_xy = jnp.maximum(box_a[..., :, None, 0:2], box_b[..., None, :, 0:2])
    inter = jnp.clip(max_xy - min_xy + 1.0, 0.0, None)
    return inter[..., 0] * inter[..., 1]


def bbox_overlaps(box_a: Array, box_b: Array,
                  mask_a: Array | None = None, mask_b: Array | None = None) -> Array:
    """Pairwise IoU [..., A, B] with the +1 convention (bbox.pyx:15-61).

    Masked rows/cols produce IoU 0.
    """
    inter = bbox_intersections(box_a, box_b)
    union = area(box_a)[..., :, None] + area(box_b)[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-8)
    if mask_a is not None:
        iou = iou * mask_a[..., :, None]
    if mask_b is not None:
        iou = iou * mask_b[..., None, :]
    return iou


def nms_overlaps(boxes: Array) -> Array:
    """Per-class pairwise IoU.

    boxes: [..., N, C, 4] -> [..., N, N, C] (box_utils.py:134-154). Used by
    the decoder's leave-one-out NMS decode.
    """
    max_xy = jnp.minimum(boxes[..., :, None, :, 2:4], boxes[..., None, :, :, 2:4])
    min_xy = jnp.maximum(boxes[..., :, None, :, 0:2], boxes[..., None, :, :, 0:2])
    inter_wh = jnp.clip(max_xy - min_xy + 1.0, 0.0, None)
    inters = inter_wh[..., 0] * inter_wh[..., 1]          # [..., N, N, C]
    areas = area(boxes)                                    # [..., N, C]
    union = areas[..., :, None, :] + areas[..., None, :, :] - inters
    return inters / jnp.maximum(union, 1e-8)


def clip_boxes(boxes: Array, h, w) -> Array:
    """Clamp boxes into [0, w-1] x [0, h-1]; h/w may be per-image arrays
    broadcastable against boxes[..., 0]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def union_box(box_a: Array, box_b: Array) -> Array:
    """Smallest box containing both (get_union_boxes.py:84-88)."""
    xy1 = jnp.minimum(box_a[..., 0:2], box_b[..., 0:2])
    xy2 = jnp.maximum(box_a[..., 2:4], box_b[..., 2:4])
    return jnp.concatenate([xy1, xy2], axis=-1)
