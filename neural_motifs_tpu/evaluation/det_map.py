"""Self-contained COCO-style detection mAP (no pycocotools dependency).

The reference validates detector pretraining with pycocotools' COCOeval
over a faux-COCO adapter (reference models/train_detector.py:158-181,
dataloaders/visual_genome.py:102-127) and drives the LR plateau scheduler
from mAP@0.5 (stats[1]). pycocotools is an optional dependency; this module
implements the same evaluation protocol in pure numpy so detector training
has a real validation metric everywhere:

  * greedy per-category matching, detections sorted by score, each matched
    to the unmatched GT with the highest IoU >= threshold
  * maxDets=100 detections per image, single (all) area range
  * 101-point interpolated precision, averaged over recall thresholds
    0:.01:1 (COCOeval's accumulate)
  * AP@0.5 and AP@[.5:.95:.05]; categories with no GT are skipped (the
    COCOeval -1 convention)

Differential-tested against a from-scratch oracle and hand-computed PR
cases in tests/test_det_map.py.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)  # .5:.05:.95, COCOeval grid
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_xywh(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Pairwise IoU of [N, 4] / [K, 4] boxes in (x, y, w, h) form — the
    faux-COCO annotation layout. Degenerate (w/h <= 0) boxes get IoU 0."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)), np.float64)
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = (np.minimum(dx2[:, None], gx2[None]) -
          np.maximum(dx1[:, None], gx1[None])).clip(min=0)
    ih = (np.minimum(dy2[:, None], gy2[None]) -
          np.maximum(dy1[:, None], gy1[None])).clip(min=0)
    inter = iw * ih
    area_d = (dt[:, 2] * dt[:, 3]).clip(min=0)
    area_g = (gt[:, 2] * gt[:, 3]).clip(min=0)
    union = area_d[:, None] + area_g[None] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(dt_boxes, dt_scores, gt_boxes, iou_thrs):
    """Greedy COCO matching for one (image, category).

    Returns [T, D] bool match flags for detections sorted by score desc
    (the order is also returned so scores can be aligned globally)."""
    order = np.argsort(-dt_scores, kind="mergesort")[:MAX_DETS]
    dt_boxes = dt_boxes[order]
    ious = _iou_xywh(dt_boxes, gt_boxes)
    t_count = len(iou_thrs)
    matched = np.zeros((t_count, len(dt_boxes)), bool)
    for ti, t in enumerate(iou_thrs):
        used = np.zeros(len(gt_boxes), bool)
        for di in range(len(dt_boxes)):
            cand = np.where(used, -1.0, ious[di])
            if len(cand) == 0:
                break
            gi = int(np.argmax(cand))  # first max on ties (COCOeval's tie
            # order differs only when two gts have bit-equal IoU)
            if cand[gi] >= t:
                matched[ti, di] = True
                used[gi] = True
    return matched, order


def _average_precision(scores, matched, num_gt, recall_thrs):
    """COCOeval accumulate for one (category, IoU threshold): 101-point
    interpolated precision averaged over the recall grid."""
    if num_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    m = matched[order]
    tp = np.cumsum(m)
    fp = np.cumsum(~m)
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # monotone non-increasing envelope from the right (COCOeval loop)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    # precision at the first detection whose recall >= r (0 past the end)
    inds = np.searchsorted(recall, recall_thrs, side="left")
    q = np.where(inds < len(precision), precision[np.minimum(inds, len(precision) - 1)], 0.0)
    return float(q.mean())


def coco_map(gt_dataset: dict, results: list,
             iou_thrs: np.ndarray = IOU_THRESHOLDS) -> dict:
    """Evaluate detection results against a faux-COCO dict.

    gt_dataset: {"images": [{"id"}], "categories": [{"id"}],
                 "annotations": [{"image_id", "category_id", "bbox" xywh}]}
    results:    [{"image_id", "category_id", "bbox" xywh, "score"}]

    Returns {"map": AP@[.5:.95], "map_50": AP@0.5, "per_category": {...}}.
    """
    cat_ids = [c["id"] for c in gt_dataset["categories"]]
    gt_by_ic = defaultdict(list)
    for a in gt_dataset.get("annotations", []):
        if a.get("iscrowd", 0):
            continue
        gt_by_ic[(a["image_id"], a["category_id"])].append(a["bbox"])
    dt_by_ic = defaultdict(list)
    for r in results:
        dt_by_ic[(r["image_id"], r["category_id"])].append(
            (r["bbox"], r["score"]))

    image_ids = [im["id"] for im in gt_dataset["images"]]
    t_count = len(iou_thrs)
    per_cat_ap = {}
    for cid in cat_ids:
        num_gt = 0
        scores_all: list = []
        matched_all: list = []  # [T] lists
        matched_cols = [[] for _ in range(t_count)]
        for img in image_ids:
            gts = np.asarray(gt_by_ic.get((img, cid), ()), np.float64).reshape(-1, 4)
            num_gt += len(gts)
            dts = dt_by_ic.get((img, cid), [])
            if not dts:
                continue
            boxes = np.asarray([d[0] for d in dts], np.float64).reshape(-1, 4)
            scores = np.asarray([d[1] for d in dts], np.float64)
            m, order = _match_image(boxes, scores, gts, iou_thrs)
            scores_all.append(scores[order])
            for ti in range(t_count):
                matched_cols[ti].append(m[ti])
        if num_gt == 0:
            per_cat_ap[cid] = None  # COCOeval's -1: excluded from the mean
            continue
        scores_cat = (np.concatenate(scores_all) if scores_all
                      else np.zeros((0,)))
        aps = []
        for ti in range(t_count):
            m_cat = (np.concatenate(matched_cols[ti]) if matched_cols[ti]
                     else np.zeros((0,), bool))
            aps.append(_average_precision(scores_cat, m_cat, num_gt,
                                          RECALL_THRESHOLDS))
        per_cat_ap[cid] = np.asarray(aps)

    valid = [v for v in per_cat_ap.values() if v is not None]
    if not valid:
        return {"map": 0.0, "map_50": 0.0, "per_category": {}}
    all_aps = np.stack(valid)                      # [C, T]
    # map_50 is only meaningful if 0.5 is among the evaluated thresholds;
    # report None rather than silently substituting the nearest one
    has_50 = np.abs(iou_thrs - 0.5) < 1e-9
    i50 = int(np.argmax(has_50)) if has_50.any() else None
    return {
        "map": float(all_aps.mean()),
        "map_50": (float(all_aps[:, i50].mean()) if i50 is not None else None),
        "per_category": {cid: (None if v is None else float(v.mean()))
                         for cid, v in per_cat_ap.items()},
    }
