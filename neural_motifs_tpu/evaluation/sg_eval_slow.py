"""Independent O(N*M) loop-based recall oracle, used ONLY for differential
testing of sg_eval.py (the strategy of reference test_sg_eval.py:9-105 /
sg_eval_slow.py, which keep a second from-scratch evaluator around "just to
check that it is exactly the same").

Deliberately written in the dumbest possible style — per-GT-relation,
per-prediction python loops, scalar IoU — sharing no code with sg_eval.py.
"""

from __future__ import annotations

import numpy as np


def _iou_single(a, b) -> float:
    iw = min(a[2], b[2]) - max(a[0], b[0]) + 1.0
    if iw <= 0:
        return 0.0
    ih = min(a[3], b[3]) - max(a[1], b[1]) + 1.0
    if ih <= 0:
        return 0.0
    area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
    area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0)
    return iw * ih / (area_a + area_b - iw * ih)


def eval_relation_recall_slow(gt_rels, gt_boxes, gt_classes,
                              pred_rels, pred_boxes, pred_classes,
                              top_k: int, iou_thresh: float = 0.5) -> float:
    """Recall@top_k for one image.

    gt_rels / pred_rels: [*, 3] rows of (sub_idx, obj_idx, predicate);
    pred_rels must already be sorted by descending triplet score.
    """
    num_gt = gt_rels.shape[0]
    if num_gt == 0:
        return 0.0
    hit = np.zeros(num_gt, dtype=bool)
    for p in range(min(top_k, pred_rels.shape[0])):
        ps, po, pp = pred_rels[p]
        for g in range(num_gt):
            if hit[g]:
                continue
            gs, go, gp = gt_rels[g]
            if int(pp) != int(gp):
                continue
            if int(pred_classes[ps]) != int(gt_classes[gs]):
                continue
            if int(pred_classes[po]) != int(gt_classes[go]):
                continue
            if _iou_single(pred_boxes[ps], gt_boxes[gs]) < iou_thresh:
                continue
            if _iou_single(pred_boxes[po], gt_boxes[go]) < iou_thresh:
                continue
            hit[g] = True
    return float(hit.sum()) / float(num_gt)
