"""Scene-graph Recall@K evaluation (numpy, host-side).

Same metric semantics as the reference evaluator (lib/evaluation/sg_eval.py):
per image, a predicted relationship triple counts as matching a GT triple iff

  * (sub_class, predicate, obj_class) are exactly equal, AND
  * both the subject and object boxes have IoU >= 0.5 with the GT boxes
    (for phrdet: the union boxes must overlap >= 0.5 instead)

Recall@K = |GT triples matched by any of the top-K predictions| / |GT|,
macro-averaged over images. Modes: predcls (GT boxes + classes given),
sgcls (GT boxes), sgdet (predicted boxes), plus the VRD-style preddet /
phrdet variants.

Differentially tested against the independent O(N^2) oracle in
sg_eval_slow.py (the test strategy of reference test_sg_eval.py).
"""

from __future__ import annotations

from functools import reduce

import numpy as np

from neural_motifs_tpu.config import MODES
from neural_motifs_tpu.utils.misc import argsort_desc, intersect_2d

np.set_printoptions(precision=3)


def _iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized pairwise IoU with the +1 inclusive convention."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    iw = (np.minimum(a[:, None, 2], b[None, :, 2]) -
          np.maximum(a[:, None, 0], b[None, :, 0]) + 1).clip(0)
    ih = (np.minimum(a[:, None, 3], b[None, :, 3]) -
          np.maximum(a[:, None, 1], b[None, :, 1]) + 1).clip(0)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


class BasicSceneGraphEvaluator:
    """Accumulates per-image R@{20,50,100}; mirrors the public API of the
    reference BasicSceneGraphEvaluator (sg_eval.py:11-40)."""

    def __init__(self, mode: str, multiple_preds: bool = False):
        self.mode = mode
        self.multiple_preds = multiple_preds
        self.result_dict = {mode + "_recall": {20: [], 50: [], 100: []}}

    @classmethod
    def all_modes(cls, **kwargs):
        return {m: cls(mode=m, **kwargs) for m in MODES}

    @classmethod
    def vrd_modes(cls, **kwargs):
        return {m: cls(mode=m, multiple_preds=True, **kwargs)
                for m in ("preddet", "phrdet")}

    def evaluate_scene_graph_entry(self, gt_entry, pred_entry, iou_thresh=0.5):
        return evaluate_from_dict(gt_entry, pred_entry, self.mode,
                                  self.result_dict,
                                  multiple_preds=self.multiple_preds,
                                  iou_thresh=iou_thresh)

    def save(self, fn):
        np.save(fn, self.result_dict)

    def print_stats(self):
        print("======================" + self.mode + "============================")
        for k, v in self.result_dict[self.mode + "_recall"].items():
            print("R@%i: %f" % (k, np.mean(v)))

    def mean_recall(self, k=100) -> float:
        return float(np.mean(self.result_dict[self.mode + "_recall"][k]))


def evaluate_from_dict(gt_entry, pred_entry, mode, result_dict,
                       multiple_preds=False, iou_thresh=0.5):
    """Dispatch one image. gt_entry: gt_relations [R,3] (sub, obj, pred),
    gt_boxes [G,4], gt_classes [G]. pred_entry: pred_rel_inds [P,2],
    rel_scores [P,NP], and (mode-dependent) pred_boxes/pred_classes/obj_scores.
    """
    gt_rels = gt_entry["gt_relations"]
    gt_boxes = gt_entry["gt_boxes"].astype(float)
    gt_classes = gt_entry["gt_classes"]

    pred_rel_inds = pred_entry["pred_rel_inds"]
    rel_scores = pred_entry["rel_scores"]

    if mode == "predcls":
        pred_boxes, pred_classes = gt_boxes, gt_classes
        obj_scores = np.ones(gt_classes.shape[0])
    elif mode == "sgcls":
        pred_boxes = gt_boxes
        pred_classes = pred_entry["pred_classes"]
        obj_scores = pred_entry["obj_scores"]
    elif mode in ("sgdet", "phrdet"):
        pred_boxes = pred_entry["pred_boxes"].astype(float)
        pred_classes = pred_entry["pred_classes"]
        obj_scores = pred_entry["obj_scores"]
    elif mode == "preddet":
        # only score the pairs that exist in GT (sg_eval.py:74-94)
        prc = intersect_2d(pred_rel_inds, gt_rels[:, :2])
        if prc.size == 0:
            for k in result_dict[mode + "_recall"]:
                result_dict[mode + "_recall"][k].append(0.0)
            return None
        pred_inds_per_gt = prc.argmax(0)
        pred_rel_inds = pred_rel_inds[pred_inds_per_gt]
        rel_scores = rel_scores[pred_inds_per_gt]
        sorted_ids = argsort_desc(rel_scores[:, 1:])
        triples = np.column_stack((pred_rel_inds[sorted_ids[:, 0]],
                                   sorted_ids[:, 1] + 1))
        matches = intersect_2d(triples, gt_rels)
        for k in result_dict[mode + "_recall"]:
            rec = float(matches[:k].any(0).sum()) / float(gt_rels.shape[0])
            result_dict[mode + "_recall"][k].append(rec)
        return None
    else:
        raise ValueError(f"invalid mode {mode}")

    if multiple_preds:
        # every (pair, predicate) combination competes (sg_eval.py:98-103)
        obj_scores_per_rel = obj_scores[pred_rel_inds].prod(1)
        overall = obj_scores_per_rel[:, None] * rel_scores[:, 1:]
        score_inds = argsort_desc(overall)[:100]
        pred_rels = np.column_stack((pred_rel_inds[score_inds[:, 0]],
                                     score_inds[:, 1] + 1))
        predicate_scores = rel_scores[score_inds[:, 0], score_inds[:, 1] + 1]
    else:
        pred_rels = np.column_stack((pred_rel_inds,
                                     1 + rel_scores[:, 1:].argmax(1)))
        predicate_scores = rel_scores[:, 1:].max(1)

    pred_to_gt = evaluate_recall(gt_rels, gt_boxes, gt_classes, pred_rels,
                                 pred_boxes, pred_classes, predicate_scores,
                                 obj_scores, iou_thresh=iou_thresh,
                                 phrdet=(mode == "phrdet"))

    for k in result_dict[mode + "_recall"]:
        match = reduce(np.union1d, pred_to_gt[:k]) if pred_to_gt else np.zeros(0)
        rec = float(len(match)) / float(gt_rels.shape[0])
        result_dict[mode + "_recall"][k].append(rec)
    return pred_to_gt


def _triplets(rels, classes, boxes):
    """(sub_cls, pred, obj_cls) triples + stacked [sub_box, obj_box]."""
    trip = np.column_stack((classes[rels[:, 0]], rels[:, 2], classes[rels[:, 1]]))
    trip_boxes = np.column_stack((boxes[rels[:, 0]], boxes[rels[:, 1]]))
    return trip, trip_boxes


def evaluate_recall(gt_rels, gt_boxes, gt_classes, pred_rels, pred_boxes,
                    pred_classes, predicate_scores=None, obj_scores=None,
                    iou_thresh=0.5, phrdet=False):
    """Match predictions to GT; returns pred_to_gt, a list (one entry per
    prediction, in the given order) of GT relation indices it matches."""
    if pred_rels.size == 0:
        return [[]]
    assert gt_rels.shape[0] > 0
    assert np.all(pred_rels[:, 2] > 0), "background predicate in predictions"

    gt_trip, gt_trip_boxes = _triplets(gt_rels, gt_classes, gt_boxes)
    pred_trip, pred_trip_boxes = _triplets(pred_rels, pred_classes, pred_boxes)

    # optional monotonicity sanity check (sg_eval.py:186-189)
    if predicate_scores is not None and obj_scores is not None:
        overall = (predicate_scores * obj_scores[pred_rels[:, 0]]
                   * obj_scores[pred_rels[:, 1]])
        if not np.all(overall[1:] <= overall[:-1] + 1e-5):
            print("WARNING: predictions not sorted by triplet score")

    cls_match = intersect_2d(gt_trip, pred_trip)           # [G, P]
    pred_to_gt = [[] for _ in range(pred_rels.shape[0])]
    for gi in np.where(cls_match.any(1))[0]:
        cols = np.where(cls_match[gi])[0]
        if phrdet:
            gt_u = np.concatenate([
                np.minimum(gt_trip_boxes[gi, :2], gt_trip_boxes[gi, 4:6]),
                np.maximum(gt_trip_boxes[gi, 2:4], gt_trip_boxes[gi, 6:8])])
            pr = pred_trip_boxes[cols]
            pr_u = np.column_stack([np.minimum(pr[:, :2], pr[:, 4:6]),
                                    np.maximum(pr[:, 2:4], pr[:, 6:8])])
            ok = _iou_np(gt_u[None], pr_u)[0] >= iou_thresh
        else:
            sub_iou = _iou_np(gt_trip_boxes[gi, None, :4],
                              pred_trip_boxes[cols, :4])[0]
            obj_iou = _iou_np(gt_trip_boxes[gi, None, 4:],
                              pred_trip_boxes[cols, 4:])[0]
            ok = (sub_iou >= iou_thresh) & (obj_iou >= iou_thresh)
        for pi in cols[ok]:
            pred_to_gt[pi].append(int(gi))
    return pred_to_gt
