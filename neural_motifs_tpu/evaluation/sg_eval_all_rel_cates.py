"""Per-predicate Recall@K (equivalent of reference
lib/evaluation/sg_eval_all_rel_cates.py): the same matching as sg_eval, but
recall is bucketed per predicate category, giving the mean-recall-style
breakdown used for the long-tail analysis."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from neural_motifs_tpu.evaluation.sg_eval import evaluate_recall


class PerPredicateEvaluator:
    def __init__(self, mode: str, ind_to_predicates: list[str],
                 ks=(20, 50, 100)):
        self.mode = mode
        self.ind_to_predicates = ind_to_predicates
        self.ks = ks
        # per predicate: list over images of (num_matched, num_gt)
        self.buckets = {k: defaultdict(list) for k in ks}

    def evaluate_scene_graph_entry(self, gt_entry, pred_entry, iou_thresh=0.5):
        gt_rels = gt_entry["gt_relations"]
        gt_boxes = gt_entry["gt_boxes"].astype(float)
        gt_classes = gt_entry["gt_classes"]
        if self.mode == "predcls":
            pred_boxes, pred_classes = gt_boxes, gt_classes
            obj_scores = np.ones(len(gt_classes))
        elif self.mode == "sgcls":
            pred_boxes = gt_boxes
            pred_classes = pred_entry["pred_classes"]
            obj_scores = pred_entry["obj_scores"]
        else:
            pred_boxes = pred_entry["pred_boxes"].astype(float)
            pred_classes = pred_entry["pred_classes"]
            obj_scores = pred_entry["obj_scores"]

        pri = pred_entry["pred_rel_inds"]
        rs = pred_entry["rel_scores"]
        pred_rels = np.column_stack((pri, 1 + rs[:, 1:].argmax(1)))
        pred_to_gt = evaluate_recall(gt_rels, gt_boxes, gt_classes, pred_rels,
                                     pred_boxes, pred_classes,
                                     rs[:, 1:].max(1), obj_scores,
                                     iou_thresh=iou_thresh)
        for k in self.ks:
            matched = set()
            for m in pred_to_gt[:k]:
                matched.update(m)
            per_pred_gt = defaultdict(int)
            per_pred_hit = defaultdict(int)
            for gi, (s, o, p) in enumerate(gt_rels):
                per_pred_gt[int(p)] += 1
                if gi in matched:
                    per_pred_hit[int(p)] += 1
            for p, n in per_pred_gt.items():
                self.buckets[k][p].append(per_pred_hit[p] / n)

    def mean_recall(self, k=100) -> float:
        """Mean over predicate categories of per-category recall."""
        vals = [np.mean(v) for v in self.buckets[k].values() if v]
        return float(np.mean(vals)) if vals else 0.0

    def print_stats(self):
        print(f"================ per-predicate ({self.mode}) ================")
        for k in self.ks:
            print(f"mR@{k}: {self.mean_recall(k):.4f}")
            for p in sorted(self.buckets[k]):
                name = (self.ind_to_predicates[p]
                        if p < len(self.ind_to_predicates) else str(p))
                print(f"  {name:>20s}: {np.mean(self.buckets[k][p]):.4f}")
