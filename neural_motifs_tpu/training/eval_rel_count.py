"""Frequency-baseline evaluation (equivalent of reference
models/eval_rel_count.py): score every object pair with the empirical
P(predicate | sub_class, obj_class) table from the training set — no neural
net, CPU-runnable, and the first end-to-end validation of data + evaluator.
"""

from __future__ import annotations

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
from neural_motifs_tpu.models.frequency import get_counts


def freq_prob_matrix(train_data, must_overlap: bool = True) -> np.ndarray:
    """[NC, NC, NP] P(pred | s, o) with bg counts in column 0
    (eval_rel_count.py:59-68 semantics)."""
    fg, bg = get_counts(train_data, must_overlap=must_overlap)
    fg = fg.astype(np.float64)
    fg[:, :, 0] = bg + 1
    return fg / fg.sum(2, keepdims=True)


def eval_frequency_baseline(train_data, eval_data, mode: str = "predcls",
                            must_overlap: bool = True,
                            multiple_preds: bool = False):
    """Runs the count baseline over eval_data on GT boxes/classes."""
    prob = freq_prob_matrix(train_data, must_overlap)
    evaluator = BasicSceneGraphEvaluator(mode, multiple_preds=multiple_preds)
    for i in range(len(eval_data)):
        cls = eval_data.gt_classes[i]
        boxes = eval_data.gt_boxes[i]
        rels = eval_data.relationships[i]
        if len(rels) == 0 or len(cls) < 2:
            continue
        n = len(cls)
        sub, obj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        keep = sub.ravel() != obj.ravel()
        pair_inds = np.column_stack((sub.ravel()[keep], obj.ravel()[keep]))
        rel_scores = prob[cls[pair_inds[:, 0]], cls[pair_inds[:, 1]]]
        order = np.argsort(-rel_scores[:, 1:].max(1))
        entry = {"pred_boxes": boxes, "pred_classes": cls,
                 "obj_scores": np.ones(n),
                 "pred_rel_inds": pair_inds[order],
                 "rel_scores": rel_scores[order]}
        gt = {"gt_classes": cls, "gt_relations": rels, "gt_boxes": boxes}
        evaluator.evaluate_scene_graph_entry(gt, entry)
    evaluator.print_stats()
    return evaluator


def main(argv=None):
    cfg = C.ModelConfig.from_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        train, val, test = VG.splits(num_val_im=cfg.val_size,
                                     filter_duplicate_rels=True,
                                     filter_non_overlap=False)
    except FileNotFoundError as e:
        print(f"[eval_rel_count] {e}\nFalling back to SyntheticVG.")
        from neural_motifs_tpu.data.synthetic import SyntheticVG
        train, val, test = SyntheticVG.splits(num_images=64)
    data = test if cfg.test else val
    prob = freq_prob_matrix(train)
    np.save("pred_stats.npy", prob)
    return eval_frequency_baseline(train, data, mode="predcls",
                                   multiple_preds=cfg.multi_pred)


if __name__ == "__main__":
    main()
