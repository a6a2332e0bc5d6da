"""Frequency-baseline evaluation — full equivalent of reference
models/eval_rel_count.py: the count-based P(predicate | sub_class,
obj_class) model evaluated in all three modes, plus the paper's analysis
numbers (most-frequent-predicate accuracy and zero-shot share).

Modes (eval_rel_count.py:120-246):
  * sgdet  — detector-predicted boxes/classes/scores (:126-173)
  * sgcls  — GT boxes, classifier-predicted classes; obj score = max raw
             logit over non-bg classes (:180-226)
  * predcls — GT boxes + GT classes, obj scores 1, top-100 pairs (:228-240)

The probability table is the MOST_COMMON_MODE variant (:59-68): bg counts
+1 in column 0, row-normalized, saved to pred_stats.npy, then the bg column
is zeroed for prediction. MUST_OVERLAP=False as in the reference (:26).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
from neural_motifs_tpu.models.frequency import box_filter, get_counts



def freq_prob_matrix(train_data, must_overlap: bool = False,
                     save_path: Optional[str] = "pred_stats.npy") -> np.ndarray:
    """[NC, NC, NP] P(pred | s, o): bg+1 in column 0, normalized, saved,
    then bg zeroed (eval_rel_count.py:59-68)."""
    fg, bg = get_counts(train_data, must_overlap=must_overlap)
    prob = fg.astype(np.float64)
    prob[:, :, 0] = bg + 1
    prob /= prob.sum(2, keepdims=True)
    if save_path:
        np.save(save_path, prob)
    prob[:, :, 0] = 0.0
    return prob


def predict(prob: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
            must_overlap: bool = False) -> np.ndarray:
    """[n, n, NP] table lookup on candidate pairs, zero elsewhere and in the
    bg column (eval_rel_count.py:76-84)."""
    n = boxes.shape[0]
    full = np.zeros((n, n, prob.shape[2]))
    for o1, o2 in box_filter(boxes, must_overlap=must_overlap):
        full[o1, o2] = prob[classes[o1], classes[o2]]
    full[:, :, 0] = 0.0
    return full


def all_pairs(n: int) -> np.ndarray:
    sub, obj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keep = sub.ravel() != obj.ravel()
    return np.column_stack((sub.ravel()[keep], obj.ravel()[keep]))


def analysis_numbers(prob: np.ndarray, eval_data) -> tuple[float, float]:
    """(most-frequent-predicate accuracy, zero-shot share) over eval_data's
    GT relations (eval_rel_count.py:101-118)."""
    nc, _, npred = prob.shape
    counts = np.zeros((nc, nc, npred), np.int64)
    for i in range(len(eval_data)):
        rels = eval_data.relationships[i]
        cls = eval_data.gt_classes[i]
        for s, o, p in rels:
            counts[cls[s], cls[o], p] += 1
    total = float(counts.sum())
    if total == 0:
        return 0.0, 0.0
    zeroshot = counts[prob == 0].sum() / total
    max_inds = prob.argmax(2).ravel()
    max_counts = counts.reshape(-1, npred)[np.arange(max_inds.shape[0]), max_inds]
    most_freq = max_counts.sum() / total
    return float(most_freq), float(zeroshot)


def _entry_from_dets(prob, boxes, classes, obj_scores, must_overlap,
                     triplet_rank: bool, topk: Optional[int] = None) -> Optional[dict]:
    """Build one evaluator entry: pairs scored by the table; ranked by the
    triplet product (sgdet/sgcls, :154-160) or the max rel prob (predcls,
    :232-234); zero-score pairs dropped."""
    n = boxes.shape[0]
    if n < 2:
        return None
    rels = all_pairs(n)
    fp = predict(prob, boxes, classes, must_overlap)
    fp_pred = fp[rels[:, 0], rels[:, 1]]
    if triplet_rank:
        scores = (obj_scores[rels[:, 0]] * obj_scores[rels[:, 1]]
                  * fp_pred.max(1))
    else:
        scores = fp_pred.max(1)
    order = np.argsort(-scores)
    order = order[scores[order] > 0]
    if topk is not None:
        order = order[:topk]
    return {"pred_boxes": boxes, "pred_classes": classes,
            "obj_scores": obj_scores, "pred_rel_inds": rels[order],
            "rel_scores": fp_pred[order]}


def eval_frequency_baseline(train_data, eval_data, mode: str = "predcls",
                            must_overlap: bool = False,
                            multiple_preds: bool = False,
                            prob: Optional[np.ndarray] = None,
                            det_fn: Optional[Callable[[int], tuple]] = None):
    """Run the count baseline over eval_data in one mode.

    det_fn(i) -> (boxes@BOX_SCALE, classes, scores) supplies predicted
    objects for sgdet (detector) / sgcls (gtbox classifier); predcls uses
    the GT directly. Returns the evaluator."""
    if prob is None:
        prob = freq_prob_matrix(train_data, must_overlap, save_path=None)
    evaluator = BasicSceneGraphEvaluator(mode, multiple_preds=multiple_preds)
    for i in range(len(eval_data)):
        gt = {"gt_classes": eval_data.gt_classes[i].copy(),
              "gt_relations": eval_data.relationships[i].copy(),
              "gt_boxes": eval_data.gt_boxes[i].copy()}
        if len(gt["gt_relations"]) == 0:
            continue
        if mode == "predcls":
            entry = _entry_from_dets(
                prob, gt["gt_boxes"], gt["gt_classes"],
                np.ones(len(gt["gt_classes"])), must_overlap,
                triplet_rank=False, topk=100)
        else:
            assert det_fn is not None, f"{mode} needs a det_fn"
            boxes, classes, scores = det_fn(i)
            entry = _entry_from_dets(prob, boxes, classes, scores,
                                     must_overlap, triplet_rank=True)
        if entry is None:
            continue
        evaluator.evaluate_scene_graph_entry(gt, entry)
    evaluator.print_stats()
    return evaluator


def make_classifier_det_fn(eval_data, cfg, train_data):
    """sgcls oracle objects: GT boxes + argmax of the gtbox classifier's
    non-bg logits; obj score = the RAW max logit (eval_rel_count.py:
    184-186). Returns det_fn(i)."""
    import jax
    import jax.numpy as jnp

    from neural_motifs_tpu.data.batching import Loader, loader_im_kw
    from neural_motifs_tpu.models.detector import ObjectDetector
    from neural_motifs_tpu.training import checkpoint as ckpt_lib

    model = ObjectDetector(num_classes=train_data.num_classes, mode="gtbox",
                           dtype=jnp.dtype(cfg.compute_dtype),
                           budgets=cfg.budgets)
    loader = Loader(eval_data, cfg.batch_size, shuffle=False,
                    budgets=cfg.budgets, num_workers=cfg.num_workers,
                    drop_last=False, **loader_im_kw(cfg))
    kwargs = lambda b: dict(images=b.images, im_hw=b.im_hw,
                            gt_boxes=b.gt_boxes, gt_classes=b.gt_classes,
                            gt_mask=b.gt_mask)
    example = loader.peek()
    variables = model.init({"params": jax.random.PRNGKey(0)}, train=False,
                           **kwargs(example))
    params = variables["params"]
    if cfg.ckpt:
        loaded = (ckpt_lib.import_reference_detector(cfg.ckpt)
                  if cfg.ckpt.endswith((".tar", ".pth", ".pt"))
                  else ckpt_lib.load_checkpoint(cfg.ckpt)["params"])
        params = ckpt_lib.optimistic_restore(params, loaded)
    fwd = jax.jit(lambda p, kw: model.apply(
        {"params": p, "batch_stats": variables.get("batch_stats", {})},
        train=False, **kw))

    results = {}
    for batch in loader:
        out = fwd(params, kwargs(batch))
        dists = np.asarray(out.rm_obj_dists)
        valid = np.asarray(out.rm_valid)
        for k in range(len(batch.image_ids)):
            if int(batch.image_ids[k]) < 0:   # -1 = tail-pad repeat
                continue
            nv = valid[k]
            logits = dists[k][nv][:, 1:]
            results[int(batch.image_ids[k])] = (
                eval_data.gt_boxes[int(batch.image_ids[k])].copy(),
                logits.argmax(1) + 1, logits.max(1))
    return lambda i: results[i]


def make_detector_det_fn(eval_data, cfg, train_data):
    """sgdet objects: the full detector decode (rpntrain/proposals mode at
    eval), boxes at the predicted class scaled to BOX_SCALE
    (eval_rel_count.py:131-143)."""
    import jax
    import jax.numpy as jnp

    from neural_motifs_tpu.data.batching import (Loader,
                                                 loader_im_kw)
    from neural_motifs_tpu.models.detector import ObjectDetector
    from neural_motifs_tpu.training import checkpoint as ckpt_lib

    mode = "proposals" if cfg.use_proposals else "rpntrain"
    model = ObjectDetector(num_classes=train_data.num_classes, mode=mode,
                           thresh=0.01, dtype=jnp.dtype(cfg.compute_dtype),
                           budgets=cfg.budgets)
    loader = Loader(eval_data, cfg.batch_size, shuffle=False,
                    budgets=cfg.budgets, num_workers=cfg.num_workers,
                    drop_last=False, **loader_im_kw(cfg))
    kwargs = lambda b: dict(images=b.images, im_hw=b.im_hw,
                            proposals=b.proposals,
                            proposal_mask=b.proposal_mask)
    example = loader.peek()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)},
                           train=False, **kwargs(example))
    params = variables["params"]
    if cfg.ckpt:
        loaded = (ckpt_lib.import_reference_detector(cfg.ckpt)
                  if cfg.ckpt.endswith((".tar", ".pth", ".pt"))
                  else ckpt_lib.load_checkpoint(cfg.ckpt)["params"])
        params = ckpt_lib.optimistic_restore(params, loaded)
    fwd = jax.jit(lambda p, kw: model.apply(
        {"params": p, "batch_stats": variables.get("batch_stats", {})},
        train=False, **kw))

    results = {}
    for batch in loader:
        out = fwd(params, kwargs(batch))
        boxes_all = np.asarray(out.boxes_all)
        preds = np.asarray(out.obj_preds)
        scores = np.asarray(out.obj_scores)
        valid = np.asarray(out.rm_valid)
        for k in range(len(batch.image_ids)):
            if int(batch.image_ids[k]) < 0:   # -1 = tail-pad repeat
                continue
            nv = valid[k]
            cls = preds[k][nv]
            bx = boxes_all[k][nv][np.arange(nv.sum()), cls]
            results[int(batch.image_ids[k])] = (
                bx * C.BOX_SCALE / C.IM_SCALE, cls, scores[k][nv])
    return lambda i: results[i]


def main(argv=None):
    cfg = C.ModelConfig.from_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        train, val, test = VG.splits(num_val_im=cfg.val_size,
                                     filter_duplicate_rels=True,
                                     use_proposals=cfg.use_proposals,
                                     filter_non_overlap=False)
    except FileNotFoundError as e:
        print(f"[eval_rel_count] {e}\nFalling back to SyntheticVG.")
        from neural_motifs_tpu.data.synthetic import SyntheticVG
        train, val, test = SyntheticVG.splits(num_images=64)
    data = test if cfg.test else val

    prob = freq_prob_matrix(train, must_overlap=False)
    most_freq, zeroshot = analysis_numbers(prob, data)
    print(f" Rel acc={most_freq * 100:.2f}%, {zeroshot * 100:.2f}% zsl")

    evaluators = {}
    print("== predcls (GT boxes + classes) ==")
    evaluators["predcls"] = eval_frequency_baseline(
        train, data, mode="predcls", prob=prob,
        multiple_preds=cfg.multi_pred)
    if cfg.ckpt:  # classifier/detector variants need trained weights
        print("== sgcls (GT boxes, classified) ==")
        evaluators["sgcls"] = eval_frequency_baseline(
            train, data, mode="sgcls", prob=prob,
            multiple_preds=cfg.multi_pred,
            det_fn=make_classifier_det_fn(data, cfg, train))
        print("== sgdet (detected boxes) ==")
        evaluators["sgdet"] = eval_frequency_baseline(
            train, data, mode="sgdet", prob=prob,
            multiple_preds=cfg.multi_pred,
            det_fn=make_detector_det_fn(data, cfg, train))
    else:
        print("(no -ckpt given: skipping sgcls/sgdet detector baselines)")
    return evaluators


if __name__ == "__main__":
    main()
