"""Differential test: vectorized evaluator vs the independent loop oracle on
synthetic scenes (fake predictions over random GT, the pattern of reference
test_sg_eval.py:188-245)."""

import numpy as np

from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
from neural_motifs_tpu.evaluation.sg_eval_slow import eval_relation_recall_slow


def make_scene(rng, n_gt=8, n_pred=12, n_cls=20, n_predicates=10):
    gt_boxes = np.zeros((n_gt, 4))
    xy = rng.uniform(0, 400, (n_gt, 2))
    wh = rng.uniform(20, 150, (n_gt, 2))
    gt_boxes[:, :2] = xy
    gt_boxes[:, 2:] = xy + wh
    gt_classes = rng.randint(1, n_cls, n_gt)
    pairs = [(i, j) for i in range(n_gt) for j in range(n_gt) if i != j]
    sel = rng.choice(len(pairs), min(6, len(pairs)), replace=False)
    gt_rels = np.array([[pairs[s][0], pairs[s][1], rng.randint(1, n_predicates)]
                        for s in sel])

    # predictions: jittered GT boxes + extras
    pred_boxes = np.concatenate([
        gt_boxes + rng.uniform(-12, 12, gt_boxes.shape),
        rng.uniform(0, 400, (n_pred - n_gt, 4))], 0)
    pred_boxes[:, 2:] = np.maximum(pred_boxes[:, 2:], pred_boxes[:, :2] + 1)
    pred_classes = np.concatenate([
        np.where(rng.uniform(size=n_gt) < 0.7, gt_classes, rng.randint(1, n_cls, n_gt)),
        rng.randint(1, n_cls, n_pred - n_gt)])
    obj_scores = rng.uniform(0.1, 1.0, n_pred)

    ppairs = [(i, j) for i in range(n_pred) for j in range(n_pred) if i != j]
    psel = rng.choice(len(ppairs), 40, replace=False)
    pred_rel_inds = np.array([ppairs[s] for s in psel])
    rel_scores = rng.dirichlet(np.ones(n_predicates), len(psel))

    # sort by triplet score desc (evaluator contract)
    trip = (rel_scores[:, 1:].max(1) * obj_scores[pred_rel_inds[:, 0]]
            * obj_scores[pred_rel_inds[:, 1]])
    order = np.argsort(-trip)
    return (dict(gt_relations=gt_rels, gt_boxes=gt_boxes, gt_classes=gt_classes),
            dict(pred_boxes=pred_boxes, pred_classes=pred_classes,
                 obj_scores=obj_scores, pred_rel_inds=pred_rel_inds[order],
                 rel_scores=rel_scores[order]))


def test_sgdet_differential(rng):
    ev = BasicSceneGraphEvaluator("sgdet")
    slow = {20: [], 50: [], 100: []}
    for _ in range(25):
        gt, pred = make_scene(rng)
        ev.evaluate_scene_graph_entry(gt, pred)
        pred_rels = np.column_stack((pred["pred_rel_inds"],
                                     1 + pred["rel_scores"][:, 1:].argmax(1)))
        for k in slow:
            slow[k].append(eval_relation_recall_slow(
                gt["gt_relations"], gt["gt_boxes"], gt["gt_classes"],
                pred_rels, pred["pred_boxes"], pred["pred_classes"], k))
    for k in slow:
        np.testing.assert_allclose(ev.result_dict["sgdet_recall"][k], slow[k],
                                   atol=1e-9)


def test_predcls_differential(rng):
    ev = BasicSceneGraphEvaluator("predcls")
    slow = {20: [], 50: [], 100: []}
    for _ in range(15):
        gt, _ = make_scene(rng)
        n = len(gt["gt_classes"])
        ppairs = np.array([(i, j) for i in range(n) for j in range(n) if i != j])
        rel_scores = rng.dirichlet(np.ones(10), len(ppairs))
        order = np.argsort(-rel_scores[:, 1:].max(1))
        pred = dict(pred_rel_inds=ppairs[order], rel_scores=rel_scores[order])
        ev.evaluate_scene_graph_entry(gt, pred)
        pred_rels = np.column_stack((pred["pred_rel_inds"],
                                     1 + pred["rel_scores"][:, 1:].argmax(1)))
        for k in slow:
            slow[k].append(eval_relation_recall_slow(
                gt["gt_relations"], gt["gt_boxes"], gt["gt_classes"],
                pred_rels, gt["gt_boxes"], gt["gt_classes"], k))
    for k in slow:
        np.testing.assert_allclose(ev.result_dict["predcls_recall"][k], slow[k],
                                   atol=1e-9)


def test_perfect_predictions_give_recall_one(rng):
    gt, _ = make_scene(rng)
    n = len(gt["gt_classes"])
    pred = dict(pred_boxes=gt["gt_boxes"].copy(), pred_classes=gt["gt_classes"].copy(),
                obj_scores=np.ones(n),
                pred_rel_inds=gt["gt_relations"][:, :2].copy(),
                rel_scores=np.eye(10)[gt["gt_relations"][:, 2]] * 0.9 + 0.005)
    ev = BasicSceneGraphEvaluator("sgdet")
    ev.evaluate_scene_graph_entry(gt, pred)
    for k in (20, 50, 100):
        assert ev.result_dict["sgdet_recall"][k][-1] == 1.0
