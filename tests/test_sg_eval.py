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


def test_multiple_preds_beats_single_when_second_guess_right(rng):
    """multiple_preds scores all predicates per pair (sg_eval.py:98-103):
    construct a case where the argmax predicate is wrong but the
    second-best is right — only multi_pred recalls it."""
    gt_boxes = np.array([[0, 0, 50, 50], [100, 100, 160, 160]], float)
    gt_classes = np.array([3, 7])
    gt = dict(gt_relations=np.array([[0, 1, 2]]), gt_boxes=gt_boxes,
              gt_classes=gt_classes)
    rel_scores = np.zeros((2, 5))
    rel_scores[0, 1] = 0.6   # wrong predicate ranked first
    rel_scores[0, 2] = 0.3   # right predicate second
    rel_scores[1, 3] = 0.1
    pred = dict(pred_boxes=gt_boxes, pred_classes=gt_classes,
                obj_scores=np.ones(2),
                pred_rel_inds=np.array([[0, 1], [1, 0]]),
                rel_scores=rel_scores)
    single = BasicSceneGraphEvaluator("sgdet")
    single.evaluate_scene_graph_entry(gt, pred)
    multi = BasicSceneGraphEvaluator("sgdet", multiple_preds=True)
    multi.evaluate_scene_graph_entry(gt, pred)
    assert single.result_dict["sgdet_recall"][100][-1] == 0.0
    assert multi.result_dict["sgdet_recall"][100][-1] == 1.0


def test_phrdet_union_box_matching(rng):
    """phrdet matches on the union box (sg_eval.py:266-274): shift both
    boxes so neither matches individually but the union does."""
    gt_boxes = np.array([[0, 0, 100, 100], [120, 0, 220, 100]], float)
    gt_classes = np.array([3, 7])
    gt = dict(gt_relations=np.array([[0, 1, 2]]), gt_boxes=gt_boxes,
              gt_classes=gt_classes)
    # predicted boxes split the union differently: sub covers most of the
    # union, obj is a sliver — per-box IoU < 0.5 vs GT, union IoU ~ 1
    pred_boxes = np.array([[0, 0, 180, 100], [180, 0, 220, 100]], float)
    rel_scores = np.zeros((1, 5))
    rel_scores[0, 2] = 0.9
    pred = dict(pred_boxes=pred_boxes, pred_classes=gt_classes,
                obj_scores=np.ones(2),
                pred_rel_inds=np.array([[0, 1]]), rel_scores=rel_scores)
    sgdet = BasicSceneGraphEvaluator("sgdet")
    sgdet.evaluate_scene_graph_entry(gt, pred)
    phr = BasicSceneGraphEvaluator("phrdet")
    phr.evaluate_scene_graph_entry(gt, pred)
    assert sgdet.result_dict["sgdet_recall"][100][-1] == 0.0
    assert phr.result_dict["phrdet_recall"][100][-1] == 1.0


def test_preddet_only_gt_pairs(rng):
    """preddet restricts scoring to pairs present in GT (sg_eval.py:74-94)."""
    gt_boxes = np.array([[0, 0, 50, 50], [100, 100, 160, 160]], float)
    gt_classes = np.array([3, 7])
    gt = dict(gt_relations=np.array([[0, 1, 2]]), gt_boxes=gt_boxes,
              gt_classes=gt_classes)
    rel_scores = np.zeros((2, 5))
    rel_scores[0, 2] = 0.9   # right pair, right predicate
    rel_scores[1, 4] = 0.95  # wrong pair with higher score — must be ignored
    pred = dict(pred_boxes=gt_boxes, pred_classes=gt_classes,
                obj_scores=np.ones(2),
                pred_rel_inds=np.array([[0, 1], [1, 0]]),
                rel_scores=rel_scores)
    ev = BasicSceneGraphEvaluator("preddet", multiple_preds=True)
    ev.evaluate_scene_graph_entry(gt, pred)
    assert ev.result_dict["preddet_recall"][100][-1] == 1.0
