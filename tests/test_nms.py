"""NMS: the on-device fixpoint iteration must reproduce exact greedy NMS
(numpy oracle) including padded/masked rows."""

import numpy as np
import jax.numpy as jnp

from neural_motifs_tpu.ops.nms import greedy_nms_mask, nms_topk, per_class_nms_mask
from tests.test_boxes import np_iou, rand_boxes


def np_greedy_nms(boxes, scores, valid, thresh):
    """Host oracle: classic greedy NMS over valid boxes in score order."""
    order = np.argsort(-np.where(valid, scores, -np.inf))
    keep = np.zeros(len(scores), bool)
    iou = np_iou(boxes, boxes)
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j != i and iou[i, j] > thresh:
                suppressed[j] = True
    return keep


def test_greedy_parity_random(rng):
    for trial in range(5):
        n = 64
        boxes = rand_boxes(rng, n, scale=100)  # dense -> many overlaps
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.2
        got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                         jnp.asarray(valid), 0.5))
        exp = np_greedy_nms(boxes, scores, valid, 0.5)
        np.testing.assert_array_equal(got, exp)


def test_suppression_chain():
    # 0 kills 1, 1 would kill 2, but 1 is dead -> 2 survives
    boxes = np.array([[0, 0, 10, 10],
                      [4, 0, 14, 10],
                      [9, 0, 19, 10]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.ones(3, bool)
    got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.3))
    np.testing.assert_array_equal(got, [True, False, True])


def test_nms_topk_returns_score_order(rng):
    n = 40
    boxes = rand_boxes(rng, n, scale=400)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    idx, ok = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                       0.7, pre_topn=n, post_topn=10)
    idx, ok = np.asarray(idx), np.asarray(ok)
    kept_scores = scores[idx[ok]]
    assert np.all(np.diff(kept_scores) <= 1e-6)
    exp = np_greedy_nms(boxes, scores, valid, 0.7)
    # the top-10 kept must be the highest-scoring survivors of greedy NMS
    exp_kept = np.argsort(-scores)[np.isin(np.argsort(-scores), np.where(exp)[0])][:10]
    np.testing.assert_array_equal(np.sort(idx[ok]), np.sort(exp_kept[:ok.sum()]))


def test_per_class_nms(rng):
    n, c = 20, 5
    boxes = rand_boxes(rng, n, scale=80)
    per_cls = np.repeat(boxes[:, None, :], c, axis=1)
    probs = rng.dirichlet(np.ones(c), n).astype(np.float32)
    valid = np.ones(n, bool)
    keep = np.asarray(per_class_nms_mask(jnp.asarray(per_cls), jnp.asarray(probs),
                                         jnp.asarray(valid), 0.3, 0.05))
    assert keep.shape == (n, c)
    assert not keep[:, 0].any()  # background never kept
    for ci in range(1, c):
        exp = np_greedy_nms(boxes, probs[:, ci], valid, 0.3)
        if probs[valid, ci].max() > 0.05:
            np.testing.assert_array_equal(keep[:, ci], exp)
        else:
            assert not keep[:, ci].any()


def test_tiled_path_parity(rng):
    # N > tile exercises the tiled cross-block suppression
    n = 300
    boxes = rand_boxes(rng, n, scale=150)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1
    got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.4, tile=128))
    exp = np_greedy_nms(boxes, scores, valid, 0.4)
    np.testing.assert_array_equal(got, exp)


def test_per_class_topk_matches_exact(rng):
    n, c = 60, 6
    boxes = rand_boxes(rng, n, scale=120)
    per_cls = np.stack([boxes + 2.0 * ci for ci in range(c)], axis=1)
    probs = rng.dirichlet(np.ones(c), n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1
    exact = np.asarray(per_class_nms_mask(jnp.asarray(per_cls), jnp.asarray(probs),
                                          jnp.asarray(valid), 0.3, 0.01,
                                          per_class_topk=None))
    K = 32
    fast = np.asarray(per_class_nms_mask(jnp.asarray(per_cls), jnp.asarray(probs),
                                         jnp.asarray(valid), 0.3, 0.01,
                                         per_class_topk=K))
    # guarantees: (1) fast keeps are a subset of exact keeps; (2) within each
    # class's top-K candidates the decisions agree exactly
    assert not (fast & ~exact).any()
    for ci in range(c):
        p_ci = np.where(valid, probs[:, ci], -1)
        topk = np.argsort(-p_ci)[:K]
        np.testing.assert_array_equal(fast[topk, ci], exact[topk, ci])


def test_per_class_nms_pallas_route_matches_xla(rng, monkeypatch):
    """The Pallas per-class NMS route (ops/pallas_nms.py, grid lanes =
    classes) must be bit-identical to the XLA fixpoint route."""
    import neural_motifs_tpu.ops.nms as nms_mod

    n, c = 96, 7
    boxes_per_cls = np.zeros((n, c, 4), np.float32)
    base = rng.uniform(0, 300, (n, 1, 2))
    wh = rng.uniform(20, 120, (n, 1, 2))
    jit_ = rng.uniform(-6, 6, (n, c, 4))
    boxes_per_cls[..., :2] = base + jit_[..., :2]
    boxes_per_cls[..., 2:] = base + wh + jit_[..., 2:]
    probs = rng.uniform(0, 1, (n, c)).astype(np.float32)
    valid = rng.rand(n) > 0.2

    kw = dict(iou_thresh=0.3, score_thresh=0.01, per_class_topk=64)
    monkeypatch.setenv("NM_PALLAS_NMS", "0")
    keep_xla = np.asarray(nms_mod.per_class_nms_mask(
        jnp.asarray(boxes_per_cls), jnp.asarray(probs), jnp.asarray(valid), **kw))
    monkeypatch.setenv("NM_PALLAS_NMS", "1")
    keep_pl = np.asarray(nms_mod.per_class_nms_mask(
        jnp.asarray(boxes_per_cls), jnp.asarray(probs), jnp.asarray(valid), **kw))
    np.testing.assert_array_equal(keep_xla, keep_pl)
