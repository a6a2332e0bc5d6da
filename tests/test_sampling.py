"""Samplers: budget/threshold/masking invariants (RNG parity with numpy is
impossible by design, so tests assert structure + distribution)."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu import config as C
from neural_motifs_tpu.ops.anchors import generate_anchors
from neural_motifs_tpu.ops.sampling import (anchor_targets, assign_labels_by_iou,
                                            proposal_assign_det, rel_assign_gtbox,
                                            rel_assign_sgdet)
from tests.test_boxes import np_iou, rand_boxes


def pad_to(arr, n, val=0):
    out = np.full((n,) + arr.shape[1:], val, arr.dtype)
    out[:len(arr)] = arr
    return out


def test_anchor_targets_budgets(rng):
    anchors = generate_anchors().reshape(-1, 4)
    g = 5
    gt = rand_boxes(rng, g, scale=500)
    gt_mask = np.ones(g, bool)
    out = anchor_targets(jax.random.PRNGKey(0), jnp.asarray(anchors),
                         jnp.asarray(gt), jnp.asarray(gt_mask),
                         jnp.asarray(592.0), jnp.asarray(592.0),
                         (37, 37, 20))
    labels = np.asarray(out.labels).reshape(-1)
    n_fg = (labels == 1).sum()
    n_bg = (labels == 0).sum()
    assert n_fg >= g  # every GT gets at least its best anchor
    assert n_fg <= 128
    assert n_fg + n_bg <= C.RPN_BATCHSIZE
    assert n_fg + n_bg >= C.RPN_BATCHSIZE - 5  # enough bg candidates to fill
    # fg anchors genuinely overlap their targets
    iou = np_iou(anchors[labels == 1], gt)
    assert iou.max(1).min() > 0.1
    # out-of-image anchors are never labeled
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
              (anchors[:, 2] < 592) & (anchors[:, 3] < 592))
    assert np.all(labels[~inside] == -1)


def test_proposal_assign_det_invariants(rng):
    g = 4
    gt = rand_boxes(rng, g, scale=400)
    gt_cls = rng.randint(1, 151, g)
    rois = np.concatenate([gt + rng.uniform(-5, 5, (g, 4)),  # near-GT = fg
                           rand_boxes(rng, 60, scale=500)], 0).astype(np.float32)
    roi_valid = np.ones(len(rois), bool)
    out = proposal_assign_det(jax.random.PRNGKey(1), jnp.asarray(rois),
                              jnp.asarray(roi_valid), jnp.asarray(gt),
                              jnp.asarray(gt_cls), jnp.asarray(np.ones(g, bool)))
    labels = np.asarray(out.labels)
    valid = np.asarray(out.valid)
    boxes = np.asarray(out.rois)
    assert labels.shape == (C.ROIS_PER_IMG,)
    assert (labels[valid] > 0).sum() <= int(C.ROIS_PER_IMG * C.FG_FRACTION)
    # every fg-labeled roi overlaps its matched GT >= 0.5
    fg = valid & (labels > 0)
    if fg.any():
        iou = np_iou(boxes[fg], gt)
        assert iou.max(1).min() >= 0.5 - 1e-6
    # invalid slots are label 0
    assert np.all(labels[~valid] == 0)


def test_rel_assign_gtbox(rng):
    g_pad, r_pad = 16, 32
    n_obj, n_rel = 7, 5
    gt_mask = np.zeros(g_pad, bool)
    gt_mask[:n_obj] = True
    rels = np.stack([rng.randint(0, n_obj, n_rel),
                     rng.randint(0, n_obj, n_rel),
                     rng.randint(1, 51, n_rel)], 1)
    rels = rels[rels[:, 0] != rels[:, 1]]
    rel_mask = np.zeros(r_pad, bool)
    rel_mask[:len(rels)] = True
    out = rel_assign_gtbox(jax.random.PRNGKey(2), jnp.asarray(gt_mask),
                           jnp.asarray(pad_to(rels, r_pad)), jnp.asarray(rel_mask),
                           rels_per_img=64)
    sub, obj = np.asarray(out.sub), np.asarray(out.obj)
    lbl, valid = np.asarray(out.label), np.asarray(out.valid)
    assert valid.sum() > 0
    # all selected pairs index valid objects and are non-diagonal
    assert np.all(sub[valid] < n_obj) and np.all(obj[valid] < n_obj)
    assert np.all(sub[valid] != obj[valid])
    # fg rels carry their GT predicate; all GT pairs selected as fg exist in rels
    fg = valid & (lbl > 0)
    gt_set = {(int(a), int(b), int(p)) for a, b, p in rels}
    for s, o, p in zip(sub[fg], obj[fg], lbl[fg]):
        assert (int(s), int(o), int(p)) in gt_set
    # bg pairs are never GT pairs
    gt_pairs = {(int(a), int(b)) for a, b, _ in rels}
    bg = valid & (lbl == 0)
    for s, o in zip(sub[bg], obj[bg]):
        assert (int(s), int(o)) not in gt_pairs


def test_rel_assign_sgdet(rng):
    p_pad, g_pad, r_pad = 16, 8, 8
    gt = rand_boxes(rng, 4, scale=300)
    gt_cls = np.array([3, 7, 7, 12])
    gt_rels = np.array([[0, 1, 5], [2, 3, 9]])
    # predictions: jittered copies of the GT (match) + unrelated boxes
    preds = np.concatenate([gt + rng.uniform(-2, 2, (4, 4)),
                            rand_boxes(rng, 4, scale=300)], 0).astype(np.float32)
    pred_lbl = np.concatenate([gt_cls, rng.randint(1, 151, 4)])
    out = rel_assign_sgdet(
        jax.random.PRNGKey(3),
        jnp.asarray(pad_to(preds, p_pad)), jnp.asarray(pad_to(pred_lbl, p_pad)),
        jnp.asarray(pad_to(np.ones(8, bool), p_pad, False)),
        jnp.asarray(pad_to(gt, g_pad)), jnp.asarray(pad_to(gt_cls, g_pad)),
        jnp.asarray(pad_to(np.ones(4, bool), g_pad, False)),
        jnp.asarray(pad_to(gt_rels, r_pad)),
        jnp.asarray(pad_to(np.ones(2, bool), r_pad, False)),
        filter_non_overlap=False)
    sub, obj = np.asarray(out.sub), np.asarray(out.obj)
    lbl, valid = np.asarray(out.label), np.asarray(out.valid)
    assert valid.shape == (C.RELS_PER_IMG_REFINE,)
    fg = valid & (lbl > 0)
    assert fg.sum() >= 1  # the jittered GT copies must produce fg rels
    assert fg.sum() <= int(round(C.REL_FG_FRACTION * C.RELS_PER_IMG_REFINE))
    # fg endpoints must label-match their GT rel endpoints
    for s, o, p in zip(sub[fg], obj[fg], lbl[fg]):
        gt_r = gt_rels[gt_rels[:, 2] == p][0]
        assert pred_lbl[s] == gt_cls[gt_r[0]]
        assert pred_lbl[o] == gt_cls[gt_r[1]]
    # bg pairs never connect a background-labeled prediction
    bg = valid & (lbl == 0)
    assert np.all(pred_lbl[sub[bg]] > 0)


def test_assign_labels_by_iou(rng):
    gt = rand_boxes(rng, 3, scale=200)
    gt_cls = np.array([5, 9, 20])
    preds = np.concatenate([gt + 1.0, rand_boxes(rng, 2, scale=2000) + 3000], 0)
    out = np.asarray(assign_labels_by_iou(
        jnp.asarray(preds.astype(np.float32)), jnp.asarray(np.ones(5, bool)),
        jnp.asarray(gt), jnp.asarray(gt_cls), jnp.asarray(np.ones(3, bool))))
    np.testing.assert_array_equal(out[:3], gt_cls)
    np.testing.assert_array_equal(out[3:], 0)
