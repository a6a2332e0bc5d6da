"""TRAINING-STEP gradient parity: one RelModel train step (loss + grads +
BN batch-stat updates) vs a torch float64 autograd oracle built from the
reference training semantics (models/train_rels.py:140-153 losses, :51-52
frozen detector, lib/rel_model.py:450-547 forward).

Mechanism: the same fabricated reference-layout state dict drives both
sides (jax through the real checkpoint importer); the jax step's sampled
relation pairs are extracted from its output and replayed into the oracle
(sampling RNG cannot match across frameworks — sampling itself has its own
distribution tests in test_sampling.py); torch gradients come back in
reference layout and are mapped through the SAME importer (a purely linear
remapping) for leaf-wise comparison against the jax gradients.

What this pins down, per VERDICT r4 item 1:
  * both loss terms (object CE over all valid rois, predicate CE over the
    sampled pairs — both plain means over the batch concat)
  * per-parameter gradients of EVERY trainable rel-model leaf (rtol 1e-4,
    jax f32 vs torch f64)
  * the frozen-detector boundary: jax grads into the whole detector
    subtree must be EXACTLY zero
  * MaskedBatchNorm train-mode running-stat updates (pos_embed BN +
    the two union-conv BNs) against torch BN momentum semantics

Dropout is monkeypatched to identity on the jax side and omitted on the
torch side — dropout masks are RNG-coupled and cannot match across
frameworks; everything else runs real train-mode code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest
from flax.traverse_util import flatten_dict

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.rel_model import RelModel
from neural_motifs_tpu.training.checkpoint import (import_reference_rel_model,
                                                   optimistic_restore)
from neural_motifs_tpu.training.losses import rel_losses

from tests import torch_autograd_oracle as tao
from tests.test_e2e_parity import (fabricate_full_sd, oracle_roi_pool_flat,
                                   NC, NP, OBJ_DIM, POOL_DIM, EMBED_DIM, HID,
                                   NL_OBJ, NL_EDGE, IM, G)
from tests.test_union_boxes import np_draw_union_boxes

RTOL = 1e-4   # jax runs f32; the torch oracle runs f64


@pytest.fixture
def no_dropout(monkeypatch):
    """Identity dropout both sides (see module docstring)."""
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=True, rng=None: x)


def make_batch(rng, b=2, valid_counts=(4, 3), rels_per_image=(3, 2)):
    images = (rng.randn(b, IM, IM, 3) * 0.4).astype(np.float32)
    gt_boxes = np.zeros((b, G, 4), np.float32)
    gt_classes = np.zeros((b, G), np.int32)
    gt_mask = np.zeros((b, G), bool)
    gt_rels = np.zeros((b, 8, 3), np.int32)
    gt_rel_mask = np.zeros((b, 8), bool)
    for i, n in enumerate(valid_counts):
        xy = rng.uniform(0, IM * 0.5, (n, 2))
        wh = rng.uniform(12, IM * 0.45, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        gt_classes[i, :n] = rng.randint(1, NC, n)
        gt_mask[i, :n] = True
        # distinct fg pairs
        pairs = [(s, o) for s in range(n) for o in range(n) if s != o]
        rng.shuffle(pairs)
        for r in range(rels_per_image[i]):
            s, o = pairs[r]
            gt_rels[i, r] = (s, o, rng.randint(1, NP))
            gt_rel_mask[i, r] = True
    im_hw = np.full((b, 2), float(IM), np.float32)
    return dict(images=images, im_hw=im_hw, gt_boxes=gt_boxes,
                gt_classes=gt_classes, gt_mask=gt_mask, gt_rels=gt_rels,
                gt_rel_mask=gt_rel_mask)


def make_proposals(rng, gt_boxes, gt_mask, n_noise=3):
    """[B, N, 5] (score, x1, y1, x2, y2) proposals: one jittered copy of
    each GT box (IoU > 0.5 -> fg label) plus small far-corner noise boxes
    (IoU < 0.5 -> label 0, driving the decoder's argmax-commit branch)."""
    b, g = gt_mask.shape
    n = g + n_noise
    props = np.zeros((b, n, 5), np.float32)
    pmask = np.zeros((b, n), bool)
    for i in range(b):
        k = 0
        for j in range(g):
            if not gt_mask[i, j]:
                continue
            bx = gt_boxes[i, j].copy()
            wh = bx[2:] - bx[:2]
            bx[:2] += wh * rng.uniform(-0.05, 0.05, 2)
            bx[2:] += wh * rng.uniform(-0.05, 0.05, 2)
            props[i, k] = (rng.uniform(0.5, 1.0), *np.clip(bx, 0, IM - 1))
            pmask[i, k] = True
            k += 1
        for _ in range(n_noise):
            x, y = rng.uniform(IM - 14, IM - 8, 2)
            props[i, k] = (rng.uniform(0.1, 0.4), x, y,
                           x + rng.uniform(4, 6), y + rng.uniform(4, 6))
            pmask[i, k] = True
            k += 1
    return props, pmask


def build_model(mode, budgets, **extra):
    r7 = np.random.RandomState(7)
    return RelModel(
        num_classes=NC, num_rels=NP, mode=mode, budgets=budgets, **extra,
        dtype=jnp.float32, hidden_dim=HID, pooling_dim=POOL_DIM,
        obj_dim=OBJ_DIM, embed_dim=EMBED_DIM, nl_obj=NL_OBJ, nl_edge=NL_EDGE,
        order="leftright", use_bias=True, use_tanh=False, limit_vision=False,
        rec_dropout=0.0,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False,
        embed_vecs=r7.randn(NC, EMBED_DIM).astype(np.float32),
        decoder_embed_vecs=r7.randn(NC + 1, 100).astype(np.float32),
        freq_table=r7.randn(NC * NC, NP).astype(np.float32))


def import_params(model, variables, sd):
    imported, imported_stats = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, pooling_dim=POOL_DIM,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    params = optimistic_restore(variables["params"], imported, verbose=False)
    batch_stats = optimistic_restore(variables["batch_stats"], imported_stats,
                                     verbose=False)
    return params, batch_stats


def jax_train_grads(model, params, batch_stats, kw):
    """One value_and_grad train step (the exact loss fn of
    training/train_state.make_train_step, without the optimizer)."""

    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": batch_stats}, train=True,
            rngs={"sample": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"], **kw)
        losses = rel_losses(out)
        return losses["total"], (losses, mut, out)

    (_, (losses, mut, out)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    return (jax.device_get(losses), jax.device_get(mut["batch_stats"]),
            jax.device_get(out), jax.device_get(grads))


def run_oracle(sd, out, kw):
    """Replay the jax step's detector constants + sampled pairs through the
    torch oracle. Everything the frozen detector produced (fmap, boxes,
    logits, labels) enters as a constant — exactly the reference's
    stop-gradient boundary."""
    fmap = np.asarray(out.det.fmap, np.float64)
    rm_boxes = np.asarray(out.det.rm_boxes, np.float64)
    rm_valid = np.asarray(out.det.rm_valid)
    rm_dists = np.asarray(out.det.rm_obj_dists, np.float64)
    labels = np.asarray(out.obj_labels)
    rel_inds = np.asarray(out.rel_inds)
    rel_labels = np.asarray(out.rel_labels)
    rel_valid = np.asarray(out.rel_valid)

    b = rm_boxes.shape[0]
    boxes_l, logits_l, labels_l, pairs_l = [], [], [], []
    upool_l, opool_l, masks_l = [], [], []
    for i in range(b):
        n = int(rm_valid[i].sum())
        assert rm_valid[i][:n].all(), "valid rows must be a prefix"
        bx = rm_boxes[i, :n]
        boxes_l.append(bx)
        logits_l.append(rm_dists[i, :n])
        labels_l.append(labels[i, :n])
        opool_l.append(oracle_roi_pool_flat(fmap[i], bx))

        pv = rel_valid[i]
        pr = np.concatenate([rel_inds[i][pv],
                             rel_labels[i][pv][:, None]], 1)
        assert (pr[:, :2] < n).all()
        pairs_l.append(pr)
        sub_b, obj_b = bx[pr[:, 0]], bx[pr[:, 1]]
        union = np.concatenate([np.minimum(sub_b[:, :2], obj_b[:, :2]),
                                np.maximum(sub_b[:, 2:], obj_b[:, 2:])], 1)
        upool_l.append(oracle_roi_pool_flat(fmap[i], union)
                       .reshape(-1, 512, 7, 7))
        masks_l.append(np_draw_union_boxes(
            np.concatenate([sub_b, obj_b], 1).astype(np.float32), 27) - 0.5)

    return tao.oracle_train_step(
        sd, boxes=boxes_l, det_logits=logits_l, obj_labels=labels_l,
        pairs=pairs_l, upool=upool_l, obj_pool=opool_l, order="leftright",
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, hidden_dim=HID, obj_dim=OBJ_DIM,
        embed_dim=EMBED_DIM, pooling_dim=POOL_DIM, num_classes=NC,
        union_masks=masks_l)


def assert_grad_tree_close(jax_grads, torch_grads_sd, *, check_used):
    """Map reference-layout torch grads through the importer and compare
    leaf-wise. check_used: leaves that must carry nonzero gradient (guards
    against a vacuously-passing all-zeros comparison)."""
    g_imp, _ = import_reference_rel_model(
        torch_grads_sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, pooling_dim=POOL_DIM,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    flat_exp = flatten_dict(g_imp, sep="/")
    flat_got = flatten_dict(jax_grads, sep="/")

    # frozen-detector boundary: EXACT zeros (train_rels.py:51-52)
    det_leaves = [k for k in flat_got if k.startswith("detector/")]
    assert det_leaves, "no detector leaves found"
    for k in det_leaves:
        assert np.all(np.asarray(flat_got[k]) == 0.0), \
            f"gradient leaked into frozen detector at {k}"

    # every trainable rel-model leaf is covered by the oracle mapping
    rel_got = {k for k in flat_got if not k.startswith("detector/")}
    rel_exp = {k for k in flat_exp if not k.startswith("detector/")}
    assert rel_got <= rel_exp, f"uncovered jax leaves: {rel_got - rel_exp}"

    nonzero = set()
    for k in sorted(rel_got):
        eg = np.asarray(flat_exp[k], np.float64)
        gg = np.asarray(flat_got[k], np.float64)
        scale = max(np.abs(eg).max(), np.abs(gg).max(), 1e-12)
        diff = np.abs(gg - eg).max()
        assert diff <= RTOL * scale, \
            f"grad mismatch at {k}: max|diff|={diff:.3e}, scale={scale:.3e}"
        if np.abs(eg).max() > 0:
            nonzero.add(k)
    missing_power = {k for k in check_used if k not in nonzero}
    assert not missing_power, \
        f"expected nonzero grads at {missing_power} — test has no power there"


# leaves that MUST receive gradient in a motifnet train step (one per
# trainable component family), so a bug that silently zeroes a whole
# subtree cannot pass as "both sides zero"
POWER_LEAVES = [
    "roi_fmap/fc0/kernel", "roi_fmap/fc1/kernel",
    "roi_fmap_obj/fc0/kernel", "roi_fmap_obj/fc1/kernel",
    "context/obj_embed", "context/obj_embed2",
    "context/pos_bn/scale", "context/pos_fc/kernel",
    "context/obj_ctx_rnn/l0_w_i", "context/obj_ctx_rnn/l1_w_h",
    "context/edge_ctx_rnn/l0_w_i", "context/edge_ctx_rnn/l1_bias",
    "context/decoder_rnn/input_w", "context/decoder_rnn/state_w",
    "context/decoder_rnn/out_w", "context/decoder_rnn/obj_embed",
    "post_lstm/kernel", "rel_compress/kernel", "freq_bias",
    "union_boxes/Conv_0/kernel", "union_boxes/Conv_1/kernel",
    "union_boxes/BatchNorm_0/scale", "union_boxes/BatchNorm_1/scale",
]

_BN_STAT_MAP = {
    "context/pos_bn/mean": "context.pos_embed.0.running_mean",
    "context/pos_bn/var": "context.pos_embed.0.running_var",
    "union_boxes/BatchNorm_0/mean": "union_boxes.conv.2.running_mean",
    "union_boxes/BatchNorm_0/var": "union_boxes.conv.2.running_var",
    "union_boxes/BatchNorm_1/mean": "union_boxes.conv.6.running_mean",
    "union_boxes/BatchNorm_1/var": "union_boxes.conv.6.running_var",
}


def assert_bn_stats_close(new_stats_jax, new_stats_torch, old_stats_sd):
    flat = flatten_dict(new_stats_jax, sep="/")
    for jk, tk in _BN_STAT_MAP.items():
        got = np.asarray(flat[jk], np.float64)
        exp = np.asarray(new_stats_torch[tk], np.float64)
        old = np.asarray(old_stats_sd[tk], np.float64)
        assert np.abs(got - old).max() > 0, f"{jk} was not updated"
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-7,
                                   err_msg=f"BN stat {jk}")


def test_sgcls_train_step_gradient_parity(rng, no_dropout):
    sd = fabricate_full_sd(rng)
    kw_np = make_batch(rng)
    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8, rels_per_img=16,
                           max_pairs_eval=G * (G - 1))
    model = build_model("sgcls", budgets)
    kw = {k: jnp.asarray(v) for k, v in kw_np.items()}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, train=True, **kw)
    params, batch_stats = import_params(model, variables, sd)

    losses, new_bs, out, grads = jax_train_grads(model, params, batch_stats, kw)

    # the sample must include fg AND bg pairs or the rel loss is degenerate
    rl = np.asarray(out.rel_labels)[np.asarray(out.rel_valid)]
    assert (rl > 0).sum() >= 3 and (rl == 0).sum() >= 3, \
        f"degenerate rel sample: {rl}"

    res = run_oracle(sd, out, kw_np)
    np.testing.assert_allclose(losses["class_loss"], res["class_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(losses["rel_loss"], res["rel_loss"], rtol=1e-4)
    np.testing.assert_allclose(losses["total"], res["total"], rtol=1e-4)
    assert_grad_tree_close(grads, res["grads"], check_used=POWER_LEAVES)
    assert_bn_stats_close(new_bs, res["new_stats"], sd)


def test_sgdet_train_step_gradient_parity(rng, no_dropout):
    """Same check through the sgdet chain (proposals detector mode, so the
    untrained detector still lands boxes on the GT): per-class NMS + top-K
    detections and their IoU-assigned labels (incl. bg = 0 rows, which
    exercise the decoder's argmax-commit branch, decoder_rnn.py:206-212)
    all enter the rel model as frozen constants; the sgdet rel sample
    (rel_assign_sgdet fg + overlapping-bg pairs) is replayed into the
    oracle. The RPN/refinerels detector forward has its own e2e parity test
    (test_e2e_parity.py) — frozen, its gradient role is identical."""
    sd = fabricate_full_sd(rng)
    kw_np = make_batch(rng, b=2, valid_counts=(5, 4), rels_per_image=(3, 3))
    props, pmask = make_proposals(rng, kw_np["gt_boxes"], kw_np["gt_mask"])
    kw_np = dict(kw_np, proposals=props, proposal_mask=pmask)
    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8, rels_per_img=16,
                           rels_per_img_refine=16,
                           max_pairs_eval=G * (G - 1),
                           rpn_pre_nms_topn_test=720,
                           rpn_post_nms_topn_test=16,
                           objs_per_img=G + 3)
    model = build_model("sgdet", budgets, use_proposals=True, thresh=0.01)
    kw = {k: jnp.asarray(v) for k, v in kw_np.items()}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, train=True, **kw)
    params, batch_stats = import_params(model, variables, sd)

    losses, new_bs, out, grads = jax_train_grads(model, params, batch_stats, kw)

    n_det = int(np.asarray(out.det.rm_valid).sum())
    n_rel = int(np.asarray(out.rel_valid).sum())
    assert n_det >= 4 and n_rel >= 4, \
        f"degenerate sgdet step: {n_det} dets, {n_rel} rels"
    # sgdet labels include bg rows -> the argmax-commit branch runs
    lbl = np.asarray(out.obj_labels)[np.asarray(out.det.rm_valid)]
    assert (lbl == 0).any(), "no bg detections: argmax-commit branch untested"

    res = run_oracle(sd, out, kw_np)
    np.testing.assert_allclose(losses["class_loss"], res["class_loss"],
                               rtol=2e-4)
    np.testing.assert_allclose(losses["rel_loss"], res["rel_loss"], rtol=2e-4)
    assert_grad_tree_close(grads, res["grads"], check_used=POWER_LEAVES)
    assert_bn_stats_close(new_bs, res["new_stats"], sd)


def test_optimizer_groups():
    """The lr-group surface (train_rels.py:57-62 fc lr/10; :51-52 frozen
    detector): with unit grads, SGD updates must be exactly -lr on the rel
    params, -lr/10 on the roi_fmap towers, and 0 on the detector subtree."""
    import optax
    from neural_motifs_tpu.training.train_state import make_optimizer

    params = {
        "detector": {"score_fc": {"kernel": jnp.ones((3, 4))}},
        "roi_fmap": {"fc0": {"kernel": jnp.ones((3, 4))}},
        "roi_fmap_obj": {"fc1": {"bias": jnp.ones((4,))}},
        "post_lstm": {"kernel": jnp.ones((3, 4))},
    }
    tx = make_optimizer(0.5, l2=0.0, clip=1e9, fc_lr_factor=0.1,
                        freeze_detector=True)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    flat = flatten_dict(updates, sep="/")
    np.testing.assert_allclose(flat["detector/score_fc/kernel"], 0.0)
    np.testing.assert_allclose(flat["roi_fmap/fc0/kernel"], -0.05, rtol=1e-6)
    np.testing.assert_allclose(flat["roi_fmap_obj/fc1/bias"], -0.05, rtol=1e-6)
    np.testing.assert_allclose(flat["post_lstm/kernel"], -0.5, rtol=1e-6)
