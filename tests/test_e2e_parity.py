"""END-TO-END forward parity: full RelModel (sgcls, eval) from raw images vs
an independent torch/numpy composition of the reference pipeline
(lib/object_detector.py gtbox path + lib/rel_model.py:450-547 +
lib/get_union_boxes.py), sharing only a fabricated reference-layout state
dict that flows through the real checkpoint importer.

Head dims are shrunk (the layout transforms are dim-agnostic) but the VGG16
conv stack, the 7x7 RoIAlign geometry, the 27x27 union masks, and the union
conv net are at full structural fidelity. Images are 96x96 to keep the CPU
cost sane.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.rel_model import RelModel, all_pair_indices
from neural_motifs_tpu.training.checkpoint import (import_reference_rel_model,
                                                   optimistic_restore)

from tests import torch_reference as ref
from tests.test_roi_align import np_crop_and_resize
from tests.test_union_boxes import np_draw_union_boxes

NC, NP = 12, 8
OBJ_DIM = 128        # reference: 4096; layout transforms are dim-agnostic
POOL_DIM = 128
EMBED_DIM = 16
HID = 24
NL_OBJ, NL_EDGE = 2, 2
IM = 96
G = 8                # gt pad budget

_VGG_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_SHAPES = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
               (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]


def lstm_flat_sizes(d_in, h, layers):
    n = 0
    for l in range(layers):
        di = d_in if l == 0 else h
        n += di * 6 * h + h * 5 * h
    return n, layers * 5 * h


def fabricate_full_sd(rng, *, nc=NC, nprd=NP, obj_dim=OBJ_DIM,
                      pool_dim=POOL_DIM, embed_dim=EMBED_DIM, hid=HID,
                      nl_obj=NL_OBJ, nl_edge=NL_EDGE):
    sd = {}

    def lin(name, o, i, s=0.3):
        sd[f"{name}.weight"] = (rng.randn(o, i) * s / np.sqrt(i)).astype(np.float32)
        sd[f"{name}.bias"] = (rng.randn(o) * 0.05).astype(np.float32)

    def conv(name, o, i, k, s=1.0):
        sd[f"{name}.weight"] = (rng.randn(o, i, k, k) * s / np.sqrt(i * k * k)).astype(np.float32)
        sd[f"{name}.bias"] = (rng.randn(o) * 0.05).astype(np.float32)

    for idx, (o, i) in zip(_VGG_IDX, _VGG_SHAPES):
        conv(f"detector.features.{idx}", o, i, 3, s=1.6)
    lin("detector.roi_fmap.0", obj_dim, 25088, s=1.0)
    lin("detector.roi_fmap.3", obj_dim, obj_dim, s=1.0)
    lin("detector.score_fc", nc, obj_dim, s=6.0)
    lin("detector.bbox_fc", nc * 4, obj_dim)
    conv("detector.rpn_head.conv.0", 512, 512, 3)
    conv("detector.rpn_head.conv.2", 20 * 6, 512, 1)

    lin("roi_fmap.1.0", obj_dim, 25088, s=1.0)
    lin("roi_fmap.1.3", pool_dim, obj_dim, s=1.0)
    lin("roi_fmap_obj.0", obj_dim, 25088, s=1.0)
    lin("roi_fmap_obj.3", obj_dim, obj_dim, s=1.0)

    sd["context.obj_embed.weight"] = rng.randn(nc, embed_dim).astype(np.float32)
    sd["context.obj_embed2.weight"] = rng.randn(nc, embed_dim).astype(np.float32)
    sd["context.pos_embed.0.weight"] = (1 + 0.2 * rng.randn(4)).astype(np.float32)
    sd["context.pos_embed.0.bias"] = (0.1 * rng.randn(4)).astype(np.float32)
    sd["context.pos_embed.0.running_mean"] = (rng.randn(4) * 30).astype(np.float32)
    sd["context.pos_embed.0.running_var"] = (np.abs(rng.randn(4)) * 20 + 1).astype(np.float32)
    lin("context.pos_embed.1", 128, 4, s=1.0)

    d_in_obj = obj_dim + embed_dim + 128
    nw, nb = lstm_flat_sizes(d_in_obj, hid, nl_obj)
    sd["context.obj_ctx_rnn.weight"] = (rng.randn(nw) * 0.05).astype(np.float32)
    sd["context.obj_ctx_rnn.bias"] = (rng.randn(nb) * 0.05).astype(np.float32)

    sd["context.decoder_rnn.obj_embed.weight"] = rng.randn(nc + 1, 100).astype(np.float32)
    lin("context.decoder_rnn.input_linearity", 6 * hid, hid + 100, s=1.0)
    lin("context.decoder_rnn.state_linearity", 5 * hid, hid, s=1.0)
    lin("context.decoder_rnn.out", nc, hid, s=3.0)

    e_in = embed_dim + hid
    nw, nb = lstm_flat_sizes(e_in, hid, nl_edge)
    sd["context.edge_ctx_rnn.weight"] = (rng.randn(nw) * 0.1).astype(np.float32)
    sd["context.edge_ctx_rnn.bias"] = (rng.randn(nb) * 0.05).astype(np.float32)

    conv("union_boxes.conv.0", 256, 2, 7, s=2.0)
    for m, d in ((2, 256), (6, 512)):
        sd[f"union_boxes.conv.{m}.weight"] = (1 + 0.1 * rng.randn(d)).astype(np.float32)
        sd[f"union_boxes.conv.{m}.bias"] = (0.1 * rng.randn(d)).astype(np.float32)
        sd[f"union_boxes.conv.{m}.running_mean"] = (0.3 * rng.randn(d)).astype(np.float32)
        sd[f"union_boxes.conv.{m}.running_var"] = (np.abs(rng.randn(d)) * 0.5 + 0.5).astype(np.float32)
    conv("union_boxes.conv.4", 512, 256, 3, s=2.0)

    lin("post_lstm", pool_dim * 2, hid, s=2.0)
    lin("rel_compress", nprd, pool_dim, s=3.0)
    sd["freq_bias.obj_baseline.weight"] = rng.randn(nc * nc, nprd).astype(np.float32)
    return sd


GSIZE = 32   # Stanford GRU hidden (reference: 512; layout is dim-agnostic)


def fabricate_stanford_sd(rng):
    """Reference-layout state dict for RelModelStanford
    (rel_model_stanford.py:41-58): the shared detector/tower/union keys from
    fabricate_full_sd plus the message-passing head — unary projections, two
    torch nn.GRUCells (packed [3H, *] weights, dual biases), four
    Sequential(Linear, Sigmoid) gate fcs, and the obj/rel heads."""
    sd = fabricate_full_sd(rng)

    def lin(name, o, i, s=1.0):
        sd[f"{name}.weight"] = (rng.randn(o, i) * s / np.sqrt(i)).astype(np.float32)
        sd[f"{name}.bias"] = (rng.randn(o) * 0.05).astype(np.float32)

    lin("obj_unary", GSIZE, OBJ_DIM, s=2.0)
    lin("edge_unary", GSIZE, POOL_DIM, s=2.0)
    for gru in ("edge_gru", "node_gru"):
        sd[f"{gru}.weight_ih"] = (rng.randn(3 * GSIZE, GSIZE)
                                  / np.sqrt(GSIZE)).astype(np.float32)
        sd[f"{gru}.weight_hh"] = (rng.randn(3 * GSIZE, GSIZE)
                                  / np.sqrt(GSIZE)).astype(np.float32)
        sd[f"{gru}.bias_ih"] = (rng.randn(3 * GSIZE) * 0.1).astype(np.float32)
        sd[f"{gru}.bias_hh"] = (rng.randn(3 * GSIZE) * 0.1).astype(np.float32)
    for nm in ("sub_vert_w_fc", "obj_vert_w_fc", "out_edge_w_fc",
               "in_edge_w_fc"):
        lin(f"{nm}.0", 1, 2 * GSIZE, s=3.0)
    lin("obj_fc", NC, GSIZE, s=4.0)
    lin("rel_fc", NP, GSIZE, s=4.0)
    return sd


# ---------------------------------------------------------------------------
# Torch-side oracle pieces
# ---------------------------------------------------------------------------

def torch_vgg_features(sd, img_hwc):
    """VGG16 conv stack, last maxpool removed (object_detector.py:78-82,
    load_vgg at :623-633): conv3x3(pad 1)+relu per entry, maxpool2 at 'M'."""
    import torch
    import torch.nn.functional as F

    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512)
    x = torch.tensor(img_hwc.transpose(2, 0, 1)[None])  # NCHW
    ci = 0
    with torch.no_grad():
        for v in cfg:
            if v == "M":
                x = F.max_pool2d(x, 2, 2)
            else:
                idx = _VGG_IDX[ci]
                w = torch.tensor(sd[f"detector.features.{idx}.weight"])
                b = torch.tensor(sd[f"detector.features.{idx}.bias"])
                x = F.relu(F.conv2d(x, w, b, padding=1))
                ci += 1
    return x.numpy()[0].transpose(1, 2, 0)  # HWC


def oracle_roi_pool_flat(fmap_hwc, boxes):
    """RoIAlign 7x7 then torch-order (C,H,W) flatten per roi."""
    out = []
    for bx in boxes:
        p = np_crop_and_resize(fmap_hwc, bx, 7, 1.0 / 16)   # [7,7,C]
        out.append(p.transpose(2, 0, 1).reshape(-1))
    return np.stack(out)


def torch_union_conv(sd, masks):
    """Union mask conv net in eval mode (get_union_boxes.py:31-39):
    conv7x7/2 -> ReLU -> BN -> maxpool3/2 -> conv3x3 -> ReLU -> BN."""
    import torch
    import torch.nn.functional as F

    x = torch.tensor(masks)  # [P, 2, 27, 27]
    with torch.no_grad():
        x = F.conv2d(x, torch.tensor(sd["union_boxes.conv.0.weight"]),
                     torch.tensor(sd["union_boxes.conv.0.bias"]),
                     stride=2, padding=3)
        x = F.relu(x)
        x = F.batch_norm(x, torch.tensor(sd["union_boxes.conv.2.running_mean"]),
                         torch.tensor(sd["union_boxes.conv.2.running_var"]),
                         torch.tensor(sd["union_boxes.conv.2.weight"]),
                         torch.tensor(sd["union_boxes.conv.2.bias"]),
                         training=False)
        x = F.max_pool2d(x, 3, 2, padding=1)
        x = F.conv2d(x, torch.tensor(sd["union_boxes.conv.4.weight"]),
                     torch.tensor(sd["union_boxes.conv.4.bias"]), padding=1)
        x = F.relu(x)
        x = F.batch_norm(x, torch.tensor(sd["union_boxes.conv.6.running_mean"]),
                         torch.tensor(sd["union_boxes.conv.6.running_var"]),
                         torch.tensor(sd["union_boxes.conv.6.weight"]),
                         torch.tensor(sd["union_boxes.conv.6.bias"]),
                         training=False)
    return x.numpy()  # [P, 512, 7, 7]


def oracle_union_vr(sd, fmap, boxes, pairs):
    """Union visual features for the given pairs (visual_rep,
    rel_model.py:403-414): union-box RoIAlign + mask conv, through the union
    fc tower."""
    sub_b, obj_b = boxes[pairs[:, 0]], boxes[pairs[:, 1]]
    union = np.concatenate([np.minimum(sub_b[:, :2], obj_b[:, :2]),
                            np.maximum(sub_b[:, 2:], obj_b[:, 2:])], 1)
    upool = oracle_roi_pool_flat(fmap, union).reshape(-1, 512, 7, 7)
    masks = np_draw_union_boxes(
        np.concatenate([sub_b, obj_b], 1).astype(np.float32), 27) - 0.5
    uconv = torch_union_conv(sd, masks)
    u = (upool + uconv).reshape(len(pairs), -1)
    return ref.np_union_tower(sd, u, pooling_dim=POOL_DIM)


def oracle_sgcls_image(sd, img_hwc, boxes):
    """Full reference pipeline for one image (gtbox mode, eval): returns
    (obj_dists2, obj_preds, obj_scores, rel map {(s,o): rel_dists})."""
    fmap = torch_vgg_features(sd, img_hwc)

    # detector classification of GT rois (object_detector.py:299-303)
    det_pool = oracle_roi_pool_flat(fmap, boxes)
    det_feat = ref.np_obj_tower(
        {"roi_fmap_obj.0.weight": sd["detector.roi_fmap.0.weight"],
         "roi_fmap_obj.0.bias": sd["detector.roi_fmap.0.bias"],
         "roi_fmap_obj.3.weight": sd["detector.roi_fmap.3.weight"],
         "roi_fmap_obj.3.bias": sd["detector.roi_fmap.3.bias"]}, det_pool)
    obj_logits = ref.np_linear(det_feat, sd["detector.score_fc.weight"],
                               sd["detector.score_fc.bias"])

    # rel model obj tower (rel_model.py:439-448)
    obj_fmap = ref.np_obj_tower(sd, det_pool)

    obj_dists2, obj_preds, edge_ctx = ref.np_context_sgcls(
        sd, obj_fmap, obj_logits, boxes, None, order="leftright",
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, hidden_dim=HID, obj_dim=OBJ_DIM,
        embed_dim=EMBED_DIM)

    # all ordered pairs (get_rel_inds eval, rel_model.py:420-437)
    n = len(boxes)
    pairs = np.array([(i, j) for i in range(n) for j in range(n) if i != j])
    vr = oracle_union_vr(sd, fmap, boxes, pairs)

    rel_dists = ref.np_rel_head(sd, edge_ctx, obj_preds, pairs, vr,
                                pooling_dim=POOL_DIM, num_classes=NC,
                                use_vision=True, limit_vision=False,
                                use_tanh=False, use_bias=True)
    obj_scores = ref.np_softmax(obj_dists2, -1)[np.arange(n), obj_preds]
    relmap = {(int(s), int(o)): rel_dists[k]
              for k, (s, o) in enumerate(pairs)}
    return obj_dists2, obj_preds, obj_scores, relmap


def test_relmodel_sgcls_end_to_end_parity(rng):
    sd = fabricate_full_sd(rng)

    b = 2
    valid_counts = (4, 3)
    images = np.zeros((b, IM, IM, 3), np.float32)
    images[:] = (rng.randn(b, IM, IM, 3) * 0.4).astype(np.float32)
    gt_boxes = np.zeros((b, G, 4), np.float32)
    gt_classes = np.zeros((b, G), np.int32)
    gt_mask = np.zeros((b, G), bool)
    for i, n in enumerate(valid_counts):
        xy = rng.uniform(0, IM * 0.5, (n, 2))
        wh = rng.uniform(12, IM * 0.45, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        gt_classes[i, :n] = rng.randint(1, NC, n)
        gt_mask[i, :n] = True
    im_hw = np.full((b, 2), float(IM), np.float32)

    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8, rels_per_img=16,
                           max_pairs_eval=G * (G - 1))
    r7 = np.random.RandomState(7)
    model = RelModel(
        num_classes=NC, num_rels=NP, mode="sgcls", budgets=budgets,
        dtype=jnp.float32, hidden_dim=HID, pooling_dim=POOL_DIM,
        obj_dim=OBJ_DIM, embed_dim=EMBED_DIM, nl_obj=NL_OBJ, nl_edge=NL_EDGE,
        order="leftright", use_bias=True, use_tanh=False, limit_vision=False,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False,
        embed_vecs=r7.randn(NC, EMBED_DIM).astype(np.float32),
        decoder_embed_vecs=r7.randn(NC + 1, 100).astype(np.float32),
        freq_table=r7.randn(NC * NC, NP).astype(np.float32))

    kw = dict(images=jnp.asarray(images), im_hw=jnp.asarray(im_hw),
              gt_boxes=jnp.asarray(gt_boxes),
              gt_classes=jnp.asarray(gt_classes), gt_mask=jnp.asarray(gt_mask),
              gt_rels=jnp.zeros((b, 8, 3), jnp.int32),
              gt_rel_mask=jnp.zeros((b, 8), bool))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, train=True, **kw)

    imported, imported_stats = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, pooling_dim=POOL_DIM,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    # strict: every imported leaf must land (a silent shape mismatch would
    # leave random-init weights and void the parity claim)
    from flax.traverse_util import flatten_dict
    tgt = flatten_dict(variables["params"], sep="/")
    # gtbox mode never calls the RPN head or bbox_fc, so those imported
    # leaves have no targets — everything else must land exactly
    unused = ("detector/rpn_head/", "detector/bbox_fc/")
    for k, v in flatten_dict(imported, sep="/").items():
        if k.startswith(unused):
            continue
        assert k in tgt and tuple(np.shape(v)) == tuple(tgt[k].shape), \
            f"importer leaf {k} {np.shape(v)} does not land on model tree"
    params = optimistic_restore(variables["params"], imported, verbose=False)
    batch_stats = optimistic_restore(variables["batch_stats"], imported_stats,
                                     verbose=False)

    pred = model.apply({"params": params, "batch_stats": batch_stats},
                       train=False, rngs={"sample": jax.random.PRNGKey(0)},
                       **kw)

    for i in range(b):
        n = valid_counts[i]
        exp_dists, exp_preds, exp_scores, exp_rel = oracle_sgcls_image(
            sd, images[i], gt_boxes[i, :n])
        np.testing.assert_array_equal(np.asarray(pred.obj_classes)[i, :n],
                                      exp_preds)
        np.testing.assert_allclose(np.asarray(pred.obj_scores)[i, :n],
                                   exp_scores, rtol=1e-3, atol=1e-4)
        # reconstruct per-pair rel dists from the sorted prediction
        rinds = np.asarray(pred.rel_inds)[i]
        rscores = np.asarray(pred.rel_scores)[i]
        rvalid = np.asarray(pred.rel_valid)[i]
        got = {(int(s), int(o)): rscores[k]
               for k, (s, o) in enumerate(rinds) if rvalid[k]}
        assert set(got) == set(exp_rel), "pair sets differ"
        for so, dists in exp_rel.items():
            np.testing.assert_allclose(got[so], ref.np_softmax(dists, -1),
                                       rtol=2e-3, atol=2e-4,
                                       err_msg=f"pair {so}")
        # triplet-score sort sanity (surgery.py:21-59)
        max_rel = rscores[rvalid][:, 1:].max(-1)
        oscore = np.asarray(pred.obj_scores)[i]
        trip = max_rel * oscore[rinds[rvalid][:, 0]] * oscore[rinds[rvalid][:, 1]]
        assert np.all(np.diff(trip) <= 1e-6)


# ---------------------------------------------------------------------------
# SGDet detector-path oracle: RPN -> proposal NMS -> RoI scoring ->
# per-class NMS -> top-K  (lib/object_detector.py:560-612, 363-485)
# ---------------------------------------------------------------------------

def np_point_form(cs):
    """box_utils.py:67-78 incl. the xmax = cx + 0.5*(w - 2) quirk."""
    return np.concatenate([cs[..., :2] - 0.5 * cs[..., 2:],
                           cs[..., :2] + 0.5 * (cs[..., 2:] - 2.0)], -1)


def np_bbox_preds(boxes, deltas):
    """box_utils.py:28-48."""
    pc = ref.np_center_size(boxes)
    xys = pc[..., :2] + pc[..., 2:] * deltas[..., :2]
    whs = np.exp(deltas[..., 2:]) * pc[..., 2:]
    return np_point_form(np.concatenate([xys, whs], -1))


def np_iou_plus1(a, b):
    """Pairwise IoU with the +1 area convention (bbox.pyx:41-59)."""
    iw = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0]) + 1).clip(min=0)
    ih = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1]) + 1).clip(min=0)
    inter = iw * ih
    area = lambda x: (x[:, 2] - x[:, 0] + 1) * (x[:, 3] - x[:, 1] + 1)
    return inter / (area(a)[:, None] + area(b)[None] - inter)


def np_greedy_nms(boxes, scores, thresh, pre_topn, post_topn):
    """apply_nms semantics: sort desc, greedy suppress IoU > thresh, keep
    up to post_topn; returns indices into the input order."""
    order = np.argsort(-scores, kind="mergesort")[:pre_topn]
    iou = np_iou_plus1(boxes[order], boxes[order])
    keep = []
    alive = np.ones(len(order), bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        if len(keep) >= post_topn:
            break
        alive &= ~(iou[i] > thresh)
        alive[i] = False
    return np.array(keep, np.int64)


def np_relu6(x):
    return np.clip(x, 0.0, 6.0)


def oracle_rpn_proposals(sd, fmap_hwc, im_h, im_w, post_topn):
    """RPNHead.roi_proposals (object_detector.py:503-508, 560-597)."""
    import torch
    import torch.nn.functional as F

    from neural_motifs_tpu.ops.anchors import generate_anchors

    x = torch.tensor(fmap_hwc.transpose(2, 0, 1)[None])
    with torch.no_grad():
        x = F.conv2d(x, torch.tensor(sd["detector.rpn_head.conv.0.weight"]),
                     torch.tensor(sd["detector.rpn_head.conv.0.bias"]),
                     padding=1)
        x = torch.clamp(x, 0.0, 6.0)                      # ReLU6
        x = F.conv2d(x, torch.tensor(sd["detector.rpn_head.conv.2.weight"]),
                     torch.tensor(sd["detector.rpn_head.conv.2.bias"]))
    h, w = x.shape[2], x.shape[3]
    feats = x.numpy()[0].transpose(1, 2, 0).reshape(h, w, 20, 6)

    cls_logits = feats[..., :2]
    probs = ref.np_softmax(cls_logits, -1)[..., 1]
    anchors = np.asarray(generate_anchors(im_scale=(h * 16, w * 16)))  # [h,w,20,4]
    boxes = np_bbox_preds(anchors.reshape(-1, 4),
                          feats[..., 2:].reshape(-1, 4))
    probs = probs.reshape(h, w, 20).copy()
    h_end, w_end = int(im_h) // 16, int(im_w) // 16
    if h_end < h:
        probs[h_end:] = -0.01
    if w_end < w:
        probs[:, w_end:] = -0.01
    probs = probs.reshape(-1)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, im_w - 1)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, im_h - 1)
    sizes = ref.np_center_size(boxes)
    probs[(sizes[:, 2] < 4) | (sizes[:, 3] < 4)] = -0.01
    keep = np_greedy_nms(boxes, probs, 0.7, len(probs), post_topn)
    return boxes[keep]


def oracle_filter_det(probs, boxes_all, max_per_img, thresh):
    """filter_det (object_detector.py:425-485), nms_filter_duplicates=True.
    Returns (roi_idx, scores, labels) sorted by score desc."""
    n, nc = probs.shape
    nms_mask = np.zeros_like(probs)
    for c in range(1, nc):
        if probs[:, c].max() <= thresh:
            continue
        keep = np_greedy_nms(boxes_all[:, c], probs[:, c], 0.3, 6000, 300)
        nms_mask[keep, c] = 1.0
    dists = nms_mask * probs
    scores_pre = dists.max(1)
    labels_pre = dists.argmax(1)
    inds_all = np.nonzero(scores_pre)[0]
    order = np.argsort(-scores_pre[inds_all], kind="mergesort")
    order = order[scores_pre[inds_all][order] > thresh][:max_per_img]
    sel = inds_all[order]
    return sel, scores_pre[sel], labels_pre[sel]


import pytest


@pytest.mark.parametrize("im_h,im_w", [(IM, IM), (64, IM)])
def test_detector_sgdet_end_to_end_parity(rng, im_h, im_w):
    """Full refinerels detector chain from a raw image vs the reference
    oracle: RPN conv + ReLU6 + anchor decode + border/size filters +
    proposal NMS@0.7, RoI scoring, per-class box decode + clip, per-class
    NMS@0.3 + duplicate filtering + top-K, and the class-0-prior convention
    of boxes_all.

    The (64, 96) case drives the rectangular image budget (aspect-bucketed
    serving): the oracle always computes on the exact-size image (the
    reference evals with b=1 image-sized blobs, dataloaders/blob.py), so
    parity here proves the rect-budget path — rect anchor grid, rect
    feature map, axis-wise clipping — reproduces the reference chain."""
    from neural_motifs_tpu.models.detector import ObjectDetector

    sd = fabricate_full_sd(rng)
    post, max_det = 16, 8
    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8,
                           rpn_pre_nms_topn_test=720,
                           rpn_post_nms_topn_test=post)
    det = ObjectDetector(num_classes=NC, mode="refinerels", thresh=0.01,
                         max_per_img=max_det, dtype=jnp.float32,
                         obj_dim=OBJ_DIM, budgets=budgets)
    image = (rng.randn(im_h, im_w, 3) * 0.4).astype(np.float32)
    kw = dict(images=jnp.asarray(image[None]),
              im_hw=jnp.asarray([[float(im_h), float(im_w)]]))
    init_kw = dict(kw, gt_boxes=jnp.zeros((1, G, 4)),
                   gt_classes=jnp.zeros((1, G), jnp.int32),
                   gt_mask=jnp.zeros((1, G), bool))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = det.init(rngs, train=True, **init_kw)

    imported, _ = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, pooling_dim=POOL_DIM,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    params = optimistic_restore(variables["params"], imported["detector"],
                                verbose=False)
    out = det.apply({"params": params}, train=False, rngs=rngs, **kw)

    # ---- oracle ----
    fmap = torch_vgg_features(sd, image)
    props = oracle_rpn_proposals(sd, fmap, im_h, im_w, post)
    pool = oracle_roi_pool_flat(fmap, props)
    feat = ref.np_obj_tower(
        {"roi_fmap_obj.0.weight": sd["detector.roi_fmap.0.weight"],
         "roi_fmap_obj.0.bias": sd["detector.roi_fmap.0.bias"],
         "roi_fmap_obj.3.weight": sd["detector.roi_fmap.3.weight"],
         "roi_fmap_obj.3.bias": sd["detector.roi_fmap.3.bias"]}, pool)
    logits = ref.np_linear(feat, sd["detector.score_fc.weight"],
                           sd["detector.score_fc.bias"])
    deltas = ref.np_linear(feat, sd["detector.bbox_fc.weight"],
                           sd["detector.bbox_fc.bias"]).reshape(-1, NC, 4)
    probs = ref.np_softmax(logits, -1)
    boxes_all = np_bbox_preds(np.repeat(props[:, None], NC, 1), deltas)
    boxes_all[..., [0, 2]] = boxes_all[..., [0, 2]].clip(0, im_w - 1)
    boxes_all[..., [1, 3]] = boxes_all[..., [1, 3]].clip(0, im_h - 1)
    sel, exp_scores, exp_labels = oracle_filter_det(probs, boxes_all,
                                                    max_det, 0.01)

    # ---- compare ----
    got_valid = np.asarray(out.rm_valid)[0]
    n_kept = int(got_valid.sum())
    assert n_kept == len(sel), f"kept {n_kept} vs oracle {len(sel)}"
    assert n_kept >= 3, "degenerate test: too few detections to be meaningful"
    np.testing.assert_array_equal(np.asarray(out.obj_preds)[0, :n_kept],
                                  exp_labels)
    np.testing.assert_allclose(np.asarray(out.obj_scores)[0, :n_kept],
                               exp_scores, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rm_boxes)[0, :n_kept],
                               props[sel], rtol=1e-3, atol=0.15)
    got_ba = np.asarray(out.boxes_all)[0, :n_kept]
    # class-0 slot carries the prior (object_detector.py:407)
    np.testing.assert_allclose(got_ba[:, 0], props[sel], rtol=1e-3, atol=0.15)
    np.testing.assert_allclose(got_ba[:, 1:], boxes_all[sel][:, 1:],
                               rtol=2e-3, atol=0.3)


# ---------------------------------------------------------------------------
# Stanford message-passing model e2e (VERDICT r2 #2): full RelModelStanford
# (sgcls, eval) vs the oracle composition of the reference pipeline
# (rel_model_stanford.py:60-107 message_pass + :162-204 decode) sharing only
# a fabricated reference-layout state dict through the real importer.
# ---------------------------------------------------------------------------

def make_stanford_sd(rng):
    """fabricate_stanford_sd minus the MotifNet-only keys the reference
    deletes in __init__ (rel_model_stanford.py:38-40: del context,
    post_lstm, post_emb) — mirrors the real vgrel-stanford checkpoint
    layout so the strict leaf-landing check below is meaningful."""
    sd = fabricate_stanford_sd(rng)
    for k in [k for k in sd
              if k.startswith("context.") or k.startswith("post_lstm.")
              or k.startswith("rel_compress.") or k.startswith("freq_bias.")]:
        del sd[k]
    return sd


def oracle_stanford_sgcls_image(sd, img_hwc, boxes, n_iter=3):
    """Reference Stanford pipeline for one image (gtbox mode, eval):
    visual_rep over all ordered pairs -> relu(edge_unary) / obj_unary ->
    message_pass -> sgcls decode (rel_model_stanford.py:149-160, :185-190).
    Returns (obj_preds, obj_scores, {(s, o): rel_dists})."""
    fmap = torch_vgg_features(sd, img_hwc)
    n = len(boxes)
    pairs = np.array([(i, j) for i in range(n) for j in range(n) if i != j])
    vr = oracle_union_vr(sd, fmap, boxes, pairs)

    det_pool = oracle_roi_pool_flat(fmap, boxes)
    obj_fmap = ref.np_obj_tower(sd, det_pool)

    rel_rep = np.maximum(ref.np_linear(vr, sd["edge_unary.weight"],
                                       sd["edge_unary.bias"]), 0.0)
    obj_rep = ref.np_linear(obj_fmap, sd["obj_unary.weight"],
                            sd["obj_unary.bias"])
    obj_dists, rel_dists = ref.np_stanford_message_pass(
        sd, rel_rep, obj_rep, pairs, n_iter=n_iter)

    probs = ref.np_softmax(obj_dists, -1)
    obj_preds = probs[:, 1:].argmax(-1) + 1          # :186-190 (sgcls branch)
    obj_scores = probs[:, 1:].max(-1)
    relmap = {(int(s), int(o)): rel_dists[k] for k, (s, o) in enumerate(pairs)}
    return obj_preds, obj_scores, relmap


def build_stanford(mode):
    from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford

    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8, rels_per_img=16,
                           objs_per_img=G, max_pairs_eval=G * (G - 1))
    return RelModelStanford(
        num_classes=NC, num_rels=NP, mode=mode, obj_dim=OBJ_DIM,
        pooling_dim=POOL_DIM, size=GSIZE, dtype=jnp.float32, budgets=budgets)


def import_stanford(model, variables, sd):
    imported, imported_stats = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=0, nl_edge=0, pooling_dim=POOL_DIM,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    from flax.traverse_util import flatten_dict
    tgt = flatten_dict(variables["params"], sep="/")
    unused = ("detector/rpn_head/", "detector/bbox_fc/")
    for k, v in flatten_dict(imported, sep="/").items():
        if model.mode != "sgdet" and k.startswith(unused):
            continue
        assert k in tgt and tuple(np.shape(v)) == tuple(tgt[k].shape), \
            f"importer leaf {k} {np.shape(v)} does not land on model tree"
    params = optimistic_restore(variables["params"], imported, verbose=False)
    batch_stats = optimistic_restore(variables["batch_stats"], imported_stats,
                                     verbose=False)
    return {"params": params, "batch_stats": batch_stats}


def test_stanford_sgcls_end_to_end_parity(rng):
    sd = make_stanford_sd(rng)

    b = 2
    valid_counts = (4, 3)
    images = (rng.randn(b, IM, IM, 3) * 0.4).astype(np.float32)
    gt_boxes = np.zeros((b, G, 4), np.float32)
    gt_classes = np.zeros((b, G), np.int32)
    gt_mask = np.zeros((b, G), bool)
    for i, n in enumerate(valid_counts):
        xy = rng.uniform(0, IM * 0.5, (n, 2))
        wh = rng.uniform(12, IM * 0.45, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        gt_classes[i, :n] = rng.randint(1, NC, n)
        gt_mask[i, :n] = True
    im_hw = np.full((b, 2), float(IM), np.float32)

    model = build_stanford("sgcls")
    kw = dict(images=jnp.asarray(images), im_hw=jnp.asarray(im_hw),
              gt_boxes=jnp.asarray(gt_boxes),
              gt_classes=jnp.asarray(gt_classes), gt_mask=jnp.asarray(gt_mask),
              gt_rels=jnp.zeros((b, 8, 3), jnp.int32),
              gt_rel_mask=jnp.zeros((b, 8), bool))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, train=True, **kw)
    restored = import_stanford(model, variables, sd)

    pred = model.apply(restored, train=False,
                       rngs={"sample": jax.random.PRNGKey(0)}, **kw)

    for i in range(b):
        n = valid_counts[i]
        exp_preds, exp_scores, exp_rel = oracle_stanford_sgcls_image(
            sd, images[i], gt_boxes[i, :n])
        np.testing.assert_array_equal(np.asarray(pred.obj_classes)[i, :n],
                                      exp_preds)
        np.testing.assert_allclose(np.asarray(pred.obj_scores)[i, :n],
                                   exp_scores, rtol=1e-3, atol=1e-4)
        rinds = np.asarray(pred.rel_inds)[i]
        rscores = np.asarray(pred.rel_scores)[i]
        rvalid = np.asarray(pred.rel_valid)[i]
        got = {(int(s), int(o)): rscores[k]
               for k, (s, o) in enumerate(rinds) if rvalid[k]}
        assert set(got) == set(exp_rel), "pair sets differ"
        for so, dists in exp_rel.items():
            np.testing.assert_allclose(got[so], ref.np_softmax(dists, -1),
                                       rtol=2e-3, atol=2e-4,
                                       err_msg=f"pair {so}")
        # triplet sort (rel_model_stanford.py:204 -> surgery.filter_dets)
        max_rel = rscores[rvalid][:, 1:].max(-1)
        oscore = np.asarray(pred.obj_scores)[i]
        trip = max_rel * oscore[rinds[rvalid][:, 0]] * oscore[rinds[rvalid][:, 1]]
        assert np.all(np.diff(trip) <= 1e-6)

    # sensitivity: swapping the out/in edge gates (the exact silent-swap
    # failure mode VERDICT r2 flags) must break rel-dist parity
    sd_swap = dict(sd)
    for suf in ("weight", "bias"):
        sd_swap[f"out_edge_w_fc.0.{suf}"] = sd[f"in_edge_w_fc.0.{suf}"]
        sd_swap[f"in_edge_w_fc.0.{suf}"] = sd[f"out_edge_w_fc.0.{suf}"]
    pred_sw = model.apply(import_stanford(model, variables, sd_swap),
                          train=False, rngs={"sample": jax.random.PRNGKey(0)},
                          **kw)
    n = valid_counts[0]
    exp_preds, _, exp_rel = oracle_stanford_sgcls_image(
        sd, images[0], gt_boxes[0, :n])
    rinds = np.asarray(pred_sw.rel_inds)[0]
    rscores = np.asarray(pred_sw.rel_scores)[0]
    rvalid = np.asarray(pred_sw.rel_valid)[0]
    got_sw = {(int(s), int(o)): rscores[k]
              for k, (s, o) in enumerate(rinds) if rvalid[k]}
    diffs = [np.abs(got_sw[so] - ref.np_softmax(d, -1)).max()
             for so, d in exp_rel.items()]
    assert max(diffs) > 1e-3, "gate swap undetected — test has no power"


def test_stanford_sgdet_end_to_end_parity(rng):
    """Full Stanford sgdet chain from a raw image: refinerels detector ->
    overlap-gated pairs -> message passing -> filter_det-style decode with
    boxes_all box selection (rel_model_stanford.py:168-204)."""
    im_h = im_w = IM
    sd = make_stanford_sd(rng)

    post, max_det = 16, G
    budgets = C.PadBudgets(max_gt_boxes=G, max_gt_rels=8, rels_per_img=16,
                           objs_per_img=max_det, max_pairs_eval=G * (G - 1),
                           rpn_pre_nms_topn_test=720,
                           rpn_post_nms_topn_test=post)
    from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
    model = RelModelStanford(
        num_classes=NC, num_rels=NP, mode="sgdet", obj_dim=OBJ_DIM,
        pooling_dim=POOL_DIM, size=GSIZE, dtype=jnp.float32, budgets=budgets,
        thresh=0.01)

    image = (rng.randn(im_h, im_w, 3) * 0.4).astype(np.float32)
    kw = dict(images=jnp.asarray(image[None]),
              im_hw=jnp.asarray([[float(im_h), float(im_w)]]))
    init_kw = dict(kw, gt_boxes=jnp.zeros((1, G, 4)),
                   gt_classes=jnp.zeros((1, G), jnp.int32),
                   gt_mask=jnp.zeros((1, G), bool),
                   gt_rels=jnp.zeros((1, 8, 3), jnp.int32),
                   gt_rel_mask=jnp.zeros((1, 8), bool))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, train=True, **init_kw)
    restored = import_stanford(model, variables, sd)
    pred = model.apply(restored, train=False,
                       rngs={"sample": jax.random.PRNGKey(0)}, **kw)

    # ---- oracle: detector chain (reused from the MotifNet sgdet test) ----
    fmap = torch_vgg_features(sd, image)
    props = oracle_rpn_proposals(sd, fmap, im_h, im_w, post)
    pool = oracle_roi_pool_flat(fmap, props)
    feat = ref.np_obj_tower(
        {"roi_fmap_obj.0.weight": sd["detector.roi_fmap.0.weight"],
         "roi_fmap_obj.0.bias": sd["detector.roi_fmap.0.bias"],
         "roi_fmap_obj.3.weight": sd["detector.roi_fmap.3.weight"],
         "roi_fmap_obj.3.bias": sd["detector.roi_fmap.3.bias"]}, pool)
    logits = ref.np_linear(feat, sd["detector.score_fc.weight"],
                           sd["detector.score_fc.bias"])
    deltas = ref.np_linear(feat, sd["detector.bbox_fc.weight"],
                           sd["detector.bbox_fc.bias"]).reshape(-1, NC, 4)
    probs = ref.np_softmax(logits, -1)
    boxes_all = np_bbox_preds(np.repeat(props[:, None], NC, 1), deltas)
    boxes_all[..., [0, 2]] = boxes_all[..., [0, 2]].clip(0, im_w - 1)
    boxes_all[..., [1, 3]] = boxes_all[..., [1, 3]].clip(0, im_h - 1)
    sel, _, _ = oracle_filter_det(probs, boxes_all, max_det, 0.01)
    boxes = props[sel]
    ba = boxes_all[sel].copy()
    ba[:, 0] = boxes                            # class-0 slot = prior
    n = len(sel)
    assert n >= 3, "degenerate test: too few detections"

    # overlap-gated pairs (rel_model.py:420-437 via get_rel_inds)
    iou = np_iou_plus1(boxes, boxes)
    pairs = np.array([(i, j) for i in range(n) for j in range(n)
                      if i != j and iou[i, j] > 0])
    assert len(pairs) >= 2, "degenerate test: no overlapping pairs"

    vr = oracle_union_vr(sd, fmap, boxes, pairs)
    obj_fmap = ref.np_obj_tower(sd, oracle_roi_pool_flat(fmap, boxes))
    rel_rep = np.maximum(ref.np_linear(vr, sd["edge_unary.weight"],
                                       sd["edge_unary.bias"]), 0.0)
    obj_rep = ref.np_linear(obj_fmap, sd["obj_unary.weight"],
                            sd["obj_unary.bias"])
    obj_dists, rel_dists = ref.np_stanford_message_pass(
        sd, rel_rep, obj_rep, pairs)

    # sgdet decode (rel_model_stanford.py:168-184): filter_det @ thresh 0,
    # nms 0.3; unkept rois get score 0 / pred 1
    dprobs = ref.np_softmax(obj_dists, -1)
    dsel, dscores, dlabels = oracle_filter_det(dprobs, ba, 100, 0.0)
    exp_scores = np.zeros(n)
    exp_preds = np.ones(n, np.int64)
    exp_scores[dsel] = dscores
    exp_preds[dsel] = dlabels
    exp_boxes = ba[np.arange(n), exp_preds]

    got_valid = np.asarray(pred.obj_valid)[0]
    n_kept = int(got_valid.sum())
    assert n_kept == n
    np.testing.assert_array_equal(np.asarray(pred.obj_classes)[0, :n],
                                  exp_preds)
    np.testing.assert_allclose(np.asarray(pred.obj_scores)[0, :n],
                               exp_scores, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred.boxes)[0, :n], exp_boxes,
                               rtol=2e-3, atol=0.3)

    rinds = np.asarray(pred.rel_inds)[0]
    rscores = np.asarray(pred.rel_scores)[0]
    rvalid = np.asarray(pred.rel_valid)[0]
    got = {(int(s), int(o)): rscores[k]
           for k, (s, o) in enumerate(rinds) if rvalid[k]}
    exp_rel = {(int(s), int(o)): rel_dists[k]
               for k, (s, o) in enumerate(pairs)}
    assert set(got) == set(exp_rel), "overlap-gated pair sets differ"
    for so, dists in exp_rel.items():
        np.testing.assert_allclose(got[so], ref.np_softmax(dists, -1),
                                   rtol=2e-3, atol=2e-4, err_msg=f"pair {so}")
