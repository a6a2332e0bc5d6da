"""Stage-level timing of the SGDet eval forward on the attached TPU.

Times three nested prefixes of the pipeline at the bench config
(batch NM_BENCH_BATCH, full VG scale), so the per-stage cost is the delta:

  detector : VGG conv + RPN + proposal NMS + RoI head + per-class NMS
             + top-64 selection (models/detector.py, refinerels path)
  context  : + obj RoIAlign/fc tower + LinearizedContext (obj LSTM,
             DecoderRNN greedy + leave-one-out NMS decode, edge LSTM)
  full     : + pair enumeration, union RoIAlign + mask conv, union fc
             tower, rel head + freq bias, triplet sort (RelModel.decode)

Usage: python tools/bench_eval_stages.py [iters]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.ops.roi_align import roi_align

    sys.path.insert(0, str(REPO))
    import bench as bench_mod

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(os.environ.get("NM_BENCH_BATCH", "8"))

    # reuse bench.py's exact model + input construction
    os.environ.setdefault("NM_BENCH_BATCH", str(batch))
    # --- replicate bench.main()'s setup without the timing loop ---
    from neural_motifs_tpu.models.rel_model import RelModel

    budgets = C.PadBudgets()
    rng = np.random.RandomState(0)
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    model = RelModel(
        num_classes=nc, num_rels=npred, mode="sgdet", budgets=budgets,
        dtype=jnp.bfloat16, hidden_dim=512, pooling_dim=4096, obj_dim=4096,
        embed_dim=200, nl_obj=2, nl_edge=4, order="leftright", use_bias=True,
        use_tanh=False, limit_vision=False, thresh=0.05,
        embed_vecs=rng.randn(nc, 200).astype(np.float32) * 0.1,
        decoder_embed_vecs=rng.randn(nc + 1, 100).astype(np.float32) * 0.1,
        freq_table=rng.randn(nc * nc, npred).astype(np.float32) * 0.1)

    g, r = budgets.max_gt_boxes, budgets.max_gt_rels
    im = C.IM_SCALE
    images = rng.randn(batch, im, im, 3).astype(np.float32) * 0.3
    im_hw = np.full((batch, 2), float(im), np.float32)
    gt_boxes = np.zeros((batch, g, 4), np.float32)
    gt_classes = np.zeros((batch, g), np.int32)
    gt_mask = np.zeros((batch, g), bool)
    gt_rels = np.zeros((batch, r, 3), np.int32)
    gt_rel_mask = np.zeros((batch, r), bool)
    for i in range(batch):
        n = 12
        xy = rng.uniform(0, im * 0.6, (n, 2))
        wh = rng.uniform(30, im * 0.35, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, im - 1)], 1)
        gt_classes[i, :n] = rng.randint(1, nc, n)
        gt_mask[i, :n] = True

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    t0 = time.time()
    variables = jax.jit(lambda rr: model.init(
        rr, train=True, images=jnp.asarray(images), im_hw=jnp.asarray(im_hw),
        gt_boxes=jnp.asarray(gt_boxes), gt_classes=jnp.asarray(gt_classes),
        gt_mask=jnp.asarray(gt_mask), gt_rels=jnp.asarray(gt_rels),
        gt_rel_mask=jnp.asarray(gt_rel_mask)))(rngs)
    print(f"# init {time.time() - t0:.1f}s", flush=True)
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}

    from neural_motifs_tpu.models.detector import rpn_proposals

    def fmap_only(m, images, im_hw, train=False):
        return m.detector.feature_map(images)

    def thru_rpn(m, images, im_hw, train=False):
        d = m.detector
        fmap = d.feature_map(images)
        from neural_motifs_tpu.ops.anchors import generate_anchors
        anchors = jnp.asarray(generate_anchors(im_scale=images.shape[1]))
        rpn_feats = d.rpn_head(fmap)
        rois, roi_valid = rpn_proposals(
            rpn_feats, anchors, im_hw, d.budgets.rpn_pre_nms_topn_test,
            d.budgets.rpn_post_nms_topn_test)
        return rois, roi_valid

    def thru_roihead(m, images, im_hw, train=False):
        d = m.detector
        fmap = d.feature_map(images)
        from neural_motifs_tpu.ops.anchors import generate_anchors
        anchors = jnp.asarray(generate_anchors(im_scale=images.shape[1]))
        rpn_feats = d.rpn_head(fmap)
        rois, roi_valid = rpn_proposals(
            rpn_feats, anchors, im_hw, d.budgets.rpn_pre_nms_topn_test,
            d.budgets.rpn_post_nms_topn_test)
        obj_fmap = d.obj_feature_map(fmap, rois, roi_valid, False)
        return d.score_fc(obj_fmap), d.bbox_fc(obj_fmap)

    def det_only(m, images, im_hw, train=False):
        det = m.detector(images, im_hw, train=False)
        return det.rm_boxes, det.rm_obj_dists, det.rm_valid

    def thru_context(m, images, im_hw, train=False):
        det = m.detector(images, im_hw, train=False)
        boxes, valid = det.rm_boxes, det.rm_valid
        pooled = roi_align(det.fmap, boxes, valid, 7, 1.0 / C.FEAT_STRIDE)
        obj_fmap = m.roi_fmap_obj(pooled, train=False).astype(jnp.float32)
        ctx = m.context(obj_fmap, det.rm_obj_dists, boxes, valid,
                        obj_labels=None, boxes_per_cls=det.boxes_all,
                        train=False)
        return ctx.obj_dists, ctx.obj_preds

    def full(m, images, im_hw, train=False):
        return m(images, im_hw, train=False)

    dimg = jax.device_put(jnp.asarray(images))
    dhw = jax.device_put(jnp.asarray(im_hw))
    results = {}
    for name, fn in [("fmap", fmap_only), ("rpn", thru_rpn),
                     ("roihead", thru_roihead), ("detector", det_only),
                     ("context", thru_context), ("full", full)]:
        jf = jax.jit(lambda v, a, b, fn=fn: model.apply(
            v, a, b, train=False, method=fn,
            rngs={"sample": jax.random.PRNGKey(0)}))
        t0 = time.time()
        out = jf(vars_, dimg, dhw)
        first = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(first.astype(jnp.float32)))
        print(f"# {name}: compile+first {time.time() - t0:.1f}s", flush=True)
        times = []
        for _i in range(iters):
            t0 = time.time()
            out = jf(vars_, dimg, dhw)
            first = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.sum(first.astype(jnp.float32)))
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        results[name] = med
        print(f"{name:10s} {med * 1000:7.1f} ms/batch "
              f"({batch / med:6.1f} img/s)", flush=True)

    r = results
    print(f"\nstage deltas @batch {batch}:")
    print(f"  vgg conv (fmap)  : {r['fmap'] * 1000:7.1f} ms")
    print(f"  rpn+proposal NMS : {(r['rpn'] - r['fmap']) * 1000:7.1f} ms")
    print(f"  roi fc head      : {(r['roihead'] - r['rpn']) * 1000:7.1f} ms")
    print(f"  per-class NMS+sel: {(r['detector'] - r['roihead']) * 1000:7.1f} ms")
    print(f"  context stage    : {(r['context'] - r['detector']) * 1000:7.1f} ms  (obj fc + LSTMs + decoder)")
    print(f"  relation stage   : {(r['full'] - r['context']) * 1000:7.1f} ms  (pairs/unions/rel head/sort)")


if __name__ == "__main__":
    main()
