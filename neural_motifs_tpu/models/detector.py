"""Object detector: VGG16 backbone + single-level RPN + RoI heads + on-device
per-class NMS decode. TPU re-design of reference lib/object_detector.py.

Everything is [B, S, ...] padded + masked; there is no image-offset
arithmetic and no host round-trip anywhere in the step. The four box-source
modes of the reference (object_detector.py:50-55) map to:

  * 'rpntrain'   — RPN proposals -> proposal_assign_det sampling (training
                   the detector itself)
  * 'gtbox'      — GT boxes as RoIs (predcls/sgcls); rel sampling in-graph
  * 'refinerels' — RPN proposals -> per-class NMS -> top-64 objects (sgdet
                   rel training / inference)
  * 'proposals'  — like refinerels but from precomputed proposal boxes
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.backbone import VGG16Features, VGGRoIHead
from neural_motifs_tpu.ops import boxes as box_ops
from neural_motifs_tpu.ops.anchors import generate_anchors
from neural_motifs_tpu.ops.nms import nms_topk, per_class_nms_mask
from neural_motifs_tpu.ops.roi_align import roi_align
from neural_motifs_tpu.ops.sampling import (anchor_targets, assign_labels_by_iou,
                                            proposal_assign_det, rel_assign_gtbox)

Array = jax.Array

MODES = ("rpntrain", "gtbox", "refinerels", "proposals")


class DetectorOutput(NamedTuple):
    """Per-image padded equivalent of the reference Result container
    (object_detector.py:22-37); od_* = pre-NMS head outputs over sampled
    RoIs, rm_* = the object set handed to the relation model."""

    fmap: Array                       # [B, 37, 37, 512]
    # pre-NMS (sampled RoI) head outputs
    od_rois: Array                    # [B, S, 4]
    od_valid: Array                   # [B, S]
    od_obj_dists: Array               # [B, S, NC] logits
    od_box_deltas: Optional[Array]    # [B, S, NC, 4]
    od_labels: Optional[Array]        # [B, S] sampled labels (train)
    od_box_targets: Optional[Array]   # [B, S, 4]
    # RPN training targets (dense grid)
    rpn_feats: Optional[Array]        # [B, 37, 37, A, 6]
    rpn_labels: Optional[Array]       # [B, 37, 37, A] {-1,0,1}
    rpn_target_boxes: Optional[Array] # [B, 37, 37, A, 4]
    anchors: Optional[Array]          # [37, 37, A, 4] constant grid
    # object set for the relation model
    rm_boxes: Array                   # [B, O, 4] box priors
    rm_valid: Array                   # [B, O]
    rm_obj_dists: Array               # [B, O, NC]
    rm_obj_labels: Optional[Array]    # [B, O] (train / gt modes)
    rm_fmap_idx: Optional[Array]      # [B, O] index into od rows (refinerels)
    obj_preds: Optional[Array]        # [B, O] NMS-decode classes (test)
    obj_scores: Optional[Array]       # [B, O]
    boxes_all: Optional[Array]        # [B, O, NC, 4] per-class decoded boxes
    rel_sample: Optional[Any]         # RelSample (gtbox train)


class RPNHead(nn.Module):
    """3x3 conv -> ReLU6 -> 1x1 conv to A*(2+4) channels, reshaped to
    [B, H, W, A, 6] (object_detector.py:488-531)."""

    dim: int = 512
    num_anchors: int = C.NUM_ANCHORS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, fmap):
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(fmap)
        x = jnp.minimum(nn.relu(x), 6.0)
        x = nn.Conv(self.num_anchors * 6, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, 6).astype(jnp.float32)


def rpn_proposals(rpn_feats: Array, anchors: Array, im_hw: Array,
                  pre_topn: int, post_topn: int, nms_thresh: float = 0.7
                  ) -> tuple[Array, Array]:
    """Decode + filter + NMS the RPN grid into [B, post_topn, 4] proposals.

    Mirrors RPNHead.roi_proposals (object_detector.py:560-597): softmax
    objectness, invalidate cells beyond the valid image region, decode
    deltas on anchors, clip, drop boxes < 4px, per-image NMS.
    """
    b, h, w, a, _ = rpn_feats.shape
    logits = rpn_feats[..., :2]
    probs = jax.nn.softmax(logits, axis=-1)[..., 1]            # [B, H, W, A]
    deltas = rpn_feats[..., 2:]

    boxes = box_ops.bbox_preds(anchors.reshape(1, -1, 4),
                               deltas.reshape(b, -1, 4))        # [B, N, 4]
    boxes = box_ops.clip_boxes(boxes, im_hw[:, None, 0], im_hw[:, None, 1])

    hw_cells = jnp.stack([im_hw[:, 0] // C.FEAT_STRIDE,
                          im_hw[:, 1] // C.FEAT_STRIDE], 1)     # [B, 2]
    row_ok = jnp.arange(h)[None, :] < hw_cells[:, 0][:, None]   # [B, H]
    col_ok = jnp.arange(w)[None, :] < hw_cells[:, 1][:, None]   # [B, W]
    cell_ok = row_ok[:, :, None] & col_ok[:, None, :]           # [B, H, W]
    valid = jnp.broadcast_to(cell_ok[..., None], (b, h, w, a)).reshape(b, -1)

    wh = box_ops.center_size(boxes)[..., 2:4]
    valid = valid & (wh[..., 0] >= 4) & (wh[..., 1] >= 4)

    def one(bx, sc, va):
        idx, ok = nms_topk(bx, sc, va, nms_thresh, pre_topn, post_topn)
        return bx[idx], ok

    return jax.vmap(one)(boxes, probs.reshape(b, -1), valid)


def decode_boxes_all(rois: Array, deltas: Array, im_hw: Array) -> Array:
    """Per-class box decode + clip: rois [B,S,4], deltas [B,S,NC,4] ->
    [B,S,NC,4] (object_detector.py:377-390)."""
    b, s, nc, _ = deltas.shape
    rep = jnp.broadcast_to(rois[:, :, None, :], (b, s, nc, 4)).reshape(b, -1, 4)
    out = box_ops.bbox_preds(rep, deltas.reshape(b, -1, 4))
    out = box_ops.clip_boxes(out, im_hw[:, None, 0], im_hw[:, None, 1])
    return out.reshape(b, s, nc, 4)


def filter_det(probs: Array, boxes_all: Array, valid: Array, max_per_img: int,
               thresh: float, nms_thresh: float = 0.3,
               per_class_topk: int | None = 256) -> tuple[Array, Array, Array, Array]:
    """Per-image final detection filtering (object_detector.py:425-485,
    nms_filter_duplicates variant): per-class NMS, then each RoI keeps its
    best surviving class, top max_per_img by score.

    probs [S, NC], boxes_all [S, NC, 4], valid [S] ->
    (idx [O] into S, scores [O], classes [O], valid [O]).
    """
    keep = per_class_nms_mask(boxes_all, probs, valid, nms_thresh, thresh,
                              per_class_topk=per_class_topk)
    dists = probs * keep
    scores_pre = jnp.max(dists, axis=1)
    labels_pre = jnp.argmax(dists, axis=1)
    cand = scores_pre > thresh
    score = jnp.where(cand, scores_pre, 0.0)
    top_scores, idx = jax.lax.top_k(score, max_per_img)
    ok = top_scores > thresh
    return idx.astype(jnp.int32), top_scores, labels_pre[idx].astype(jnp.int32), ok


class SELUHead(nn.Module):
    """The deprecated ResNet RoI fc head: Linear -> SELU -> dropout, twice
    (object_detector.py:91-98; AlphaDropout approximated by dropout on this
    deprecated path)."""

    dtype: Any = jnp.bfloat16
    out_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[:-3] + (-1,)).astype(self.dtype)
        for i in range(2):
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"fc{i}")(x)
            x = jax.nn.selu(x)
            x = nn.Dropout(0.05, deterministic=not train)(x)
        return x


class ObjectDetector(nn.Module):
    """Detection core (reference ObjectDetector, lib/object_detector.py:50-422)."""

    num_classes: int = C.VG_NUM_CLASSES
    mode: str = "rpntrain"
    max_per_img: int = 64
    thresh: float = 0.05
    use_resnet: bool = False
    obj_dim: int = 4096     # RoI fc width (reference output_dim, fixed 4096
                            # for VGG — parameterized here for small tests)
    dtype: Any = jnp.bfloat16
    budgets: C.PadBudgets = C.PadBudgets()
    remat: bool = False     # jax.checkpoint the conv trunk: backward
                            # recomputes the 592^2 conv activations instead
                            # of storing them (bigger pretraining batches)

    def setup(self):
        assert self.mode in MODES
        if self.use_resnet:
            # deprecated alternative backbone (object_detector.py:84-100):
            # ResNet-101-C4 trunk + 1x1 compress + SELU fc RoI head
            from neural_motifs_tpu.models.resnet import ResNet101C4
            feat_cls = nn.remat(ResNet101C4) if self.remat else ResNet101C4
            self.features = feat_cls(dtype=self.dtype)
            self.compress = nn.Sequential([
                nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32),
                nn.relu,
                nn.BatchNorm(use_running_average=True)])
            self.roi_head = SELUHead(dtype=self.dtype)
        else:
            feat_cls = (nn.remat(VGG16Features) if self.remat
                        else VGG16Features)
            self.features = feat_cls(dtype=self.dtype)
            self.roi_head = VGGRoIHead(dtype=self.dtype, fc_dim=self.obj_dim)
        self.score_fc = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                                 dtype=jnp.float32)
        self.bbox_fc = nn.Dense(self.num_classes * 4, param_dtype=jnp.float32,
                                dtype=jnp.float32)
        self.rpn_head = RPNHead(dtype=self.dtype)

    def feature_map(self, images):
        return self.features(images)

    def obj_feature_map(self, fmap, rois, valid, train: bool):
        """RoIAlign 7x7 + fc tower -> [B, S, 4096 (vgg) | 2048 (resnet)]
        (object_detector.py:129-138)."""
        if self.use_resnet:
            fmap = self.compress(fmap)
        pooled = roi_align(fmap, rois, valid, 7, 1.0 / C.FEAT_STRIDE)
        return self.roi_head(pooled, train=train).astype(jnp.float32)

    def __call__(self, images, im_hw, gt_boxes=None, gt_classes=None,
                 gt_mask=None, gt_rels=None, gt_rel_mask=None,
                 proposals=None, proposal_mask=None, train: bool = False
                 ) -> DetectorOutput:
        b = images.shape[0]
        if images.dtype == jnp.uint8:
            # raw pixels from the loader (1 byte/channel over the host link;
            # the f32 normalize is fused into the first conv by XLA). Zero
            # beyond each image's true (h, w) extent: 0 in normalized space
            # IS the ImageNet mean, exactly reproducing the host-side
            # mean-pad (image_transforms.py SquarePad / collate zero-pad).
            from neural_motifs_tpu.data.transforms import (IMAGENET_MEAN,
                                                           IMAGENET_STD)
            x = images.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            hh = jnp.arange(images.shape[1])[None, :, None]
            ww = jnp.arange(images.shape[2])[None, None, :]
            inside = ((hh < im_hw[:, 0, None, None])
                      & (ww < im_hw[:, 1, None, None]))
            images = x * inside[..., None]
        fmap = self.feature_map(images)
        # anchors are a compile-time constant for the (static) input size;
        # rectangular pad budgets (aspect-bucketed serving) get the matching
        # rect grid — cells beyond im_hw are invalidated in rpn_proposals
        # either way, so the budget shape never changes valid outputs
        anchors = jnp.asarray(generate_anchors(
            im_scale=(images.shape[1], images.shape[2])))
        grid = (fmap.shape[1], fmap.shape[2], C.NUM_ANCHORS)

        rpn_feats = None
        rpn_labels = None
        rpn_targets = None
        rel_sample = None
        rm_fmap_idx = None

        if self.mode == "gtbox":
            rois, roi_valid = gt_boxes, gt_mask
            od_labels = gt_classes
            od_targets = None
            if train and gt_rels is not None:
                rng = self.make_rng("sample")
                rel_sample = jax.vmap(
                    lambda k, gm, gr, grm: rel_assign_gtbox(
                        k, gm, gr, grm,
                        rels_per_img=self.budgets.rels_per_img))(
                    jax.random.split(rng, b), gt_mask, gt_rels, gt_rel_mask)
        else:
            if self.mode == "proposals":
                assert proposals is not None
                prop_boxes, prop_valid = proposals[..., 1:], proposal_mask
                prop_scores = proposals[..., 0]

                def one(bx, sc, va):
                    idx, ok = nms_topk(bx, sc, va, 0.7,
                                       self.budgets.rpn_pre_nms_topn_test,
                                       self.budgets.rpn_post_nms_topn_test)
                    return bx[idx], ok

                rois, roi_valid = jax.vmap(one)(prop_boxes, prop_scores, prop_valid)
            else:
                rpn_feats = self.rpn_head(fmap)
                pre = (self.budgets.rpn_pre_nms_topn_train
                       if train and self.mode == "rpntrain"
                       else self.budgets.rpn_pre_nms_topn_test)
                post = (self.budgets.rpn_post_nms_topn_train
                        if train and self.mode == "rpntrain"
                        else self.budgets.rpn_post_nms_topn_test)
                rois, roi_valid = rpn_proposals(rpn_feats, anchors, im_hw,
                                                pre, post)

            od_labels = None
            od_targets = None
            if train and self.mode == "rpntrain":
                rng = self.make_rng("sample")
                keys = jax.random.split(rng, 2 * b)
                at = jax.vmap(lambda k, gb, gm, hw: anchor_targets(
                    k, anchors.reshape(-1, 4), gb, gm, hw[0], hw[1], grid))(
                        keys[:b], gt_boxes, gt_mask, im_hw)
                rpn_labels, rpn_targets = at.labels, at.target_boxes
                det = jax.vmap(
                    lambda k, r, rv, gb, gc, gm: proposal_assign_det(
                        k, r, rv, gb, gc, gm,
                        rois_per_img=self.budgets.rois_per_img))(
                    keys[b:], rois, roi_valid, gt_boxes, gt_classes, gt_mask)
                rois, od_labels = det.rois, det.labels
                od_targets, roi_valid = det.targets, det.valid

        # classify the RoIs (object_detector.py:299-303)
        obj_fmap = self.obj_feature_map(fmap, rois, roi_valid, train)
        od_obj_dists = self.score_fc(obj_fmap)
        od_box_deltas = None
        if self.mode != "gtbox":
            od_box_deltas = self.bbox_fc(obj_fmap).reshape(
                b, rois.shape[1], self.num_classes, 4)

        # post-NMS object set for the relation model
        obj_preds = None
        obj_scores = None
        boxes_all_out = None
        rm_obj_labels = od_labels
        if self.mode in ("refinerels", "proposals") or (self.mode != "gtbox" and not train):
            probs = jax.nn.softmax(od_obj_dists, axis=-1)
            boxes_all = decode_boxes_all(rois, od_box_deltas, im_hw)

            def one(p, ba, va):
                return filter_det(p, ba, va, self.max_per_img, self.thresh,
                                  per_class_topk=self.budgets.per_class_nms_topk)

            idx, scores, classes, ok = jax.vmap(one)(probs, boxes_all, roi_valid)
            take = jax.vmap(lambda x, i: x[i])
            rm_boxes = take(rois, idx)                  # class-0 prior boxes
            rm_valid = ok
            rm_obj_dists = take(od_obj_dists, idx)
            boxes_all_out = take(boxes_all, idx)
            # slot 0 of per-class boxes = the prior (object_detector.py:407)
            boxes_all_out = boxes_all_out.at[..., 0, :].set(rm_boxes)
            obj_preds, obj_scores = classes, scores
            rm_fmap_idx = idx
            if train:
                rm_obj_labels = jax.vmap(assign_labels_by_iou)(
                    rm_boxes, rm_valid, gt_boxes, gt_classes, gt_mask)
                rm_obj_labels = jnp.where(rm_valid, rm_obj_labels, 0)
            else:
                rm_obj_labels = None
        else:
            rm_boxes, rm_valid, rm_obj_dists = rois, roi_valid, od_obj_dists

        return DetectorOutput(
            fmap=fmap, od_rois=rois, od_valid=roi_valid,
            od_obj_dists=od_obj_dists, od_box_deltas=od_box_deltas,
            od_labels=od_labels, od_box_targets=od_targets,
            rpn_feats=rpn_feats, rpn_labels=rpn_labels,
            rpn_target_boxes=rpn_targets, anchors=anchors,
            rm_boxes=rm_boxes, rm_valid=rm_valid, rm_obj_dists=rm_obj_dists,
            rm_obj_labels=rm_obj_labels, rm_fmap_idx=rm_fmap_idx,
            obj_preds=obj_preds, obj_scores=obj_scores,
            boxes_all=boxes_all_out, rel_sample=rel_sample)
