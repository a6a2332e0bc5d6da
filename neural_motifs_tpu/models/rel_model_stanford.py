"""Stanford iterative message-passing baseline (Xu et al.) — TPU re-design
of reference lib/rel_model_stanford.py:20-205.

The reference builds dense 0/1 object<->relation incidence matrices and
multiplies (rel_model_stanford.py:72-78, :103). In the padded [B, O] /
[B, P] layout the same aggregation is a masked scatter-add over the pair
index arrays — no incidence matrices materialized.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.detector import ObjectDetector, filter_det
from neural_motifs_tpu.models.rel_model import (RelOutput, SGPrediction,
                                                UnionBoxesAndFeats, UnionVGGHead,
                                                all_pair_indices,
                                                pair_visual_rep)
from neural_motifs_tpu.models.backbone import VGGRoIHead
from neural_motifs_tpu.ops import boxes as box_ops
from neural_motifs_tpu.ops.roi_align import roi_align
from neural_motifs_tpu.ops.sampling import RelSample, rel_assign_sgdet

Array = jax.Array
SIZE = 512   # reference hidden size (rel_model_stanford.py:18)


class RelModelStanford(nn.Module):
    """GRU message passing over the scene graph (3 iterations)."""

    num_classes: int = C.VG_NUM_CLASSES
    num_rels: int = C.VG_NUM_PREDICATES
    mode: str = "sgdet"
    obj_dim: int = 4096
    pooling_dim: int = 4096   # union tower width (reference hardcodes 4096)
    size: int = SIZE          # GRU hidden (reference SIZE=512)
    n_iter: int = 3
    thresh: float = 0.01
    require_overlap_det: bool = True
    use_proposals: bool = False
    use_resnet: bool = False
    dtype: Any = jnp.bfloat16
    budgets: C.PadBudgets = C.PadBudgets()

    @property
    def require_overlap(self):
        return self.require_overlap_det and self.mode == "sgdet"

    def setup(self):
        det_mode = (("proposals" if self.use_proposals else "refinerels")
                    if self.mode == "sgdet" else "gtbox")
        self.detector = ObjectDetector(
            num_classes=self.num_classes, mode=det_mode, thresh=self.thresh,
            max_per_img=self.budgets.objs_per_img, dtype=self.dtype,
            obj_dim=self.obj_dim, budgets=self.budgets)
        self.union_boxes = UnionBoxesAndFeats(pooling_size=7, dim=512,
                                              dtype=self.dtype)
        self.roi_fmap = UnionVGGHead(pooling_dim=self.pooling_dim,
                                     fc_dim=self.obj_dim, dtype=self.dtype)
        self.roi_fmap_obj = VGGRoIHead(fc_dim=self.obj_dim, dtype=self.dtype)

        self.obj_unary = nn.Dense(self.size)
        self.edge_unary = nn.Dense(self.size)
        self.edge_gru = nn.GRUCell(features=self.size)
        self.node_gru = nn.GRUCell(features=self.size)
        self.sub_vert_w_fc = nn.Dense(1)
        self.obj_vert_w_fc = nn.Dense(1)
        self.out_edge_w_fc = nn.Dense(1)
        self.in_edge_w_fc = nn.Dense(1)
        self.obj_fc = nn.Dense(self.num_classes)
        self.rel_fc = nn.Dense(self.num_rels)

    def message_pass(self, rel_rep, obj_rep, pairs: RelSample):
        """rel_rep [B,P,SIZE]; obj_rep [B,O,SIZE]
        (rel_model_stanford.py:60-107)."""
        b, o, _ = obj_rep.shape
        pv = pairs.valid[..., None].astype(rel_rep.dtype)
        take = lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)

        hx_obj = jnp.zeros((b, o, self.size), obj_rep.dtype)
        hx_rel = jnp.zeros(rel_rep.shape[:2] + (self.size,), rel_rep.dtype)
        vert, _ = self.node_gru(hx_obj, obj_rep)
        edge, _ = self.edge_gru(hx_rel, rel_rep)

        for _ in range(self.n_iter):
            sub_vert = take(vert, pairs.sub)
            obj_vert = take(vert, pairs.obj)
            w_sub = nn.sigmoid(self.sub_vert_w_fc(
                jnp.concatenate([sub_vert, edge], -1)))
            w_obj = nn.sigmoid(self.obj_vert_w_fc(
                jnp.concatenate([obj_vert, edge], -1)))
            edge_inp = (w_sub * sub_vert + w_obj * obj_vert) * pv
            new_edge, _ = self.edge_gru(edge, edge_inp)

            pre_out = nn.sigmoid(self.out_edge_w_fc(
                jnp.concatenate([sub_vert, edge], -1))) * edge * pv
            pre_in = nn.sigmoid(self.in_edge_w_fc(
                jnp.concatenate([obj_vert, edge], -1))) * edge * pv
            vert_ctx = jnp.zeros_like(vert)
            vert_ctx = jax.vmap(lambda v, s, x: v.at[s].add(x))(
                vert_ctx, pairs.sub, pre_out)
            vert_ctx = jax.vmap(lambda v, s, x: v.at[s].add(x))(
                vert_ctx, pairs.obj, pre_in)
            new_vert, _ = self.node_gru(vert, vert_ctx)
            vert, edge = new_vert, new_edge

        return self.obj_fc(vert), self.rel_fc(edge)

    def _rel_pairs(self, det, train: bool, gt):
        """Returns (RelSample, num_valid_pairs) — see RelModel._rel_pairs.
        Applies the same max_pairs_eval top-k compaction as RelModel (the
        message-passing graph then only spans the kept pairs); exact while
        num_valid_pairs <= budget, and the eval entry points report any
        overflow."""
        b, o = det.rm_valid.shape
        if train:
            if self.mode == "sgdet":
                rng = self.make_rng("sample")
                return jax.vmap(
                    lambda k, pb, pl, pv, gb, gc, gm, gr, grm:
                    rel_assign_sgdet(
                        k, pb, pl, pv, gb, gc, gm, gr, grm,
                        rels_per_img=self.budgets.rels_per_img_refine))(
                    jax.random.split(rng, b), det.rm_boxes, det.rm_obj_labels,
                    det.rm_valid, gt["boxes"], gt["classes"], gt["mask"],
                    gt["rels"], gt["rel_mask"]), None
            return det.rel_sample, None
        sub_np, obj_np = all_pair_indices(o)
        sub = jnp.broadcast_to(jnp.asarray(sub_np), (b, len(sub_np)))
        obj = jnp.broadcast_to(jnp.asarray(obj_np), (b, len(obj_np)))
        take = lambda x, i: jnp.take_along_axis(x, i, axis=1)
        valid = take(det.rm_valid, sub) & take(det.rm_valid, obj)
        if self.require_overlap:
            iou = box_ops.bbox_overlaps(det.rm_boxes, det.rm_boxes,
                                        det.rm_valid, det.rm_valid)
            valid = valid & (jax.vmap(lambda m, s, t: m[s, t])(iou, sub, obj) > 0)
        n_valid = valid.sum(axis=1).astype(jnp.int32)

        budget = self.budgets.max_pairs_eval
        if budget < sub.shape[1]:
            # serving-mode compaction, same contract as RelModel._rel_pairs:
            # EXACT whenever num_valid_pairs <= budget, because invalid
            # pairs contribute nothing to message_pass (their gates are
            # zeroed by pairs.valid) — dropping them only shrinks the
            # scatter-add. Overflow is reported by the eval entry points.
            sc = (det.obj_scores if det.obj_scores is not None
                  else jnp.ones_like(det.rm_valid, jnp.float32))
            key = jnp.where(valid, 1.0 + take(sc, sub) * take(sc, obj), 0.0)
            _, idx = jax.lax.top_k(key, budget)
            sub = take(sub, idx)
            obj = take(obj, idx)
            valid = jnp.take_along_axis(key, idx, axis=1) > 0.5
        return (RelSample(sub=sub, obj=obj, label=jnp.zeros_like(sub),
                          valid=valid),
                n_valid)

    def __call__(self, images, im_hw, gt_boxes=None, gt_classes=None,
                 gt_mask=None, gt_rels=None, gt_rel_mask=None, proposals=None,
                 proposal_mask=None, train: bool = False):
        det = self.detector(images, im_hw, gt_boxes, gt_classes, gt_mask,
                            gt_rels, gt_rel_mask, proposals, proposal_mask,
                            train=train)
        boxes = jax.lax.stop_gradient(det.rm_boxes)
        valid = det.rm_valid
        fmap = jax.lax.stop_gradient(det.fmap)
        if det.boxes_all is not None:
            det = det._replace(boxes_all=jax.lax.stop_gradient(det.boxes_all))
        pairs, num_valid_pairs = self._rel_pairs(
            det, train, dict(boxes=gt_boxes, classes=gt_classes,
                             mask=gt_mask, rels=gt_rels,
                             rel_mask=gt_rel_mask))

        # visual rep over union boxes (NOT detached in the reference,
        # rel_model_stanford.py:149 — but the detector is frozen anyway);
        # chunked/scanned over pairs exactly as in RelModel
        visual_rep = pair_visual_rep(self, fmap, boxes, pairs, train,
                                     chunk=512)

        pooled = roi_align(fmap, boxes, valid, 7, 1.0 / C.FEAT_STRIDE)
        obj_fmap = self.roi_fmap_obj(pooled, train=train).astype(jnp.float32)

        obj_dists, rel_dists = self.message_pass(
            nn.relu(self.edge_unary(visual_rep)), self.obj_unary(obj_fmap),
            pairs)

        if train:
            return RelOutput(obj_dists=obj_dists, obj_valid=valid,
                             obj_labels=det.rm_obj_labels, rel_dists=rel_dists,
                             rel_labels=pairs.label, rel_valid=pairs.valid,
                             det=det,
                             rel_inds=jnp.stack([pairs.sub, pairs.obj], -1))
        return self._decode(det, obj_dists, rel_dists, pairs,
                            gt_classes=gt_classes,
                            num_valid_pairs=num_valid_pairs)

    def _decode(self, det, obj_dists, rel_dists, pairs, gt_classes=None,
                num_valid_pairs=None):
        """Test-time decode (rel_model_stanford.py:162-204)."""
        b, o, _ = obj_dists.shape
        if self.mode == "predcls":
            obj_preds = gt_classes.astype(jnp.int32)
            obj_scores = jnp.ones((b, o), jnp.float32)
        elif self.mode == "sgdet":
            probs = jax.nn.softmax(obj_dists, axis=-1)
            from neural_motifs_tpu.ops.nms import per_class_nms_mask
            keep = jax.vmap(lambda bc, p, v: per_class_nms_mask(
                bc, p, v, 0.3, 0.0))(det.boxes_all, probs, det.rm_valid)
            masked = probs * keep
            obj_scores = jnp.max(masked, axis=-1)
            obj_preds = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            obj_preds = jnp.maximum(obj_preds, 1)
        else:
            probs = jax.nn.softmax(obj_dists, axis=-1)
            obj_preds = (jnp.argmax(probs[..., 1:], axis=-1) + 1).astype(jnp.int32)
            obj_scores = jnp.max(probs[..., 1:], axis=-1)

        if self.mode == "sgdet" and det.boxes_all is not None:
            bboxes = jnp.take_along_axis(
                det.boxes_all, obj_preds[..., None, None].astype(jnp.int32)
                .repeat(4, -1), axis=2)[..., 0, :]
        else:
            bboxes = det.rm_boxes

        rel_rep = jax.nn.softmax(rel_dists, axis=-1)
        take = lambda x, i: jnp.take_along_axis(x, i, axis=1)
        s0 = take(obj_scores, pairs.sub)
        s1 = take(obj_scores, pairs.obj)
        triplet = jnp.where(pairs.valid,
                            jnp.max(rel_rep[..., 1:], -1) * s0 * s1, -1.0)
        order = jnp.argsort(-triplet, axis=1)
        rel_inds = jnp.stack([take(pairs.sub, order), take(pairs.obj, order)], -1)
        rel_scores = jnp.take_along_axis(rel_rep, order[..., None], axis=1)
        return SGPrediction(boxes=bboxes, obj_classes=obj_preds,
                            obj_scores=obj_scores, obj_valid=det.rm_valid,
                            rel_inds=rel_inds, rel_scores=rel_scores,
                            rel_valid=take(pairs.valid, order),
                            num_valid_pairs=num_valid_pairs)
