"""Masked losses — the reference's loss functions (models/train_detector.py:
107-140, models/train_rels.py:140-142) over padded layouts."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from neural_motifs_tpu import config as C
from neural_motifs_tpu.ops.boxes import bbox_encode, smooth_l1

Array = jax.Array


def masked_ce(logits: Array, labels: Array, mask: Array) -> Array:
    """Mean cross-entropy over mask-selected rows."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, logits.shape[-1]), labels.reshape(-1))
    m = mask.reshape(-1).astype(ce.dtype)
    return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_bbox_loss(priors: Array, deltas: Array, targets: Array,
                     mask: Array, eps: float = 1e-4) -> Array:
    """Smooth-L1 on encoded deltas, sum / (eps + n_valid)
    (lib/fpn/box_utils.py:8-25)."""
    t = bbox_encode(priors, targets)
    per = smooth_l1(deltas - t).sum(-1) * mask.astype(deltas.dtype)
    return per.sum() / (eps + mask.sum())


def detector_losses(out, cfg: C.ModelConfig | None = None) -> dict[str, Array]:
    """Detector pretraining losses (train_detector.py:107-140): RoI class CE
    + class-conditional box loss (fg-fraction weighted) + RPN binary CE +
    RPN box loss over the sampled anchor grid."""
    losses = {}
    labels, valid = out.od_labels, out.od_valid
    fg = valid & (labels > 0)
    fg_cnt = fg.sum()
    total_cnt = valid.sum()

    losses["class_loss"] = masked_ce(out.od_obj_dists, labels, valid)

    # box deltas of the labeled class only
    deltas = jnp.take_along_axis(
        out.od_box_deltas, labels[..., None, None].astype(jnp.int32)
        .repeat(4, -1), axis=2)[..., 0, :]
    box_mult = 2.0 * (1.0 / C.FG_FRACTION) * fg_cnt / (total_cnt + 1e-4)
    losses["box_loss"] = masked_bbox_loss(out.od_rois, deltas,
                                          out.od_box_targets, fg) * box_mult

    if out.rpn_feats is not None and out.rpn_labels is not None:
        rpn_logits = out.rpn_feats[..., :2]
        rpn_deltas = out.rpn_feats[..., 2:]
        lbl = out.rpn_labels
        sampled = lbl >= 0
        rpn_fg = lbl == 1
        losses["rpn_class_loss"] = masked_ce(rpn_logits, jnp.maximum(lbl, 0),
                                             sampled)
        anc = out.anchors[None]
        rpn_mult = (2.0 * (1.0 / C.RPN_FG_FRACTION) * rpn_fg.sum()
                    / (sampled.sum() + 1e-4))
        losses["rpn_box_loss"] = masked_bbox_loss(
            jnp.broadcast_to(anc, out.rpn_target_boxes.shape),
            rpn_deltas, out.rpn_target_boxes, rpn_fg) * rpn_mult

    losses["total"] = sum(losses.values())
    return losses


def rel_losses(out) -> dict[str, Array]:
    """Relation training losses (train_rels.py:140-142): object class CE +
    predicate CE over the sampled pairs."""
    losses = {
        "class_loss": masked_ce(out.obj_dists, out.obj_labels, out.obj_valid),
        "rel_loss": masked_ce(out.rel_dists, out.rel_labels, out.rel_valid),
    }
    losses["total"] = losses["class_loss"] + losses["rel_loss"]
    return losses
