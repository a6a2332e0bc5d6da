"""Detector pretraining path: rpntrain mode (anchor targets + proposal
sampling + RPN/RoI losses) and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu.models.detector import ObjectDetector
from neural_motifs_tpu.training.losses import detector_losses
from tests.test_models import B, IM, NC, RNGS, TINY, tiny_batch


def make_det():
    return ObjectDetector(num_classes=NC, mode="rpntrain", budgets=TINY,
                          dtype=jnp.float32, thresh=0.0, max_per_img=8)


def test_rpntrain_forward_and_losses(rng):
    det = make_det()
    batch = tiny_batch(rng)
    kw = dict(images=batch["images"], im_hw=batch["im_hw"],
              gt_boxes=batch["gt_boxes"], gt_classes=batch["gt_classes"],
              gt_mask=batch["gt_mask"])
    variables = det.init(RNGS, train=True, **kw)
    out = det.apply(variables, train=True, rngs=RNGS, **kw)
    assert out.od_rois.shape == (B, TINY.rois_per_img, 4)
    assert out.rpn_labels.shape == (B, IM // 16, IM // 16, 20)
    labels = np.asarray(out.rpn_labels)
    assert ((labels == 1).sum(axis=(1, 2, 3)) > 0).all()  # fg anchors exist
    losses = detector_losses(out)
    for k in ("class_loss", "box_loss", "rpn_class_loss", "rpn_box_loss", "total"):
        assert np.isfinite(float(losses[k])), k


def test_rpntrain_grads_flow(rng):
    det = make_det()
    batch = tiny_batch(rng)
    kw = dict(images=batch["images"], im_hw=batch["im_hw"],
              gt_boxes=batch["gt_boxes"], gt_classes=batch["gt_classes"],
              gt_mask=batch["gt_mask"])
    variables = det.init(RNGS, train=True, **kw)

    def loss_fn(params):
        out = det.apply({"params": params}, train=True, rngs=RNGS, **kw)
        return detector_losses(out)["total"]

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in flat)
    assert np.isfinite(total) and total > 0
    # every major submodule gets gradient
    for key in ("features", "rpn_head", "score_fc", "bbox_fc", "roi_head"):
        sub = sum(float(np.abs(np.asarray(x)).sum())
                  for x in jax.tree_util.tree_leaves(g[key]))
        assert sub > 0, key


def test_eval_mode_produces_detections(rng):
    det = make_det()
    batch = tiny_batch(rng)
    kw = dict(images=batch["images"], im_hw=batch["im_hw"])
    init_kw = dict(kw, gt_boxes=batch["gt_boxes"],
                   gt_classes=batch["gt_classes"], gt_mask=batch["gt_mask"])
    variables = det.init(RNGS, train=True, **init_kw)
    out = det.apply(variables, train=False, rngs=RNGS, **kw)
    assert out.rm_boxes.shape == (B, 8, 4)
    assert out.obj_preds is not None and out.boxes_all is not None
    preds = np.asarray(out.obj_preds)[np.asarray(out.rm_valid)]
    assert (preds > 0).all()  # background never selected


def test_make_train_step_statless_model(rng):
    """Regression: the CLI train path (create_train_state + make_train_step)
    must work for a model with NO batch_stats collection — the VGG detector.
    The empty mutated {} previously collided with the FrozenDict() default
    in the skip_nonfinite tree_map (found driving train_detector e2e)."""
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer,
                                                        make_train_step)

    det = make_det()
    batch = tiny_batch(rng)
    kw = dict(images=batch["images"], im_hw=batch["im_hw"],
              gt_boxes=batch["gt_boxes"], gt_classes=batch["gt_classes"],
              gt_mask=batch["gt_mask"])
    state = create_train_state(det, jax.random.PRNGKey(0), kw,
                               make_optimizer(1e-3))
    step = make_train_step(detector_losses, lambda b: b, donate=False)
    state2, losses = step(state, kw, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    assert float(losses["skipped"]) == 0.0
    assert int(state2.step) == 1


def test_remat_backbone_same_loss_and_grads(rng):
    """remat=True must change memory behavior only: loss and grads equal the
    non-remat model bit-for-bit (same params, same inputs)."""
    batch = tiny_batch(rng)
    kw = dict(images=batch["images"], im_hw=batch["im_hw"],
              gt_boxes=batch["gt_boxes"], gt_classes=batch["gt_classes"],
              gt_mask=batch["gt_mask"])
    base = make_det()
    det_r = ObjectDetector(num_classes=NC, mode="rpntrain", budgets=TINY,
                           dtype=jnp.float32, thresh=0.0, max_per_img=8,
                           remat=True)
    variables = base.init(RNGS, train=True, **kw)
    # param trees must be interchangeable (remat wrapper keeps module names)
    vr = det_r.init(RNGS, train=True, **kw)
    assert (jax.tree_util.tree_structure(vr["params"])
            == jax.tree_util.tree_structure(variables["params"]))

    def loss(det, params):
        out = det.apply({"params": params}, train=True, rngs=RNGS, **kw)
        return detector_losses(out)["total"]

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(det_r, p))(variables["params"])
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_rect_anchor_grid_is_square_subgrid():
    """The rect anchor grid must be exactly the top-left sub-grid of the
    square one (aspect-bucketed budgets change only how much grid exists,
    never anchor geometry)."""
    from neural_motifs_tpu.ops.anchors import generate_anchors

    sq = generate_anchors(im_scale=64)
    rect = generate_anchors(im_scale=(48, 64))
    assert rect.shape == (3, 4, sq.shape[2], 4)
    np.testing.assert_array_equal(rect, sq[:3])


def test_collate_rect_im_budget(rng):
    from neural_motifs_tpu.data.batching import collate

    entries = []
    for i in range(2):
        h, w = 40 + 4 * i, 60
        entries.append({
            "img": rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
            "img_size": (h, w, 1.0),
            "gt_boxes": np.array([[1.0, 1.0, 10.0, 10.0]], np.float32),
            "gt_classes": np.array([1], np.int32),
            "gt_relations": np.zeros((0, 3), np.int32),
            "index": i,
        })
    b = collate(entries, im_budget=(48, 64))
    assert b.images.shape[1:3] == (48, 64)
    assert (b.images[0, 44:] == 0).all()
    import pytest
    with pytest.raises(ValueError, match="pad budget"):
        collate(entries, im_budget=(32, 64))


def test_train_step_mixed_bucket_shapes(rng):
    """Bucketed TRAINING: the same jitted train step must accept batches
    whose image pad shapes differ (one per aspect bucket) — each shape
    retraces once, the optimizer state threads through both, and both
    updates apply."""
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer,
                                                        make_train_step)

    det = make_det()
    batch = tiny_batch(rng)
    kw_sq = dict(images=batch["images"], im_hw=batch["im_hw"],
                 gt_boxes=batch["gt_boxes"], gt_classes=batch["gt_classes"],
                 gt_mask=batch["gt_mask"])
    h = 48
    imgs = np.asarray(batch["images"]).copy()
    imgs[:, h:] = 0.0
    im_hw = np.asarray(batch["im_hw"]).copy()
    im_hw[:, 0] = h
    kw_rect = dict(images=jnp.asarray(imgs[:, :h]), im_hw=jnp.asarray(im_hw),
                   gt_boxes=jnp.asarray(
                       np.asarray(batch["gt_boxes"]).clip(max=h - 1)),
                   gt_classes=batch["gt_classes"], gt_mask=batch["gt_mask"])

    state = create_train_state(det, jax.random.PRNGKey(0), kw_sq,
                               make_optimizer(1e-3))
    step = make_train_step(detector_losses, lambda b: b, donate=False)
    state1, l1 = step(state, kw_sq, jax.random.PRNGKey(1))
    state2, l2 = step(state1, kw_rect, jax.random.PRNGKey(2))
    state3, l3 = step(state2, kw_sq, jax.random.PRNGKey(3))
    for l in (l1, l2, l3):
        assert np.isfinite(float(l["total"]))
        assert float(l["skipped"]) == 0.0
    assert int(state3.step) == 3
