"""Data pipeline: collate padding semantics, loader iteration, frequency
counts/bias table, runtime bindings."""

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader, collate
from neural_motifs_tpu.data.synthetic import SyntheticVG
from neural_motifs_tpu.models.frequency import (FrequencyBias, box_filter,
                                                freq_bias_table, get_counts)
from neural_motifs_tpu.runtime import bbox_overlaps as rt_iou
from tests.test_boxes import np_iou, rand_boxes


def test_collate_shapes_and_scaling():
    ds = SyntheticVG(num_images=4)
    budgets = C.PadBudgets(max_gt_boxes=16, max_gt_rels=16)
    batch = collate([ds[i] for i in range(3)], budgets)
    assert batch.images.shape == (3, C.IM_SCALE, C.IM_SCALE, 3)
    assert batch.gt_boxes.shape == (3, 16, 4)
    # boxes scaled from BOX_SCALE to IM_SCALE
    n0 = batch.gt_mask[0].sum()
    np.testing.assert_allclose(batch.gt_boxes[0, :n0],
                               ds[0]["gt_boxes"][:n0] * C.IM_SCALE / C.BOX_SCALE,
                               rtol=1e-5)
    # padded rows zero / masked
    assert not batch.gt_mask[0, n0:].any()
    assert np.all(batch.gt_boxes[0, n0:] == 0)
    # rels reference valid boxes
    for b in range(3):
        r = batch.gt_rels[b][batch.gt_rel_mask[b]]
        assert (r[:, :2] < batch.gt_mask[b].sum()).all()


def test_loader_epoch():
    ds = SyntheticVG(num_images=10)
    loader = Loader(ds, batch_size=4, shuffle=True,
                    budgets=C.PadBudgets(max_gt_boxes=16, max_gt_rels=16))
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert all(b.images.shape[0] == 4 for b in batches)


def test_get_counts_and_bias():
    ds = SyntheticVG(num_images=12, num_classes=10, num_predicates=6)
    fg, bg = get_counts(ds, must_overlap=False)
    assert fg.shape == (10, 10, 6)
    total_rels = sum(len(r) for r in ds.relationships)
    assert fg.sum() == total_rels
    table = freq_bias_table(fg=fg, bg=bg)
    assert table.shape == (100, 6)
    assert np.isfinite(table).all()
    fb = FrequencyBias(table, 10)
    import jax.numpy as jnp
    out = np.asarray(fb.index_with_labels(jnp.asarray([2]), jnp.asarray([3])))
    np.testing.assert_allclose(out[0], table[2 * 10 + 3], rtol=1e-6)


def test_box_filter_fallback():
    # non-overlapping boxes with must_overlap -> falls back to all pairs
    boxes = np.array([[0, 0, 10, 10], [500, 500, 520, 520]], float)
    pairs = box_filter(boxes, must_overlap=True)
    assert len(pairs) == 2  # (0,1) and (1,0)


def test_native_runtime_iou_matches_oracle(rng):
    a = rand_boxes(rng, 15)
    b = rand_boxes(rng, 9)
    np.testing.assert_allclose(rt_iou(a, b), np_iou(a, b), rtol=1e-6, atol=1e-9)


def test_native_greedy_nms_matches(rng):
    from neural_motifs_tpu.runtime import greedy_nms
    from tests.test_nms import np_greedy_nms
    boxes = rand_boxes(rng, 40, scale=100)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    got = greedy_nms(boxes, scores, 0.5)
    exp = np_greedy_nms(boxes, scores, np.ones(40, bool), 0.5)
    np.testing.assert_array_equal(got, exp)
