"""StructuredSyntheticVG generator invariants: predicate labels re-derive
from geometry, rendering is deterministic and class-color-keyed, the
palette is separable, and the entry schema matches the VG loader's
(data/visual_genome.py) so every entry point can consume it."""

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.synthetic import (STRUCT_PREDICATES,
                                              StructuredSyntheticVG,
                                              class_palette,
                                              geometric_predicate,
                                              structured_batch_dicts)


def test_predicates_rederive_from_geometry():
    ds = StructuredSyntheticVG(num_images=12, im_size=96, seed=5)
    n_rels = 0
    for i in range(len(ds)):
        b = ds.gt_boxes[i] / C.BOX_SCALE
        for (s, o, p) in ds.relationships[i]:
            assert geometric_predicate(b[s], b[o], ds.margin) == p
            n_rels += 1
    assert n_rels > 20


def test_predicate_rules_exclusive_and_symmetric():
    rng = np.random.RandomState(0)
    n_fg = 0
    for _ in range(500):
        a = np.sort(rng.uniform(0, 1, (2, 2)), axis=0).T.reshape(-1)[[0, 2, 1, 3]]
        b = np.sort(rng.uniform(0, 1, (2, 2)), axis=0).T.reshape(-1)[[0, 2, 1, 3]]
        p_ab = geometric_predicate(a, b)
        p_ba = geometric_predicate(b, a)
        n_fg += p_ab > 0
        # converse pairs: left<->right, above<->below, inside<->contains
        conv = {0: 0, 1: 2, 2: 1, 3: 4, 4: 3, 5: 6, 6: 5}
        assert p_ba == conv[p_ab]
    assert n_fg > 50  # rules fire often enough to supervise


def test_rendering_deterministic_and_color_keyed():
    ds = StructuredSyntheticVG(num_images=4, im_size=96, seed=1)
    e1, e2 = ds[2], ds[2]
    assert e1["img"].dtype == np.uint8
    assert (e1["img"] == e2["img"]).all()
    # the center pixel of each box carries (approximately) its class color
    pal = (ds.palette * 255.0)
    boxes = ds.gt_boxes[2] / C.BOX_SCALE * 96
    order = np.argsort(-((boxes[:, 2] - boxes[:, 0])
                         * (boxes[:, 3] - boxes[:, 1])))
    # check the LAST-drawn (topmost) box: its center can't be overdrawn
    i = order[-1]
    cy = int((boxes[i, 1] + boxes[i, 3]) / 2)
    cx = int((boxes[i, 0] + boxes[i, 2]) / 2)
    px = e1["img"][cy, cx].astype(np.float32)
    dists = np.linalg.norm(pal - px, axis=1)
    assert dists.argmin() == ds.gt_classes[2][i] - 1


def test_palette_separation():
    for k in (6, 15, 24):
        pal = class_palette(k)
        d = np.linalg.norm(pal[:, None] - pal[None], axis=-1)
        np.fill_diagonal(d, 9.0)
        assert d.min() > 0.2, f"palette {k} has near-identical colors"


def test_entry_schema_and_batch_dicts():
    ds = StructuredSyntheticVG(num_images=6, im_size=64, num_classes=9,
                               num_predicates=9)
    assert ds.num_classes == 9 and ds.num_predicates == 9
    assert len(ds.ind_to_predicates) == 9
    assert ds.ind_to_predicates[:7] == list(STRUCT_PREDICATES)
    e = ds[0]
    for k in ("img", "img_size", "gt_boxes", "gt_classes", "gt_relations",
              "scale", "index", "flipped"):
        assert k in e
    assert e["gt_boxes"].max() < C.BOX_SCALE
    assert e["gt_classes"].min() >= 1 and e["gt_classes"].max() <= 8

    budgets = C.PadBudgets(max_gt_boxes=12, max_gt_rels=48)
    bd = structured_batch_dicts(ds, [0, 1, 2], budgets)
    assert bd["images"].shape == (3, 64, 64, 3)
    assert bd["gt_boxes"].shape == (3, 12, 4)
    assert bd["gt_rels"].shape == (3, 48, 3)
    # boxes in rendered-image coords
    assert bd["gt_boxes"].max() <= 64.0
    # every valid rel references a valid box row
    for i in range(3):
        rm = bd["gt_rel_mask"][i]
        assert bd["gt_rels"][i][rm][:, :2].max(initial=0) < bd["gt_mask"][i].sum()


def test_train_val_disjoint_scenes():
    tr = StructuredSyntheticVG(num_images=8, im_size=64, seed=2, mode="train")
    va = StructuredSyntheticVG(num_images=8, im_size=64, seed=2, mode="val")
    same = sum(np.array_equal(a, b) for a, b in zip(tr.gt_boxes, va.gt_boxes))
    assert same == 0


def test_loader_collate_roundtrip():
    """The Loader path (IM_SCALE rendering) must produce consistent coords:
    collate rescales BOX_SCALE boxes by IM_SCALE/BOX_SCALE."""
    from neural_motifs_tpu.data.batching import Loader
    ds = StructuredSyntheticVG(num_images=4, seed=3)  # im_size = IM_SCALE
    budgets = C.PadBudgets(max_gt_boxes=12, max_gt_rels=64)
    loader = Loader(ds, batch_size=2, shuffle=False, budgets=budgets,
                    prefetch=0, process_index=0, process_count=1)
    batch = loader.peek()
    assert batch.images.dtype == np.uint8
    assert batch.images.shape[1:] == (C.IM_SCALE, C.IM_SCALE, 3)
    m = batch.gt_mask[0]
    np.testing.assert_allclose(
        batch.gt_boxes[0][m],
        ds.gt_boxes[0][:m.sum()] * (C.IM_SCALE / C.BOX_SCALE), rtol=1e-6)
