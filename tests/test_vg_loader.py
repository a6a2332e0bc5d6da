"""VG loader semantics against a fabricated VG-SGG.h5 fixture (VERDICT r1
item 7): split carving, val-from-train slicing, empty-box/empty-rel
filtering, non-overlap filtering, the int-truncating cxcywh->xyxy
conversion, duplicate-rel sampling, flip geometry, and the
misaligned-image-dir guard — all per reference
dataloaders/visual_genome.py:141-362, without real VG data.
"""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.visual_genome import VG, load_graphs

# fixture layout: 10 h5 images
#   idx 0: train, 2 overlapping boxes, 1 rel            -> train/val pool
#   idx 1: train, NO boxes (first_box=-1)               -> always dropped
#   idx 2: train, 2 boxes, NO rels                      -> dropped if filter_empty_rels
#   idx 3: train, 2 DISJOINT boxes, 1 rel               -> dropped by filter_non_overlap
#   idx 4: train, 3 boxes, 3 rels (1 duplicate pair)    -> train/val pool
#   idx 5: train, 2 overlapping boxes, 1 rel            -> train/val pool
#   idx 6: train, 2 overlapping boxes, 2 rels           -> train/val pool
#   idx 7-9: test, 2 overlapping boxes, 1 rel each
N_IMG = 10
IMG_W, IMG_H = 64, 48


def _overlapping(cx):
    # two boxes (cxcywh at BOX_SCALE) that clearly overlap; odd width on the
    # first to exercise the int-truncation conversion
    return [[cx, 200, 101, 100], [cx + 20, 220, 120, 140]]


def _disjoint():
    return [[100, 100, 50, 50], [500, 500, 50, 50]]


@pytest.fixture(scope="module")
def vg_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("vg_tiny")
    img_dir = root / "imgs"
    img_dir.mkdir()

    boxes, labels = [], []
    first_box, last_box = [], []
    rels, predicates = [], []
    first_rel, last_rel = [], []

    def add_image(bxs, lbls, image_rels):
        if bxs:
            first_box.append(len(boxes))
            boxes.extend(bxs)
            labels.extend(lbls)
            last_box.append(len(boxes) - 1)
        else:
            first_box.append(-1)
            last_box.append(-1)
        if image_rels:
            first_rel.append(len(rels))
            for s, o, p in image_rels:
                rels.append([first_box[-1] + s, first_box[-1] + o])
                predicates.append(p)
            last_rel.append(len(rels) - 1)
        else:
            first_rel.append(-1)
            last_rel.append(-1)

    add_image(_overlapping(200), [3, 5], [(0, 1, 7)])          # 0
    add_image([], [], [])                                      # 1 no boxes
    add_image(_overlapping(300), [2, 2], [])                   # 2 no rels
    add_image(_disjoint(), [4, 6], [(0, 1, 2)])                # 3 disjoint
    add_image(_overlapping(400) + [[420, 230, 80, 90]],
              [7, 8, 9], [(0, 1, 1), (0, 1, 4), (1, 2, 3)])    # 4 dup pair
    add_image(_overlapping(500), [1, 2], [(1, 0, 5)])          # 5
    add_image(_overlapping(600), [3, 4], [(0, 1, 6), (1, 0, 2)])  # 6
    for k in range(3):                                         # 7-9 test
        add_image(_overlapping(700 + 10 * k), [5, 6], [(0, 1, 8)])

    split = np.array([0, 0, 0, 0, 0, 0, 0, 2, 2, 2], np.int32)

    with h5py.File(root / "VG-SGG.h5", "w") as f:
        f["split"] = split
        f["boxes_1024"] = np.array(boxes, np.int32)
        f["labels"] = np.array(labels, np.int32)[:, None]
        f["img_to_first_box"] = np.array(first_box, np.int32)
        f["img_to_last_box"] = np.array(last_box, np.int32)
        f["img_to_first_rel"] = np.array(first_rel, np.int32)
        f["img_to_last_rel"] = np.array(last_rel, np.int32)
        f["relationships"] = np.array(rels, np.int32)
        f["predicates"] = np.array(predicates, np.int32)[:, None]

    classes = {f"cls{i}": i for i in range(1, 10)}
    preds = {f"pred{i}": i for i in range(1, 10)}
    with open(root / "dicts.json", "w") as f:
        json.dump({"label_to_idx": classes, "predicate_to_idx": preds}, f)

    from PIL import Image
    im_data = []
    for i in range(N_IMG):
        im_data.append({"image_id": 10_000 + i, "width": IMG_W, "height": IMG_H})
        Image.new("RGB", (IMG_W, IMG_H), (120, 90, 60)).save(
            img_dir / f"{10_000 + i}.jpg")
    with open(root / "image_data.json", "w") as f:
        json.dump(im_data, f)
    return root


def _vg(vg_fixture, mode, **kw):
    kw.setdefault("num_val_im", 2)
    kw.setdefault("filter_non_overlap", False)
    return VG(mode, roidb_file=str(vg_fixture / "VG-SGG.h5"),
              dict_file=str(vg_fixture / "dicts.json"),
              image_file=str(vg_fixture / "image_data.json"),
              image_dir=str(vg_fixture / "imgs"), **kw)


def test_split_carving(vg_fixture):
    """Train-split images with boxes+rels = {0, 3, 4, 5, 6}; val = first 2
    (0, 3), train = rest (4, 5, 6); test = {7, 8, 9}
    (visual_genome.py:294-305)."""
    train = _vg(vg_fixture, "train")
    val = _vg(vg_fixture, "val")
    test = _vg(vg_fixture, "test")
    assert np.where(val.split_mask)[0].tolist() == [0, 3]
    assert np.where(train.split_mask)[0].tolist() == [4, 5, 6]
    assert np.where(test.split_mask)[0].tolist() == [7, 8, 9]
    # filenames aligned to h5 indices
    assert train.filenames[0].endswith("10004.jpg")
    assert test.filenames[2].endswith("10009.jpg")


def test_empty_rel_filter_off(vg_fixture):
    """filter_empty_rels=False keeps image 2 (boxes, no rels); image 1 (no
    boxes) is still dropped."""
    train = _vg(vg_fixture, "train", filter_empty_rels=False)
    # pool = {0, 2, 3, 4, 5, 6}; val takes (0, 2), train the rest
    assert np.where(train.split_mask)[0].tolist() == [3, 4, 5, 6]
    i3 = np.where(train.split_mask)[0].tolist().index(3)
    assert len(train.relationships[i3]) == 1


def test_non_overlap_filter(vg_fixture):
    """filter_non_overlap drops image 3 (its only rel joins disjoint boxes)
    AFTER the val slice is taken (visual_genome.py:346-356)."""
    train = _vg(vg_fixture, "train", filter_non_overlap=True)
    assert np.where(train.split_mask)[0].tolist() == [4, 5, 6]
    # and a genuinely overlapping image keeps its rels
    train2 = _vg(vg_fixture, "train", num_val_im=0, filter_non_overlap=True)
    kept = np.where(train2.split_mask)[0].tolist()
    assert kept == [0, 4, 5, 6]


def test_box_conversion_truncates_like_reference(vg_fixture):
    """boxes_1024 is int32; the reference's in-place cxcywh->xyxy conversion
    truncates cx - w/2 for odd w (visual_genome.py:314-316)."""
    sm, boxes, classes, rels = load_graphs(
        str(vg_fixture / "VG-SGG.h5"), "val", num_val_im=2)
    b0 = boxes[0][0]  # image 0, first box: cx=200, cy=200, w=101, h=100
    # int semantics: x1 = int(200 - 50.5) = 149; x2 = 149 + 101 = 250
    assert b0.tolist() == [149.0, 150.0, 250.0, 250.0]


def test_duplicate_rel_sampling(vg_fixture):
    train = _vg(vg_fixture, "train", filter_duplicate_rels=True)
    i4 = np.where(train.split_mask)[0].tolist().index(4)
    raw = train.relationships[i4]
    assert len(raw) == 3  # raw keeps the duplicate pair
    entry = train[i4]
    der = entry["gt_relations"]
    assert len(der) == 2  # (0,1) deduped, (1,2) kept
    pairs = {(int(s), int(o)) for s, o, _ in der}
    assert pairs == {(0, 1), (1, 2)}
    p01 = [int(p) for s, o, p in der if (s, o) == (0, 1)][0]
    assert p01 in (1, 4)


def test_getitem_entry_and_flip(vg_fixture):
    val = _vg(vg_fixture, "val")
    e = val[0]
    assert e["img"].shape[0] <= C.IM_SCALE and e["img"].shape[1] == C.IM_SCALE
    h, w, scale = e["img_size"]
    # landscape 64x48 -> w = IM_SCALE, h = int(48 * scale)
    assert w == C.IM_SCALE and h == int(IMG_H * C.IM_SCALE / IMG_W)
    np.testing.assert_allclose(scale, C.IM_SCALE / IMG_W)

    # flip geometry: x coords mirror within the BOX_SCALE-scaled width
    train = _vg(vg_fixture, "train", seed=0)
    i = 0
    unflipped = None
    flipped = None
    for _ in range(64):
        e = train[i]
        if e["flipped"] and flipped is None:
            flipped = e
        if not e["flipped"] and unflipped is None:
            unflipped = e
        if flipped is not None and unflipped is not None:
            break
    assert flipped is not None and unflipped is not None
    scaled_w = int(C.BOX_SCALE / max(IMG_W, IMG_H) * IMG_W)
    exp_x1 = scaled_w - unflipped["gt_boxes"][:, 2]
    np.testing.assert_allclose(flipped["gt_boxes"][:, 0], exp_x1)


def test_misaligned_image_dir_fails_loudly(vg_fixture):
    """ADVICE r1: a missing image must not silently shift filenames."""
    os.remove(str(vg_fixture / "imgs" / "10003.jpg"))
    try:
        with pytest.raises(RuntimeError, match="align|missing"):
            _vg(vg_fixture, "train")
    finally:
        from PIL import Image
        Image.new("RGB", (IMG_W, IMG_H), (120, 90, 60)).save(
            str(vg_fixture / "imgs" / "10003.jpg"))


def test_flip_pixels_match_pil_oracle(vg_fixture, monkeypatch):
    """The numpy flip + native decode/resize path must reproduce the
    PIL-composed reference pipeline byte-for-byte:
    Image.open -> FLIP_LEFT_RIGHT -> BILINEAR resize."""
    from PIL import Image

    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.transforms import (decode_image_rgb,
                                                   square_pad_resize)
    train = _vg(vg_fixture, "train", seed=0)
    # force the flip branch deterministically
    class _AlwaysFlip:
        def random_sample(self):
            return 1.0
        def choice(self, x):
            return x[0]
    train.rng = _AlwaysFlip()
    entry = train[0]
    assert entry["flipped"]

    pil = Image.open(train.filenames[0]).convert("RGB")
    pil = pil.transpose(Image.FLIP_LEFT_RIGHT)
    w, h = pil.size
    scale = C.IM_SCALE / max(w, h)
    if h > w:
        size = (max(1, round(w * scale)), C.IM_SCALE)
    else:
        size = (C.IM_SCALE, max(1, round(h * scale)))
    exp = np.asarray(pil.resize(size, Image.BILINEAR), np.uint8)
    np.testing.assert_array_equal(entry["img"], exp)
