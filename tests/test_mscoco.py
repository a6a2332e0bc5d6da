"""CocoDetection loader tests over a fabricated COCO directory — no real
data or pycocotools needed (the JSON is parsed directly). Covers the
reference semantics (dataloaders/mscoco.py): images without annotations
dropped, skip-numbered category ids remapped to dense 1..C, xywh->corners
with x2 = x + w, BOX_SCALE coords, and the train-time crop/flip keeping
boxes inside the image."""

import json
import os

import numpy as np
import pytest

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import collate
from neural_motifs_tpu.data.mscoco import CocoDetection


@pytest.fixture
def coco_dir(tmp_path):
    from PIL import Image

    split = "val2014"
    (tmp_path / split).mkdir()
    (tmp_path / "annotations").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        fn = f"COCO_{split}_{i:012d}.jpg"
        w, h = 80 + 10 * i, 60
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)).save(tmp_path / split / fn)
        images.append({"id": 100 + i, "file_name": fn, "width": w, "height": h})
    # COCO-style skip-numbered category ids
    categories = [{"id": 1, "name": "person"}, {"id": 13, "name": "stop sign"},
                  {"id": 90, "name": "toothbrush"}]
    # image 100: two anns; image 101: one ann; image 102: none (dropped)
    annotations = [
        {"id": 1, "image_id": 100, "category_id": 1,
         "bbox": [10.0, 5.0, 20.0, 30.0], "iscrowd": 0, "area": 600.0},
        {"id": 2, "image_id": 100, "category_id": 90,
         "bbox": [40.0, 10.0, 15.0, 25.0], "iscrowd": 0, "area": 375.0},
        {"id": 3, "image_id": 101, "category_id": 13,
         "bbox": [0.0, 0.0, 30.0, 30.0], "iscrowd": 0, "area": 900.0},
    ]
    with open(tmp_path / "annotations" / f"instances_{split}.json", "w") as f:
        json.dump({"images": images, "categories": categories,
                   "annotations": annotations}, f)
    # train split = same files under train2014
    os.symlink(tmp_path / split, tmp_path / "train2014")
    os.symlink(tmp_path / "annotations" / f"instances_{split}.json",
               tmp_path / "annotations" / "instances_train2014.json")
    return str(tmp_path)


def test_index_and_category_remap(coco_dir):
    ds = CocoDetection("val", coco_path=coco_dir)
    assert len(ds) == 2                       # image 102 has no anns
    assert ds.ind_to_classes == ["__background__", "person", "stop sign",
                                 "toothbrush"]
    assert ds.num_classes == 4


def test_entry_boxes_and_classes(coco_dir):
    ds = CocoDetection("val", coco_path=coco_dir)
    e = ds[0]
    # image 100 is 80x60 -> BOX_SCALE factor
    sf = C.BOX_SCALE / 80.0
    exp = np.array([[10, 5, 30, 35], [40, 10, 55, 35]], np.float32) * sf
    np.testing.assert_allclose(e["gt_boxes"], exp, rtol=1e-6)
    np.testing.assert_array_equal(e["gt_classes"], [1, 3])  # dense remap
    assert e["img"].shape[2] == 3
    assert e["gt_relations"].shape == (0, 3)


def test_train_augmentation_keeps_boxes_valid(coco_dir):
    ds = CocoDetection("train", coco_path=coco_dir, seed=3)
    for _ in range(4):                        # crop+flip randomness
        for i in range(len(ds)):
            e = ds[i]
            b = e["gt_boxes"]
            assert np.all(b[:, 2:] >= b[:, :2] - 1e-3)
            assert np.all(b >= -1e-3)
            assert np.all(b <= C.BOX_SCALE + 1e-3)


def test_collate_roundtrip(coco_dir):
    ds = CocoDetection("val", coco_path=coco_dir)
    batch = collate([ds[i] for i in range(len(ds))])
    assert batch.images.shape[0] == 2
    assert batch.gt_mask[0].sum() == 2 and batch.gt_mask[1].sum() == 1
    # boxes arrive at IM_SCALE coords
    assert float(batch.gt_boxes.max()) <= C.IM_SCALE
