"""MS-COCO dataset for optional detector pretraining (equivalent of
reference dataloaders/mscoco.py:13-183): same padded-Batch pipeline as VG,
with photometric jitter + box-preserving random crop enabled at train time.

The instances JSON is parsed directly (no pycocotools dependency): the
reference only uses COCO() for the img->ann index and the category-id
remap (mscoco.py:25-26, 47-50), both of which are trivial dict builds.
Category index = position in the JSON 'categories' list + 1, exactly the
reference's id_to_ind (COCO ids skip numbers; 80 categories -> inds 1..80).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.transforms import (random_crop, random_photometric,
                                               square_pad_resize)


class CocoDetection:
    def __init__(self, mode: str, coco_path: str = C.COCO_PATH, seed: int = 0):
        split = "train2014" if mode == "train" else "val2014"
        ann = os.path.join(coco_path, "annotations", f"instances_{split}.json")
        if not os.path.exists(ann):
            raise FileNotFoundError(f"COCO annotations missing: {ann}")
        self.mode = mode
        self.root = os.path.join(coco_path, split)
        with open(ann) as f:
            d = json.load(f)
        self._img_fn = {im["id"]: im["file_name"] for im in d["images"]}
        self._anns_by_img = defaultdict(list)
        for a in d.get("annotations", []):
            self._anns_by_img[a["image_id"]].append(a)
        # images with at least one annotation, in file order (mscoco.py:26)
        self.ids = [im["id"] for im in d["images"]
                    if self._anns_by_img[im["id"]]]
        cats = d["categories"]
        self.ind_to_classes = ["__background__"] + [c["name"] for c in cats]
        self._cat_to_ind = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self.rng = np.random.RandomState(seed)

    @property
    def is_train(self):
        return self.mode == "train"

    @property
    def num_classes(self):
        return len(self.ind_to_classes)

    def __len__(self):
        return len(self.ids)

    @classmethod
    def splits(cls, **kw):
        return cls("train", **kw), cls("val", **kw)

    def __getitem__(self, index: int) -> dict:
        from PIL import Image

        img_id = self.ids[index]
        anns = self._anns_by_img[img_id]
        path = self._img_fn[img_id]
        img = Image.open(os.path.join(self.root, path)).convert("RGB")

        boxes = np.array([a["bbox"] for a in anns], np.float32)  # xywh
        boxes[:, 2:] += boxes[:, :2]  # -> corners, x2 = x + w (mscoco.py:84)
        classes = np.array([self._cat_to_ind[a["category_id"]] for a in anns],
                           np.int32)
        # to BOX_SCALE coords
        sf = C.BOX_SCALE / max(img.size)
        boxes = boxes * sf

        if self.is_train:
            img = random_photometric(img, self.rng)
            img, boxes = random_crop(img, boxes, C.BOX_SCALE, self.rng)
            if self.rng.rand() > 0.5:
                w = C.BOX_SCALE / max(img.size) * img.size[0]
                from PIL import Image as PILImage
                img = img.transpose(PILImage.FLIP_LEFT_RIGHT)
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]

        arr, img_size = square_pad_resize(img)
        return {"img": arr, "img_size": img_size, "gt_boxes": boxes,
                "gt_classes": classes,
                "gt_relations": np.zeros((0, 3), np.int32),
                "scale": C.IM_SCALE / C.BOX_SCALE, "index": index,
                "flipped": False}
