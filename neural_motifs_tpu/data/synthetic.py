"""Synthetic VG-like dataset for tests and benchmarks (no data files on this
machine — real VG loading lives in data/visual_genome.py with identical
entry schema)."""

from __future__ import annotations

import numpy as np

from neural_motifs_tpu import config as C


class SyntheticVG:
    """Random scenes with the VG taxonomy sizes. Same entry schema as VG."""

    def __init__(self, num_images: int = 64, mode: str = "train", seed: int = 0,
                 min_objs: int = 3, max_objs: int = 12, max_rels: int = 10,
                 num_classes: int = C.VG_NUM_CLASSES,
                 num_predicates: int = C.VG_NUM_PREDICATES):
        self.mode = mode
        self.num_images = num_images
        self.ind_to_classes = ["__background__"] + [f"class_{i}" for i in range(1, num_classes)]
        self.ind_to_predicates = ["__background__"] + [f"pred_{i}" for i in range(1, num_predicates)]
        rng = np.random.RandomState(seed + (0 if mode == "train" else 1))
        self.gt_boxes, self.gt_classes, self.relationships = [], [], []
        for _ in range(num_images):
            n = rng.randint(min_objs, max_objs + 1)
            xy = rng.uniform(0, C.BOX_SCALE * 0.7, (n, 2))
            wh = rng.uniform(C.BOX_SCALE * 0.05, C.BOX_SCALE * 0.3, (n, 2))
            boxes = np.concatenate([xy, np.minimum(xy + wh, C.BOX_SCALE - 1)], 1)
            classes = rng.randint(1, num_classes, n)
            n_r = rng.randint(1, max_rels + 1)
            sub = rng.randint(0, n, n_r)
            obj = (sub + rng.randint(1, n, n_r)) % n
            pred = rng.randint(1, num_predicates, n_r)
            self.gt_boxes.append(boxes.astype(np.float32))
            self.gt_classes.append(classes.astype(np.int32))
            self.relationships.append(np.stack([sub, obj, pred], 1).astype(np.int32))
        self._rng = rng

    @property
    def num_classes(self):
        return len(self.ind_to_classes)

    @property
    def num_predicates(self):
        return len(self.ind_to_predicates)

    @property
    def is_train(self):
        return self.mode == "train"

    def __len__(self):
        return self.num_images

    def image_sizes(self) -> np.ndarray:
        """[N, 2] original (h, w) — synthetic images are square IM_SCALE
        arrays, so every image lands in the square aspect bucket; keeps
        `-im_budget auto` drivable in dataless runs."""
        return np.full((self.num_images, 2), C.IM_SCALE, np.int64)

    def __getitem__(self, index: int) -> dict:
        rng = np.random.RandomState(index)
        img = rng.randn(C.IM_SCALE, C.IM_SCALE, 3).astype(np.float32) * 0.5
        return {
            "img": img,
            "img_size": (C.IM_SCALE, C.IM_SCALE, C.IM_SCALE / C.BOX_SCALE),
            "gt_boxes": self.gt_boxes[index].copy(),
            "gt_classes": self.gt_classes[index].copy(),
            "gt_relations": self.relationships[index].copy(),
            "scale": C.IM_SCALE / C.BOX_SCALE,
            "index": index,
            "flipped": False,
        }

    def coco_annotations(self):
        from neural_motifs_tpu.data.adapters import faux_coco_annotations
        return faux_coco_annotations(self.gt_classes, self.gt_boxes,
                                     self.ind_to_classes)

    @classmethod
    def splits(cls, num_images=64, **kw):
        return (cls(num_images, "train", **kw), cls(max(8, num_images // 4), "val", **kw),
                cls(max(8, num_images // 4), "test", **kw))
