"""Visual Genome ("stanford filtered") dataset reader.

Loads VG-SGG.h5 / VG-SGG-dicts.json / image_data.json with the exact split
and filtering semantics of the reference loader
(dataloaders/visual_genome.py:23-424):

  * split 0 = train/val, 2 = test; val = first num_val_im images of the
    train split, train = the rest (visual_genome.py:294-305)
  * images without boxes are dropped; optionally images without relations
  * boxes stored (cx, cy, w, h) at BOX_SCALE -> converted to corners
  * sgdet training filters relations whose boxes don't overlap, dropping
    images left with none (visual_genome.py:346-356)
  * duplicate (sub, obj) relations are resolved at __getitem__ time by
    sampling one predicate (train only, visual_genome.py:177-185)
  * random horizontal flip at train time; SquarePad + Resize(592) +
    ImageNet normalization

Entry schema matches SyntheticVG so the rest of the stack is data-source
agnostic. h5py / data files are gated with a clear error.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.transforms import (decode_image_rgb,
                                               square_pad_resize)


def _np_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from neural_motifs_tpu.runtime import bbox_overlaps
    return bbox_overlaps(a, b)


CORRUPTED_IMS = ("1592.jpg", "1722.jpg", "4616.jpg", "4617.jpg")


def load_info(dict_file: str):
    """Class/predicate taxonomies, background at index 0
    (visual_genome.py:365-381)."""
    with open(dict_file) as f:
        info = json.load(f)
    info["label_to_idx"]["__background__"] = 0
    info["predicate_to_idx"]["__background__"] = 0
    ind_to_classes = sorted(info["label_to_idx"], key=lambda k: info["label_to_idx"][k])
    ind_to_predicates = sorted(info["predicate_to_idx"],
                               key=lambda k: info["predicate_to_idx"][k])
    return ind_to_classes, ind_to_predicates


EXPECTED_NUM_IMAGES = 108073


def load_image_filenames(image_file: str, image_dir: str,
                         expected: int | None = EXPECTED_NUM_IMAGES):
    """Filenames of the 108,073 usable images (visual_genome.py:239-261).

    split_mask indices from VG-SGG.h5 assume the full ordering; a missing
    file on disk would silently shift every subsequent filename and misalign
    images with their GT, so (like the reference's `assert len(fns) ==
    108073`) fail loudly instead. Pass expected=None only for fabricated
    test fixtures."""
    with open(image_file) as f:
        im_data = json.load(f)
    fns = []
    missing = []
    for img in im_data:
        basename = f"{img['image_id']}.jpg"
        if basename in CORRUPTED_IMS:
            continue
        fn = os.path.join(image_dir, basename)
        if not os.path.exists(fn):
            missing.append(basename)
            continue
        fns.append(fn)
    if expected is not None and len(fns) != expected:
        raise RuntimeError(
            f"load_image_filenames: got {len(fns)} images, expected "
            f"{expected}; {len(missing)} listed files missing from "
            f"{image_dir} (first few: {missing[:5]}). A partial image dir "
            f"would misalign every h5 index with its image.")
    return fns


def load_graphs(graphs_file: str, mode: str, num_im: int = -1,
                num_val_im: int = 0, filter_empty_rels: bool = True,
                filter_non_overlap: bool = False):
    """Split carving + per-image GT extraction (visual_genome.py:264-362)."""
    import h5py

    if mode not in ("train", "val", "test"):
        raise ValueError(mode)
    with h5py.File(graphs_file, "r") as h5:
        data_split = h5["split"][:]
        split_mask = data_split == (2 if mode == "test" else 0)
        split_mask &= h5["img_to_first_box"][:] >= 0
        if filter_empty_rels:
            split_mask &= h5["img_to_first_rel"][:] >= 0

        image_index = np.where(split_mask)[0]
        if num_im > -1:
            image_index = image_index[:num_im]
        if num_val_im > 0:
            if mode == "val":
                image_index = image_index[:num_val_im]
            elif mode == "train":
                image_index = image_index[num_val_im:]
        split_mask = np.zeros_like(data_split, bool)
        split_mask[image_index] = True

        labels = h5["labels"][:, 0]
        boxes_raw = h5[f"boxes_{C.BOX_SCALE}"][:]
        assert np.all(boxes_raw[:, :2] >= 0) and np.all(boxes_raw[:, 2:] > 0)
        # cx,cy,w,h -> x1,y1,x2,y2 IN THE NATIVE DTYPE: the h5 boxes are
        # int32 and the reference's in-place assignment
        # (visual_genome.py:314-316) truncates cx - w/2 to int for odd
        # widths — keep that bug-compatible 0.5px truncation or GT boxes
        # (and eval IoU matching) shift relative to the reference.
        boxes_raw[:, :2] = boxes_raw[:, :2] - boxes_raw[:, 2:] / 2
        boxes_raw[:, 2:] = boxes_raw[:, :2] + boxes_raw[:, 2:]
        boxes_raw = boxes_raw.astype(np.float32)

        first_box = h5["img_to_first_box"][split_mask]
        last_box = h5["img_to_last_box"][split_mask]
        first_rel = h5["img_to_first_rel"][split_mask]
        last_rel = h5["img_to_last_rel"][split_mask]
        relations = h5["relationships"][:]
        predicates = h5["predicates"][:, 0]

    boxes, gt_classes, rels_out = [], [], []
    for i in range(len(image_index)):
        b = boxes_raw[first_box[i]:last_box[i] + 1]
        cls = labels[first_box[i]:last_box[i] + 1]
        if first_rel[i] >= 0:
            pred = predicates[first_rel[i]:last_rel[i] + 1]
            obj_idx = relations[first_rel[i]:last_rel[i] + 1] - first_box[i]
            rels = np.column_stack((obj_idx, pred))
        else:
            assert not filter_empty_rels
            rels = np.zeros((0, 3), np.int32)

        if filter_non_overlap:
            assert mode == "train"
            iou = _np_iou(b, b)
            keep = np.where(iou[rels[:, 0], rels[:, 1]] > 0.0)[0]
            if keep.size == 0:
                split_mask[image_index[i]] = False
                continue
            rels = rels[keep]

        boxes.append(b)
        gt_classes.append(cls.astype(np.int32))
        rels_out.append(rels.astype(np.int32))
    return split_mask, boxes, gt_classes, rels_out


class VG:
    """Visual Genome dataset with the reference's __getitem__ semantics."""

    def __init__(self, mode: str, roidb_file: str = C.VG_SGG_FN,
                 dict_file: str = C.VG_SGG_DICT_FN, image_file: str = C.IM_DATA_FN,
                 image_dir: str = C.VG_IMAGES, filter_empty_rels: bool = True,
                 num_im: int = -1, num_val_im: int = 5000,
                 filter_duplicate_rels: bool = True, filter_non_overlap: bool = True,
                 use_proposals: bool = False, seed: int = 0):
        for fn in (roidb_file, dict_file, image_file):
            if not os.path.exists(fn):
                raise FileNotFoundError(
                    f"VG data file missing: {fn}. Set NM_TPU_DATA or use "
                    f"data.synthetic.SyntheticVG for dataless runs.")
        self.mode = mode
        self.filter_duplicate_rels = filter_duplicate_rels and mode == "train"
        self.split_mask, self.gt_boxes, self.gt_classes, self.relationships = \
            load_graphs(roidb_file, mode, num_im, num_val_im,
                        filter_empty_rels=filter_empty_rels,
                        filter_non_overlap=filter_non_overlap and self.is_train)
        fns = load_image_filenames(image_file, image_dir, expected=None)
        if len(fns) != len(self.split_mask):
            raise RuntimeError(
                f"image list ({len(fns)}) does not align with the h5 split "
                f"axis ({len(self.split_mask)}): files missing from "
                f"{image_dir} would shift every filename off its GT entry.")
        self.filenames = [fns[i] for i in np.where(self.split_mask)[0]]
        self.ind_to_classes, self.ind_to_predicates = load_info(dict_file)
        self.rng = np.random.RandomState(seed)

        self.rpn_rois = None
        if use_proposals:
            import h5py
            with h5py.File(C.PROPOSAL_FN, "r") as p:
                starts = np.array(p["im_to_roi_idx"][self.split_mask])
                counts = np.array(p["num_rois"][self.split_mask])
                rois = p["rpn_rois"][:]
                scores = p["rpn_scores"][:]
            self.rpn_rois = [np.column_stack((scores[s:s + c], rois[s:s + c]))
                             for s, c in zip(starts, counts)]

    @property
    def is_train(self):
        return self.mode == "train"

    @property
    def num_classes(self):
        return len(self.ind_to_classes)

    @property
    def num_predicates(self):
        return len(self.ind_to_predicates)

    def __len__(self):
        return len(self.filenames)

    @classmethod
    def splits(cls, *args, **kw):
        return (cls("train", *args, **kw), cls("val", *args, **kw),
                cls("test", *args, **kw))

    def __getitem__(self, index: int) -> dict:
        # native decode (csrc libjpeg path; byte-identical to PIL per the
        # one-time self-check in transforms._native_decode_ok). The lossy
        # NM_FAST_DECODE scaled path is eval-only: training GT clamp/flip
        # math derives from the decoded dims, so training always decodes
        # exactly.
        img = decode_image_rgb(self.filenames[index],
                               allow_fast=not self.is_train)
        gt_boxes = self.gt_boxes[index].copy()
        flipped = self.is_train and self.rng.random_sample() > 0.5

        if self.is_train:
            # clamp boxes that leak past the image (visual_genome.py:150-154)
            h, w = img.shape[:2]
            f = C.BOX_SCALE / max(w, h)
            gt_boxes[:, [1, 3]] = gt_boxes[:, [1, 3]].clip(None, f * h)
            gt_boxes[:, [0, 2]] = gt_boxes[:, [0, 2]].clip(None, f * w)

        h, w = img.shape[:2]
        if flipped:
            scaled_w = int(C.BOX_SCALE / max(w, h) * w)
            img = img[:, ::-1]
            gt_boxes[:, [0, 2]] = scaled_w - gt_boxes[:, [2, 0]]

        arr, img_size = square_pad_resize(img)

        gt_rels = self.relationships[index].copy()
        if self.filter_duplicate_rels and len(gt_rels):
            sets = defaultdict(list)
            for (s, o, p) in gt_rels:
                sets[(int(s), int(o))].append(int(p))
            gt_rels = np.array([(s, o, self.rng.choice(ps))
                                for (s, o), ps in sets.items()], np.int32)

        entry = {
            "img": arr,
            "img_size": img_size,
            "gt_boxes": gt_boxes,
            "gt_classes": self.gt_classes[index].copy(),
            "gt_relations": gt_rels,
            "scale": C.IM_SCALE / C.BOX_SCALE,
            "index": index,
            "flipped": flipped,
            "fn": self.filenames[index],
        }
        if self.rpn_rois is not None:
            entry["proposals"] = self.rpn_rois[index]
        return entry

    def image_sizes(self) -> np.ndarray:
        """[N, 2] original (h, w) per image, for aspect-bucketed serving
        (Loader im_buckets). Header-only parse (native libjpeg or PIL's
        lazy open) — no pixel decode; scanned once and cached."""
        if getattr(self, "_image_sizes", None) is None:
            from neural_motifs_tpu.runtime import jpeg_header

            sizes = np.zeros((len(self.filenames), 2), np.int64)
            for i, fn in enumerate(self.filenames):
                hdr = None
                try:
                    with open(fn, "rb") as f:
                        hdr = jpeg_header(f.read(65536))
                except OSError:
                    pass
                if hdr is not None:
                    sizes[i] = (hdr[1], hdr[0])
                else:
                    from PIL import Image

                    with Image.open(fn) as im:
                        sizes[i] = (im.size[1], im.size[0])
            self._image_sizes = sizes
        return self._image_sizes

    def coco_annotations(self):
        """Faux-COCO dict for detector mAP (visual_genome.py:102-127)."""
        from neural_motifs_tpu.data.adapters import faux_coco_annotations
        return faux_coco_annotations(self.gt_classes, self.gt_boxes,
                                     self.ind_to_classes)
