"""Validate a Visual Genome 'stanford filtered' data directory against the
invariants the reference loader assumes (dataloaders/visual_genome.py),
before committing to a training run.

Usage: NM_TPU_DATA=/path/to/data python tools/validate_vg_data.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from neural_motifs_tpu import config as C

    problems = []
    for fn in (C.VG_SGG_FN, C.VG_SGG_DICT_FN, C.IM_DATA_FN):
        if not os.path.exists(fn):
            problems.append(f"missing file: {fn}")
    if problems:
        for p in problems:
            print("FAIL:", p)
        return 1

    import h5py
    from neural_motifs_tpu.data.visual_genome import load_info

    ind_to_classes, ind_to_predicates = load_info(C.VG_SGG_DICT_FN)
    print(f"classes: {len(ind_to_classes)} (expect {C.VG_NUM_CLASSES}), "
          f"predicates: {len(ind_to_predicates)} (expect {C.VG_NUM_PREDICATES})")
    assert len(ind_to_classes) == C.VG_NUM_CLASSES
    assert len(ind_to_predicates) == C.VG_NUM_PREDICATES
    assert ind_to_classes[0] == "__background__"

    with h5py.File(C.VG_SGG_FN) as h5:
        split = h5["split"][:]
        print(f"images: {len(split)}; train/val pool: {(split == 0).sum()}, "
              f"test: {(split == 2).sum()}")
        boxes = h5[f"boxes_{C.BOX_SCALE}"][:]
        assert np.all(boxes[:, :2] >= 0), "negative box centers"
        assert np.all(boxes[:, 2:] > 0), "empty boxes"
        labels = h5["labels"][:, 0]
        assert labels.min() >= 1 and labels.max() < C.VG_NUM_CLASSES
        preds = h5["predicates"][:, 0]
        assert preds.min() >= 1 and preds.max() < C.VG_NUM_PREDICATES
        fb, lb = h5["img_to_first_box"][:], h5["img_to_last_box"][:]
        n_boxes = np.where(fb >= 0, lb - fb + 1, 0)
        fr, lr = h5["img_to_first_rel"][:], h5["img_to_last_rel"][:]
        n_rels = np.where(fr >= 0, lr - fr + 1, 0)
        print(f"boxes/img: p50={np.percentile(n_boxes[n_boxes>0], 50):.0f} "
              f"p99={np.percentile(n_boxes[n_boxes>0], 99):.0f} "
              f"max={n_boxes.max()}")
        print(f"rels/img:  p50={np.percentile(n_rels[n_rels>0], 50):.0f} "
              f"p99={np.percentile(n_rels[n_rels>0], 99):.0f} "
              f"max={n_rels.max()}")
        from neural_motifs_tpu.config import PadBudgets
        b = PadBudgets()
        clipped_boxes = (n_boxes > b.max_gt_boxes).mean()
        clipped_rels = (n_rels > b.max_gt_rels).mean()
        print(f"budget check: {clipped_boxes:.2%} images exceed "
              f"max_gt_boxes={b.max_gt_boxes}, {clipped_rels:.2%} exceed "
              f"max_gt_rels={b.max_gt_rels}")

    from neural_motifs_tpu.data.visual_genome import load_image_filenames
    fns = load_image_filenames(C.IM_DATA_FN, C.VG_IMAGES)
    print(f"image files found: {len(fns)} (reference expects 108073)")
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
