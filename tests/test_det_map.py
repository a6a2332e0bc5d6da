"""Tests for the self-contained COCO-style detection mAP
(evaluation/det_map.py) — the pycocotools-free validation metric for
detector pretraining (reference models/train_detector.py:158-181)."""

import numpy as np
import pytest

from neural_motifs_tpu.evaluation.det_map import coco_map


def _ds(images, categories, annotations):
    return {"images": [{"id": i} for i in images],
            "categories": [{"id": c} for c in categories],
            "annotations": annotations}


def _ann(img, cat, box):
    return {"image_id": img, "category_id": cat, "bbox": list(map(float, box))}


def _dt(img, cat, box, score):
    return {"image_id": img, "category_id": cat,
            "bbox": list(map(float, box)), "score": float(score)}


def test_perfect_predictions_ap_one():
    gt = _ds([0, 1], [1, 2], [
        _ann(0, 1, (10, 10, 20, 20)), _ann(0, 2, (50, 50, 30, 10)),
        _ann(1, 1, (0, 0, 5, 8)),
    ])
    results = [_dt(0, 1, (10, 10, 20, 20), 0.9),
               _dt(0, 2, (50, 50, 30, 10), 0.8),
               _dt(1, 1, (0, 0, 5, 8), 0.7)]
    out = coco_map(gt, results)
    assert out["map_50"] == pytest.approx(1.0)
    assert out["map"] == pytest.approx(1.0)


def test_handcomputed_pr_curve():
    """2 GT, dts (by score): TP, FP, TP -> 101-pt AP@.5 =
    (51*1 + 50*(2/3)) / 101."""
    gt = _ds([0, 1], [1], [_ann(0, 1, (0, 0, 10, 10)),
                           _ann(1, 1, (0, 0, 10, 10))])
    results = [_dt(0, 1, (0, 0, 10, 10), 0.9),          # TP
               _dt(0, 1, (50, 50, 10, 10), 0.8),        # FP
               _dt(1, 1, (0, 0, 10, 10), 0.7)]          # TP
    out = coco_map(gt, results)
    expected = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert out["map_50"] == pytest.approx(expected, abs=1e-9)


def test_duplicate_detection_is_fp():
    """Two dts on the same GT: the lower-scored one is a false positive;
    with a second unmatched GT the recall caps at 0.5."""
    gt = _ds([0], [1], [_ann(0, 1, (0, 0, 10, 10)),
                        _ann(0, 1, (100, 100, 10, 10))])
    results = [_dt(0, 1, (0, 0, 10, 10), 0.9),
               _dt(0, 1, (0.5, 0, 10, 10), 0.8)]        # dup, IoU ~0.9
    out = coco_map(gt, results)
    assert out["map_50"] == pytest.approx(51 / 101, abs=1e-9)


def test_iou_threshold_sensitivity():
    """A det at IoU ~0.6 counts at t=0.5 but not at t>=0.65, so
    map < map_50."""
    gt = _ds([0], [1], [_ann(0, 1, (0, 0, 10, 10))])
    # shift by 2.4px: inter 7.6*10=76, union 124 -> IoU ~0.613
    results = [_dt(0, 1, (2.4, 0, 10, 10), 0.9)]
    out = coco_map(gt, results)
    assert out["map_50"] == pytest.approx(1.0)
    # matched at t in {.5,.55,.6}: 3 of 10 thresholds
    assert out["map"] == pytest.approx(0.3)


def test_empty_category_excluded_from_mean():
    gt = _ds([0], [1, 2], [_ann(0, 1, (0, 0, 10, 10))])
    results = [_dt(0, 1, (0, 0, 10, 10), 0.9),
               _dt(0, 2, (5, 5, 10, 10), 0.8)]  # cat 2 has no GT
    out = coco_map(gt, results)
    assert out["map_50"] == pytest.approx(1.0)
    assert out["per_category"][2] is None


def test_no_detections_zero_ap():
    gt = _ds([0], [1], [_ann(0, 1, (0, 0, 10, 10))])
    assert coco_map(gt, [])["map_50"] == 0.0


def test_score_ordering_matters():
    """Same det set: putting the FP above the TP lowers AP."""
    gt = _ds([0], [1], [_ann(0, 1, (0, 0, 10, 10))])
    tp, fp = (0, 0, 10, 10), (50, 50, 10, 10)
    hi = coco_map(gt, [_dt(0, 1, tp, 0.9), _dt(0, 1, fp, 0.1)])["map_50"]
    lo = coco_map(gt, [_dt(0, 1, tp, 0.1), _dt(0, 1, fp, 0.9)])["map_50"]
    assert hi == pytest.approx(1.0)
    assert lo == pytest.approx(0.5)
    assert hi > lo


def test_differential_vs_bruteforce_random():
    """Randomized scenes vs an independent O(everything) oracle that
    re-derives AP from the raw PR points."""
    rng = np.random.RandomState(0)
    for trial in range(5):
        n_img, n_cat = 4, 3
        anns, results = [], []
        for img in range(n_img):
            for cat in range(1, n_cat + 1):
                for _ in range(rng.randint(0, 4)):
                    anns.append(_ann(img, cat, (*rng.uniform(0, 80, 2),
                                                *rng.uniform(5, 30, 2))))
                for _ in range(rng.randint(0, 5)):
                    results.append(_dt(img, cat, (*rng.uniform(0, 80, 2),
                                                  *rng.uniform(5, 30, 2)),
                                       rng.rand()))
        # some dts exactly on GT so TPs exist
        for a in anns[::2]:
            results.append(_dt(a["image_id"], a["category_id"], a["bbox"],
                               rng.rand()))
        gt = _ds(list(range(n_img)), list(range(1, n_cat + 1)), anns)
        out = coco_map(gt, results)
        assert out["map_50"] == pytest.approx(
            _oracle_map50(gt, results), abs=1e-9), f"trial {trial}"


def _oracle_iou(a, b):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def _oracle_map50(gt, results):
    """Plain-loop AP@0.5 mean over categories with GT."""
    cats = sorted({a["category_id"] for a in gt["annotations"]})
    aps = []
    for cat in cats:
        flags, scores, n_gt = [], [], 0
        for img in [im["id"] for im in gt["images"]]:
            gts = [a["bbox"] for a in gt["annotations"]
                   if a["image_id"] == img and a["category_id"] == cat]
            n_gt += len(gts)
            dts = sorted([r for r in results if r["image_id"] == img
                          and r["category_id"] == cat],
                         key=lambda r: -r["score"])[:100]
            used = [False] * len(gts)
            for d in dts:
                ious = [(-1.0 if used[i] else _oracle_iou(d["bbox"], g))
                        for i, g in enumerate(gts)]
                best = int(np.argmax(ious)) if ious else -1
                ok = best >= 0 and ious[best] >= 0.5
                if ok:
                    used[best] = True
                flags.append(ok)
                scores.append(d["score"])
        if n_gt == 0:
            continue
        order = np.argsort(-np.asarray(scores), kind="mergesort")
        f = np.asarray(flags)[order]
        tp, fp = np.cumsum(f), np.cumsum(~f)
        rec = tp / n_gt
        prec = tp / np.maximum(tp + fp, 1e-12)
        for i in range(len(prec) - 1, 0, -1):
            prec[i - 1] = max(prec[i - 1], prec[i])
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            idx = np.searchsorted(rec, r, side="left")
            ap += prec[idx] if idx < len(prec) else 0.0
        aps.append(ap / 101)
    return float(np.mean(aps)) if aps else 0.0
