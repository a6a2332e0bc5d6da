"""Qualitative scene-graph visualization (equivalent of reference
models/_visualize.py): draws predicted boxes + top-k relationship triples
onto the image with PIL and writes a side-car text graph. No matplotlib
dependency."""

from __future__ import annotations

import os

import numpy as np

from neural_motifs_tpu import config as C

_COLORS = [(230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
           (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
           (210, 245, 60), (250, 190, 190)]


def draw_scene_graph(image, entry: dict, ind_to_classes, ind_to_predicates,
                     out_path: str, top_k_rels: int = 20,
                     score_thresh: float = 0.1):
    """image: PIL image or [H, W, 3] uint8 array; entry: an evaluator
    pred_entry (pred_boxes at BOX_SCALE, pred_classes, obj_scores,
    pred_rel_inds, rel_scores)."""
    from PIL import Image, ImageDraw

    if not hasattr(image, "convert"):
        image = Image.fromarray(np.asarray(image, np.uint8))
    img = image.convert("RGB").copy()
    draw = ImageDraw.Draw(img)
    sf = max(img.size) / C.BOX_SCALE

    boxes = np.asarray(entry["pred_boxes"]) * sf
    classes = np.asarray(entry["pred_classes"])
    scores = np.asarray(entry.get("obj_scores", np.ones(len(classes))))

    shown = set()
    lines = []
    rel_inds = np.asarray(entry["pred_rel_inds"])[:top_k_rels]
    rel_scores = np.asarray(entry["rel_scores"])[:top_k_rels]
    for (s, o), rs in zip(rel_inds, rel_scores):
        p = int(rs[1:].argmax()) + 1
        if rs[p] < score_thresh:
            continue
        shown.update((int(s), int(o)))
        lines.append(f"{ind_to_classes[classes[s]]} --{ind_to_predicates[p]}"
                     f"--> {ind_to_classes[classes[o]]}  ({rs[p]:.2f})")

    for i in sorted(shown):
        color = _COLORS[i % len(_COLORS)]
        x1, y1, x2, y2 = boxes[i]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=3)
        label = f"{ind_to_classes[classes[i]]} {scores[i]:.2f}"
        draw.text((x1 + 2, max(0, y1 - 12)), label, fill=color)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    img.save(out_path)
    with open(os.path.splitext(out_path)[0] + ".txt", "w") as f:
        f.write("\n".join(lines))
    return lines


def _cli(argv=None):
    """Render scene graphs to PNG + side-car text (reference
    models/_visualize.py as a script). Default: GT graphs of the first N
    val images; -cache <pkl> renders the predictions saved by
    eval_rels -cache."""
    import argparse
    import pickle

    p = argparse.ArgumentParser(description="scene-graph figure generator")
    p.add_argument("-n", type=int, default=8)
    p.add_argument("-out", default="qualitative")
    p.add_argument("-cache", default=None,
                   help="prediction pickle from eval_rels -cache")
    a = p.parse_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        ds = VG("val")
    except FileNotFoundError as e:
        print(f"[visualize] {e}\nFalling back to SyntheticVG.")
        from neural_motifs_tpu.data.synthetic import SyntheticVG
        ds = SyntheticVG(max(8, a.n), "val")

    entries = None
    if a.cache:
        with open(a.cache, "rb") as f:
            entries = pickle.load(f)

    for i in range(min(a.n, len(ds))):
        item = ds[i]
        img = ((item["img"] - item["img"].min()) /
               max(float(np.ptp(item["img"])), 1e-6) * 255).astype(np.uint8)
        if entries is not None:
            entry = entries[i]
        else:
            rels = item["gt_relations"]
            nrel = len(rels)
            npred = ds.num_predicates
            rel_scores = np.zeros((nrel, npred), np.float32)
            rel_scores[np.arange(nrel), rels[:, 2]] = 1.0
            entry = {
                "pred_boxes": item["gt_boxes"],
                "pred_classes": item["gt_classes"],
                "obj_scores": np.ones(len(item["gt_classes"]), np.float32),
                "pred_rel_inds": rels[:, :2],
                "rel_scores": rel_scores,
            }
        lines = draw_scene_graph(img, entry, ds.ind_to_classes,
                                 ds.ind_to_predicates,
                                 os.path.join(a.out, f"scene_{i:04d}.png"))
        print(f"scene_{i:04d}: {len(lines)} triples")


if __name__ == "__main__":
    _cli()
