"""Scene-graph prediction on arbitrary images — the serving entry point.

The reference has no custom-image path: `models/eval_rels.py` only walks the
VG splits and `models/_visualize.py` draws VG ground truth. This tool is the
missing production story — it composes the framework's serving pieces
(native JPEG decode + PIL-bit-exact resize in data/transforms.py, aspect
buckets via `-im_budget auto`, uint8 upload with in-graph normalize,
device_prefetch, pair compaction, optional NM_QUANT=int8) into one command
that runs SGDet over any directory of images and writes a JSON scene graph
per image, plus optional rendered visualizations.

Usage:
  python -m tools.predict -images /path/to/dir_or_files... \
      -ckpt vgrel-motifnet-sgdet.tar -dicts VG-SGG-dicts.json \
      -b 8 -im_budget auto -out predictions.json [-viz out_dir] [-topk 50]

Every `ModelConfig` flag works (`-model stanford`, `-hidden_dim`, ...).
Without `-ckpt`/`-dicts` it runs a randomly-initialized model with generic
class names — a pipeline smoke/demo mode, not meaningful predictions.

Output (one record per input image):
  {"file", "height", "width",
   "objects":   [{"id", "label", "score", "box": [x1, y1, x2, y2]}, ...],
   "relations": [{"subject", "object", "predicate", "score"}, ...]}
with boxes in ORIGINAL image pixel coordinates and relations referencing
object ids, ordered by the model's triplet score (lib/surgery.py:21-59
semantics); `id` is the detector slot so records are cross-referenceable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolder:
    """Dataset over arbitrary image files (entry layout of
    data/visual_genome.py VG.__getitem__, with empty GT)."""

    is_train = False

    def __init__(self, paths):
        self.paths = list(paths)
        self._sizes = None

    def __len__(self):
        return len(self.paths)

    def image_sizes(self) -> np.ndarray:
        """[N, 2] original (h, w); header-only parse (native libjpeg fast
        path, PIL lazy-open fallback) so `-im_budget auto` never decodes
        pixels twice."""
        if self._sizes is None:
            from neural_motifs_tpu.runtime import jpeg_header

            sizes = np.zeros((len(self.paths), 2), np.int64)
            for i, fn in enumerate(self.paths):
                hdr = None
                if fn.lower().endswith((".jpg", ".jpeg")):
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
            self._sizes = sizes
        return self._sizes

    def __getitem__(self, index):
        from neural_motifs_tpu import config as C
        from neural_motifs_tpu.data.transforms import (decode_image_rgb,
                                                       square_pad_resize)

        img = decode_image_rgb(self.paths[index])
        arr, img_size = square_pad_resize(img)
        return {
            "img": arr,
            "img_size": img_size,
            "gt_boxes": np.zeros((0, 4), np.float32),
            "gt_classes": np.zeros((0,), np.int64),
            "gt_relations": np.zeros((0, 3), np.int32),
            "scale": C.IM_SCALE / C.BOX_SCALE,
            "index": index,
            "flipped": False,
            "fn": self.paths[index],
        }


class Taxonomy:
    """Class/predicate names for model construction; len()==0 so the
    frequency-bias table initializes flat (a real `-ckpt` restores the
    trained `freq_bias` param over it)."""

    def __init__(self, ind_to_classes, ind_to_predicates):
        self.ind_to_classes = list(ind_to_classes)
        self.ind_to_predicates = list(ind_to_predicates)
        self.gt_classes, self.relationships, self.gt_boxes = [], [], []

    def __len__(self):
        return 0

    @property
    def num_classes(self):
        return len(self.ind_to_classes)

    @property
    def num_predicates(self):
        return len(self.ind_to_predicates)


def expand_image_paths(specs) -> list[str]:
    paths = []
    for spec in specs:
        if os.path.isdir(spec):
            paths.extend(
                os.path.join(spec, f) for f in sorted(os.listdir(spec))
                if f.lower().endswith(IMG_EXTS))
        elif os.path.exists(spec):
            paths.append(spec)
        else:
            raise FileNotFoundError(f"no such image or directory: {spec}")
    if not paths:
        raise FileNotFoundError(f"no images found under {specs}")
    return paths


def load_taxonomy(dicts_path: str | None) -> Taxonomy:
    from neural_motifs_tpu import config as C

    if dicts_path:
        from neural_motifs_tpu.data.visual_genome import load_info

        classes, predicates = load_info(dicts_path)
        return Taxonomy(classes, predicates)
    print("[predict] no -dicts given: using generic class names "
          "(pass VG-SGG-dicts.json for real labels)", flush=True)
    return Taxonomy(
        ["__background__"] + [f"class_{i}" for i in range(1, C.VG_NUM_CLASSES)],
        ["__background__"] + [f"rel_{i}" for i in range(1, C.VG_NUM_PREDICATES)])


def entry_to_record(entry: dict, path: str, orig_hw, topk: int) -> dict:
    """Evaluator pred_entry -> JSON record in original pixel coordinates.
    pred_boxes arrive at BOX_SCALE (prediction_to_entries), so the factor
    back to pixels is max(orig_h, orig_w)/BOX_SCALE — the same `sf` the
    visualizer uses (analysis/visualize.py)."""
    from neural_motifs_tpu import config as C

    h, w = int(orig_hw[0]), int(orig_hw[1])
    sf = max(h, w) / C.BOX_SCALE
    valid = np.asarray(entry["obj_valid"]).astype(bool)
    boxes = np.asarray(entry["pred_boxes"]) * sf
    classes = np.asarray(entry["pred_classes"])
    scores = np.asarray(entry["obj_scores"])

    objects = [{
        "id": int(i),
        "label": int(classes[i]),
        "score": float(scores[i]),
        "box": [float(v) for v in boxes[i]],
    } for i in np.nonzero(valid)[0]]

    rel_inds = np.asarray(entry["pred_rel_inds"])
    rel_scores = np.asarray(entry["rel_scores"])
    relations = []
    for k in range(min(topk, len(rel_inds))):
        s, o = int(rel_inds[k, 0]), int(rel_inds[k, 1])
        if not (valid[s] and valid[o]):
            continue
        p = int(rel_scores[k, 1:].argmax()) + 1   # 0 = __background__
        relations.append({
            "subject": s, "object": o, "predicate": p,
            "score": float(rel_scores[k, p]),
        })
    return {"file": path, "height": h, "width": w,
            "objects": objects, "relations": relations}


def label_names(record: dict, taxonomy: Taxonomy) -> dict:
    """Replace integer labels with taxonomy names (records keep ints so the
    JSON is stable under taxonomy renames; this is for human output)."""
    out = dict(record)
    out["objects"] = [dict(o, label=taxonomy.ind_to_classes[o["label"]])
                      for o in record["objects"]]
    out["relations"] = [
        dict(r, predicate=taxonomy.ind_to_predicates[r["predicate"]])
        for r in record["relations"]]
    return out


def main(argv=None):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("-images", nargs="+", required=True,
                   help="image files and/or directories")
    p.add_argument("-out", default="predictions.json")
    p.add_argument("-viz", default="", help="directory for rendered graphs")
    p.add_argument("-dicts", default="", help="VG-SGG-dicts.json for labels")
    p.add_argument("-topk", type=int, default=50, help="relations per image")
    p.add_argument("-names", action="store_true",
                   help="write label NAMES instead of class indices")
    mine, rest = p.parse_known_args(argv)

    import jax

    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.batching import (Loader, device_prefetch,
                                                 loader_im_kw)
    from neural_motifs_tpu.models.rel_model import prediction_to_entries
    from neural_motifs_tpu.parallel.mesh import (make_mesh, replicated,
                                                 shard_batch)
    from neural_motifs_tpu.training import checkpoint as ckpt_lib
    from neural_motifs_tpu.training.train_rels import batch_kwargs, build_model

    cfg = C.ModelConfig.from_args(rest)
    if cfg.mode != "sgdet":
        raise SystemExit("tools/predict.py runs detection + relations on raw "
                         "images: only -m sgdet makes sense here "
                         f"(got -m {cfg.mode})")
    taxonomy = load_taxonomy(mine.dicts)
    data = ImageFolder(expand_image_paths(mine.images))
    print(f"[predict] {len(data)} images", flush=True)

    model = build_model(cfg, taxonomy)
    loader = Loader(data, cfg.batch_size * cfg.num_devices, shuffle=False,
                    budgets=cfg.budgets, num_workers=cfg.num_workers,
                    drop_last=False, **loader_im_kw(cfg))
    example = loader.peek()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)},
                           train=True, **batch_kwargs(example))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if cfg.ckpt:
        params, batch_stats = ckpt_lib.restore_rel_variables(cfg, params,
                                                             batch_stats)
    else:
        print("[predict] WARNING: no -ckpt — random weights, demo only",
              flush=True)

    eval_fn = jax.jit(lambda p, bs, kw: model.apply(
        {"params": p, "batch_stats": bs}, train=False,
        rngs={"sample": jax.random.PRNGKey(0)}, **kw))

    mesh = make_mesh(num_data=cfg.num_devices)
    if mesh.size > 1:
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        batch_stats = jax.device_put(batch_stats, repl)

    sizes = data.image_sizes()
    records = {}

    def consume(batch, pred):
        pred = jax.device_get(pred)
        for i, entry in enumerate(prediction_to_entries(pred)):
            idx = int(batch.image_ids[i])
            if idx < 0 or idx in records:   # -1 = tail-pad repeat
                continue
            records[idx] = entry_to_record(entry, data.paths[idx],
                                           sizes[idx], mine.topk)
            if mine.viz:
                from neural_motifs_tpu.analysis.visualize import \
                    draw_scene_graph
                from neural_motifs_tpu.data.transforms import decode_image_rgb

                os.makedirs(mine.viz, exist_ok=True)
                stem = os.path.splitext(os.path.basename(data.paths[idx]))[0]
                draw_scene_graph(decode_image_rgb(data.paths[idx]), entry,
                                 taxonomy.ind_to_classes,
                                 taxonomy.ind_to_predicates,
                                 os.path.join(mine.viz, f"{stem}.png"),
                                 top_k_rels=mine.topk)

    # same overlap discipline as eval_rels: dispatch batch k+1, then fetch
    # and post-process batch k while the device computes
    pending = None
    for batch, kw in device_prefetch(
            loader, lambda b: batch_kwargs(shard_batch(b, mesh))):
        pred = eval_fn(params, batch_stats, kw)
        if pending is not None:
            consume(*pending)
        pending = (batch, pred)
    if pending is not None:
        consume(*pending)

    out = [records[i] for i in sorted(records)]
    if mine.names:
        out = [label_names(r, taxonomy) for r in out]
    with open(mine.out, "w") as f:
        json.dump(out, f, indent=1)
    n_obj = sum(len(r["objects"]) for r in out)
    n_rel = sum(len(r["relations"]) for r in out)
    print(f"[predict] wrote {len(out)} records ({n_obj} objects, "
          f"{n_rel} relations) -> {mine.out}", flush=True)
    return out


if __name__ == "__main__":
    main()
