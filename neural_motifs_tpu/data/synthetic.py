"""Synthetic VG-like datasets for tests and benchmarks (no data files on
this machine — real VG loading lives in data/visual_genome.py with identical
entry schema).

Two generators:

* ``SyntheticVG`` — uniform-random scenes. Shapes/schema are VG-like but the
  labels are unlearnable by construction (pure noise); used for plumbing
  smoke tests and benchmarks.
* ``StructuredSyntheticVG`` — LEARNABLE scenes: object classes are keyed to
  distinct fill colors (appearance -> class is learnable by the conv
  backbone, the task of reference models/train_detector.py) and every
  predicate is a deterministic, margin-gated function of the two boxes'
  geometry (geometry -> predicate is learnable by the relation heads, the
  task of reference models/train_rels.py). Training MotifNet on this data
  to R@20 ~= 1 with the real evaluator is the end-to-end proof that the
  train -> decode -> eval chain works, which no unlearnable dataset can
  provide.
"""

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


# ---------------------------------------------------------------------------
# Structured (learnable) synthetic scenes
# ---------------------------------------------------------------------------

# Geometric predicate ids (1-based; 0 = background). Each is a deterministic
# margin-gated function of the (sub, obj) box pair, mutually exclusive by
# construction: left/right need an x-gap AND y-band overlap, above/below a
# y-gap AND x-band overlap (a pair cannot have both a y-gap and y-overlap),
# inside/contains need full containment (no gap at all).
STRUCT_PREDICATES = ("__background__", "left_of", "right_of", "above",
                     "below", "inside", "contains")
_P_LEFT, _P_RIGHT, _P_ABOVE, _P_BELOW, _P_INSIDE, _P_CONTAINS = range(1, 7)


def _hsv_to_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]


def class_palette(num_fg: int) -> np.ndarray:
    """[num_fg, 3] float RGB in [0, 1], one well-separated color per
    foreground class (golden-ratio hue stepping with alternating
    saturation/value tiers keeps up to ~48 classes distinguishable)."""
    tiers = [(0.95, 0.95), (0.50, 0.95), (0.95, 0.55), (0.50, 0.60)]
    per_tier = -(-num_fg // len(tiers))
    colors = np.zeros((num_fg, 3), np.float32)
    for k in range(num_fg):
        s, v = tiers[k % len(tiers)]
        # evenly-spaced hues within each (s, v) tier: within-tier RGB
        # distance is bounded below by the hue step, across tiers by the
        # 0.4+ saturation/value gap
        h = ((k // len(tiers)) / per_tier + 0.09 * (k % len(tiers))) % 1.0
        colors[k] = _hsv_to_rgb(h, s, v)
    return colors


def geometric_predicate(sub: np.ndarray, obj: np.ndarray,
                        margin: float = 0.03) -> int:
    """Predicate id for an ordered box pair in UNIT coords (0 = none).
    margin is the minimum gap/overlap/inset, as a fraction of the image
    side, so labels never hinge on a near-tie."""
    sx1, sy1, sx2, sy2 = sub
    ox1, oy1, ox2, oy2 = obj
    # containment first (no gap exists for contained pairs)
    if (sx1 >= ox1 + margin and sy1 >= oy1 + margin
            and sx2 <= ox2 - margin and sy2 <= oy2 - margin):
        return _P_INSIDE
    if (ox1 >= sx1 + margin and oy1 >= sy1 + margin
            and ox2 <= sx2 - margin and oy2 <= sy2 - margin):
        return _P_CONTAINS
    y_overlap = min(sy2, oy2) - max(sy1, oy1)
    x_overlap = min(sx2, ox2) - max(sx1, ox1)
    if y_overlap >= margin:
        if ox1 - sx2 >= margin:
            return _P_LEFT
        if sx1 - ox2 >= margin:
            return _P_RIGHT
    if x_overlap >= margin:
        if oy1 - sy2 >= margin:
            return _P_ABOVE
        if sy1 - oy2 >= margin:
            return _P_BELOW
    return 0


def sample_structured_scene(rng: np.random.RandomState, num_fg_classes: int,
                            min_objs: int = 4, max_objs: int = 8,
                            p_child: float = 0.7, margin: float = 0.03,
                            box_range: tuple = (0.13, 0.32)):
    """One scene in UNIT coords: (boxes [n,4], classes [n], rels [r,3]).

    Base boxes are rejection-sampled to near-disjoint (pairwise IoU < 0.05)
    so per-class NMS can't merge distinct GT objects; with prob p_child one
    extra object is placed strictly INSIDE a large base box (the only
    overlapping pairs, feeding the inside/contains predicates). A child's
    class always differs from its parent's so same-class NMS (decoder
    leave-one-out at IoU 0.3, reference decoder_rnn.py:229-247) never
    suppresses a GT pair endpoint."""
    n = rng.randint(min_objs, max_objs + 1)
    boxes = []
    for _ in range(n):
        for _try in range(40):
            w, h = rng.uniform(box_range[0], box_range[1], 2)
            x1 = rng.uniform(0.01, 0.97 - w)
            y1 = rng.uniform(0.01, 0.97 - h)
            cand = np.array([x1, y1, x1 + w, y1 + h], np.float32)
            ok = True
            for b in boxes:
                ix = max(0.0, min(cand[2], b[2]) - max(cand[0], b[0]))
                iy = max(0.0, min(cand[3], b[3]) - max(cand[1], b[1]))
                inter = ix * iy
                union = (w * h + (b[2] - b[0]) * (b[3] - b[1]) - inter)
                if inter / union > 0.05:
                    ok = False
                    break
            if ok:
                boxes.append(cand)
                break
    if not boxes:  # large box_range can exhaust the disjointness retries
        w, h = box_range
        boxes = [np.array([0.1, 0.1, 0.1 + w, 0.1 + h], np.float32)]
    boxes = np.stack(boxes)
    classes = rng.randint(1, num_fg_classes + 1, len(boxes)).astype(np.int32)
    if rng.rand() < p_child:
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        big = np.nonzero((boxes[:, 2] - boxes[:, 0] > 0.2)
                         & (boxes[:, 3] - boxes[:, 1] > 0.2))[0]
        if len(big):
            parent = int(rng.choice(big))
            px1, py1, px2, py2 = boxes[parent]
            pw, ph = px2 - px1, py2 - py1
            cw, ch = pw * rng.uniform(0.35, 0.5), ph * rng.uniform(0.35, 0.5)
            cx1 = rng.uniform(px1 + margin + 0.01, px2 - margin - 0.01 - cw)
            cy1 = rng.uniform(py1 + margin + 0.01, py2 - margin - 0.01 - ch)
            child = np.array([cx1, cy1, cx1 + cw, cy1 + ch], np.float32)
            ccls = rng.randint(1, num_fg_classes + 1)
            while ccls == classes[parent]:
                ccls = rng.randint(1, num_fg_classes + 1)
            boxes = np.concatenate([boxes, child[None]], 0)
            classes = np.concatenate([classes, [ccls]]).astype(np.int32)
            del areas
    rels = []
    for i in range(len(boxes)):
        for j in range(len(boxes)):
            if i == j:
                continue
            p = geometric_predicate(boxes[i], boxes[j], margin)
            if p:
                rels.append((i, j, p))
    rels = (np.array(rels, np.int32) if rels
            else np.zeros((0, 3), np.int32))
    return boxes, classes, rels


def render_scene(boxes_unit: np.ndarray, classes: np.ndarray, size_hw,
                 palette: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """[H, W, 3] uint8: solid class-colored rectangles over a noisy gray
    background, larger boxes drawn first so contained children stay
    visible. Mild per-object brightness jitter + pixel noise so the
    backbone can't overfit to exact byte values."""
    h, w = size_hw
    img = np.full((h, w, 3), 178.0, np.float32)
    img += rng.randn(h, w, 3).astype(np.float32) * 6.0
    order = np.argsort(-((boxes_unit[:, 2] - boxes_unit[:, 0])
                         * (boxes_unit[:, 3] - boxes_unit[:, 1])))
    for i in order:
        x1, y1, x2, y2 = boxes_unit[i]
        xi1, yi1 = int(round(x1 * w)), int(round(y1 * h))
        xi2, yi2 = max(int(round(x2 * w)), xi1 + 2), max(int(round(y2 * h)), yi1 + 2)
        color = palette[classes[i] - 1] * 255.0
        jitter = 1.0 + rng.uniform(-0.06, 0.06)
        img[yi1:yi2, xi1:xi2] = color * jitter
        # darker 1px border: a localization cue for box-edge regression
        edge = np.clip(color * jitter * 0.45, 0, 255)
        img[yi1:yi2, xi1:xi1 + 1] = edge
        img[yi1:yi2, xi2 - 1:xi2] = edge
        img[yi1:yi1 + 1, xi1:xi2] = edge
        img[yi2 - 1:yi2, xi1:xi2] = edge
    img += rng.randn(h, w, 3).astype(np.float32) * 2.0
    return np.clip(img, 0, 255).astype(np.uint8)


class StructuredSyntheticVG:
    """Learnable synthetic scenes with the VG entry schema (drop-in for the
    Loader and every entry point; see module docstring).

    `num_classes`/`num_predicates` set the TAXONOMY size (the model's label
    spaces — e.g. full VG scale 151/51 for audits); `num_fg_classes` caps
    which class ids actually occur (<= num_classes - 1), so a VG-scale model
    can train on a learnable subspace. Predicates always occupy ids 1..6
    (STRUCT_PREDICATES); num_predicates only pads the label space."""

    def __init__(self, num_images: int = 64, mode: str = "train", seed: int = 0,
                 num_classes: int = 16, num_predicates: int = len(STRUCT_PREDICATES),
                 num_fg_classes: int | None = None, im_size: int | None = None,
                 min_objs: int = 4, max_objs: int = 8, margin: float = 0.03,
                 box_range: tuple = (0.13, 0.32)):
        assert num_predicates >= len(STRUCT_PREDICATES)
        self.mode = mode
        self.num_images = num_images
        self.im_size = im_size or C.IM_SCALE
        self.margin = margin
        n_fg = num_fg_classes or (num_classes - 1)
        assert 1 <= n_fg <= num_classes - 1
        self.num_fg_classes = n_fg
        self.palette = class_palette(n_fg)
        self.ind_to_classes = (["__background__"]
                               + [f"color_{i}" for i in range(1, num_classes)])
        self.ind_to_predicates = list(STRUCT_PREDICATES) + [
            f"pad_pred_{i}" for i in range(len(STRUCT_PREDICATES), num_predicates)]
        # split-disjoint seeds: val/test scenes are new draws from the same
        # distribution (generalization, not memorization, drives their R@K)
        rng = np.random.RandomState(seed + {"train": 0, "val": 7919,
                                            "test": 104729}[mode])
        self.gt_boxes, self.gt_classes, self.relationships = [], [], []
        for _ in range(num_images):
            b, c, r = sample_structured_scene(rng, n_fg, min_objs, max_objs,
                                              margin=margin,
                                              box_range=box_range)
            self.gt_boxes.append((b * C.BOX_SCALE).astype(np.float32))
            self.gt_classes.append(c)
            self.relationships.append(r)
        self._render_seed = seed + 31337

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
        return np.full((self.num_images, 2), self.im_size, np.int64)

    def __getitem__(self, index: int) -> dict:
        # render deterministically per index (same image every epoch)
        rng = np.random.RandomState(self._render_seed + index)
        s = self.im_size
        img = render_scene(self.gt_boxes[index] / C.BOX_SCALE,
                           self.gt_classes[index], (s, s), self.palette, rng)
        return {
            "img": img,
            "img_size": (s, s, s / C.BOX_SCALE),
            "gt_boxes": self.gt_boxes[index].copy(),
            "gt_classes": self.gt_classes[index].copy(),
            "gt_relations": self.relationships[index].copy(),
            "scale": s / C.BOX_SCALE,
            "index": index,
            "flipped": False,   # no flip: left_of/right_of are chiral
        }

    def coco_annotations(self):
        from neural_motifs_tpu.data.adapters import faux_coco_annotations
        return faux_coco_annotations(self.gt_classes, self.gt_boxes,
                                     self.ind_to_classes)

    @classmethod
    def splits(cls, num_images=64, val_images=None, **kw):
        nv = val_images or max(8, num_images // 4)
        return (cls(num_images, "train", **kw), cls(nv, "val", **kw),
                cls(nv, "test", **kw))


def structured_batch_dicts(dataset: StructuredSyntheticVG, indices,
                           budgets: C.PadBudgets | None = None) -> dict:
    """Render + pad a batch of scenes into the kwargs dict the models take
    (images uint8, boxes at the dataset's rendered-image coords). Bypasses
    the Loader so tiny-image configs (im_size != IM_SCALE) work — the
    Loader's collate assumes IM_SCALE rendering. IoU-based eval stays
    consistent at any render size because predictions and GT are scaled by
    the same constant (prediction_to_entries)."""
    budgets = budgets or C.PadBudgets()
    b = len(indices)
    g, r = budgets.max_gt_boxes, budgets.max_gt_rels
    s = dataset.im_size
    images = np.zeros((b, s, s, 3), np.uint8)
    im_hw = np.full((b, 2), float(s), np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    gt_rels = np.zeros((b, r, 3), np.int32)
    gt_rel_mask = np.zeros((b, r), bool)
    for row, idx in enumerate(indices):
        e = dataset[int(idx)]
        images[row] = e["img"]
        n_g = min(len(e["gt_boxes"]), g)
        gt_boxes[row, :n_g] = e["gt_boxes"][:n_g] * (s / C.BOX_SCALE)
        gt_classes[row, :n_g] = e["gt_classes"][:n_g]
        gt_mask[row, :n_g] = True
        rels = e["gt_relations"]
        if len(rels):
            rels = rels[(rels[:, 0] < n_g) & (rels[:, 1] < n_g)]
        n_r = min(len(rels), r)
        gt_rels[row, :n_r] = rels[:n_r]
        gt_rel_mask[row, :n_r] = True
    return dict(images=images, im_hw=im_hw, gt_boxes=gt_boxes,
                gt_classes=gt_classes, gt_mask=gt_mask, gt_rels=gt_rels,
                gt_rel_mask=gt_rel_mask)
