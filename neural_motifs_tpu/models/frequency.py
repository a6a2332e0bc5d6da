"""Frequency baseline: empirical log P(predicate | sub_class, obj_class).

Equivalents of reference lib/get_dataset_counts.py:12-67 (counting) and
lib/sparse_targets.py:11-52 (the bias table / baseline model). The counting
runs once on host (numpy); the bias table is a [NC*NC, NP] array gathered
on device by sub*NC + obj.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def box_filter(boxes: np.ndarray, must_overlap: bool = False) -> np.ndarray:
    """Candidate (i, j) pairs: overlapping pairs if must_overlap (falling
    back to all pairs when none overlap), else all ordered non-diag pairs
    (get_dataset_counts.py:49-67)."""
    from neural_motifs_tpu.runtime import bbox_intersections
    n = boxes.shape[0]
    overlap = bbox_intersections(boxes, boxes) > 0
    np.fill_diagonal(overlap, False)
    all_pairs = ~np.eye(n, dtype=bool)
    if must_overlap:
        pairs = np.column_stack(np.where(overlap))
        if pairs.size == 0:
            pairs = np.column_stack(np.where(all_pairs))
    else:
        pairs = np.column_stack(np.where(all_pairs))
    return pairs


def get_counts(train_data, must_overlap: bool = True, chunk: int = 2000):
    """fg [NC, NC, NP] triple counts + bg [NC, NC] overlapping-pair counts
    over the training set (get_dataset_counts.py:12-46).

    Per-image class/pair rows are gathered vectorized and counted by the
    native nm_count_triples kernel (csrc/nm_runtime.cpp) in image chunks —
    at VG scale (57k train images, tens of millions of bg pairs) the
    original per-relation python loop costs minutes of startup."""
    from neural_motifs_tpu.runtime import count_triples
    nc, npred = train_data.num_classes, train_data.num_predicates
    fg = np.zeros((nc, nc, npred), np.int64)
    bg = np.zeros((nc, nc), np.int64)
    fg_rows: list = []
    bg_rows: list = []

    def flush():
        nonlocal fg, bg
        if fg_rows:
            fg = fg + count_triples(np.concatenate(fg_rows), nc, npred)
            fg_rows.clear()
        if bg_rows:
            rows = np.concatenate(bg_rows)
            rows = np.column_stack([rows, np.zeros(len(rows), np.int32)])
            bg = bg + count_triples(rows, nc, 1)[:, :, 0]
            bg_rows.clear()

    for i in range(len(train_data)):
        cls = np.asarray(train_data.gt_classes[i], np.int32)
        rels = np.asarray(train_data.relationships[i])
        boxes = train_data.gt_boxes[i]
        if len(rels):
            fg_rows.append(np.column_stack(
                [cls[rels[:, 0]], cls[rels[:, 1]],
                 rels[:, 2].astype(np.int32)]))
        pairs = box_filter(boxes, must_overlap=must_overlap)
        if len(pairs):
            bg_rows.append(np.column_stack([cls[pairs[:, 0]],
                                            cls[pairs[:, 1]]]))
        if (i + 1) % chunk == 0:
            flush()
    flush()
    return fg, bg


def freq_bias_table(train_data=None, fg=None, bg=None, eps: float = 1e-3,
                    must_overlap: bool = True) -> np.ndarray:
    """[NC*NC, NP] log-probability table (sparse_targets.py:17-30): bg
    counts (+1) become the background-predicate column, rows normalized."""
    if fg is None:
        fg, bg = get_counts(train_data, must_overlap=must_overlap)
    fg = fg.astype(np.float64).copy()
    fg[:, :, 0] = bg.astype(np.float64) + 1.0
    dist = np.log(fg / fg.sum(2, keepdims=True) + eps)
    nc, _, npred = fg.shape
    return dist.reshape(nc * nc, npred).astype(np.float32)


class FrequencyBias:
    """Device-side bias lookup (sparse_targets.py:32-52)."""

    def __init__(self, table: np.ndarray, num_classes: int):
        self.table = jnp.asarray(table)
        self.num_classes = num_classes

    def index_with_labels(self, sub_cls, obj_cls):
        """Gather log P(.|sub, obj): [..., NP]."""
        return self.table[sub_cls * self.num_classes + obj_cls]

    def soft(self, sub_dist, obj_dist):
        """Soft-distribution variant: [., NC] x [., NC] -> [., NP] via the
        joint outer product (sparse_targets.py:39-52)."""
        nc = self.num_classes
        joint = (sub_dist[..., :, None] * obj_dist[..., None, :]).reshape(
            sub_dist.shape[:-1] + (nc * nc,))
        return joint @ self.table
