"""Union-box pair-mask rasterization — pure jnp outer products.

Replaces the reference's CPU Cython rasterizer (reference
lib/draw_rectangles/draw_rectangles.pyx:12-67), which forced a device->host
round-trip on every forward pass. The anti-aliased coverage of a box edge is
separable, so each mask is the outer product of two 1-D coverage profiles:

    cov_y[j] = clip(j+1 - y1, 0, 1) * clip(y2 - j, 0, 1)
    mask[j, k] = cov_y[j] * cov_x[k]

computed for the subject and object box in union-box-normalized coordinates
at resolution S = pooling_size*4 - 1 = 27 (lib/get_union_boxes.py:49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _coverage(lo: Array, hi: Array, size: int) -> Array:
    """1-D anti-aliased coverage profile of the interval [lo, hi] over
    `size` unit cells. lo/hi: [...] -> [..., size]."""
    j = jnp.arange(size, dtype=lo.dtype)
    return (jnp.clip(j + 1.0 - lo[..., None], 0.0, 1.0) *
            jnp.clip(hi[..., None] - j, 0.0, 1.0))


def draw_union_boxes(box_pairs: Array, pooling_size: int) -> Array:
    """Rasterize subject/object masks in union-box coordinates.

    box_pairs: [..., 8] = (sub x1 y1 x2 y2, obj x1 y1 x2 y2) in any common
    coordinate frame. Returns [..., 2, S, S] float coverage in [0, 1], with
    S = pooling_size (the caller passes pooling_size*4-1 = 27, matching
    get_union_boxes.py:49).
    """
    s = pooling_size
    sub = box_pairs[..., 0:4]
    obj = box_pairs[..., 4:8]
    x1u = jnp.minimum(sub[..., 0], obj[..., 0])
    y1u = jnp.minimum(sub[..., 1], obj[..., 1])
    x2u = jnp.maximum(sub[..., 2], obj[..., 2])
    y2u = jnp.maximum(sub[..., 3], obj[..., 3])
    w = jnp.maximum(x2u - x1u, 1e-8)
    h = jnp.maximum(y2u - y1u, 1e-8)

    def one(box):
        x1 = (box[..., 0] - x1u) * s / w
        y1 = (box[..., 1] - y1u) * s / h
        x2 = (box[..., 2] - x1u) * s / w
        y2 = (box[..., 3] - y1u) * s / h
        cy = _coverage(y1, y2, s)                     # [..., S]
        cx = _coverage(x1, x2, s)                     # [..., S]
        return cy[..., :, None] * cx[..., None, :]    # [..., S, S]

    return jnp.stack([one(sub), one(obj)], axis=-3)
