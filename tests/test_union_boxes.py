"""Union-box rasterizer: jnp outer-product vs a direct numpy port of the
Cython algorithm (draw_rectangles.pyx:24-67)."""

import numpy as np
import jax.numpy as jnp

from neural_motifs_tpu.ops.union_boxes import draw_union_boxes
from tests.test_boxes import rand_boxes


def np_draw_union_boxes(box_pairs, pooling_size):
    n = box_pairs.shape[0]
    out = np.zeros((n, 2, pooling_size, pooling_size), np.float32)

    def minmax(x):
        return min(max(x, 0.0), 1.0)

    for r in range(n):
        x1u = min(box_pairs[r, 0], box_pairs[r, 4])
        y1u = min(box_pairs[r, 1], box_pairs[r, 5])
        x2u = max(box_pairs[r, 2], box_pairs[r, 6])
        y2u = max(box_pairs[r, 3], box_pairs[r, 7])
        w, h = x2u - x1u, y2u - y1u
        for i in range(2):
            x1 = (box_pairs[r, 0 + 4 * i] - x1u) * pooling_size / w
            y1 = (box_pairs[r, 1 + 4 * i] - y1u) * pooling_size / h
            x2 = (box_pairs[r, 2 + 4 * i] - x1u) * pooling_size / w
            y2 = (box_pairs[r, 3 + 4 * i] - y1u) * pooling_size / h
            for j in range(pooling_size):
                yc = minmax(j + 1 - y1) * minmax(y2 - j)
                for k in range(pooling_size):
                    out[r, i, j, k] = minmax(k + 1 - x1) * minmax(x2 - k) * yc
    return out


def test_matches_cython_oracle(rng):
    a = rand_boxes(rng, 16)
    b = rand_boxes(rng, 16)
    pairs = np.concatenate([a, b], 1)
    got = np.asarray(draw_union_boxes(jnp.asarray(pairs), 27))
    exp = np_draw_union_boxes(pairs, 27)
    assert got.shape == (16, 2, 27, 27)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_full_union_is_all_ones(rng):
    # subject == object == union: full coverage
    a = rand_boxes(rng, 4)
    pairs = np.concatenate([a, a], 1)
    got = np.asarray(draw_union_boxes(jnp.asarray(pairs), 27))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)
