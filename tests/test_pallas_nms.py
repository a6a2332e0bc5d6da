"""Pallas NMS kernel: parity with the numpy greedy oracle (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp

from neural_motifs_tpu.ops.pallas_nms import (pallas_greedy_nms,
                                              pallas_perclass_nms)
from tests.test_nms import np_greedy_nms
from tests.test_boxes import rand_boxes


def test_pallas_nms_parity(rng):
    lanes, n = 3, 300
    boxes = np.stack([rand_boxes(rng, n, scale=150) for _ in range(lanes)])
    scores = rng.uniform(0, 1, (lanes, n)).astype(np.float32)
    valid = rng.uniform(0, 1, (lanes, n)) > 0.1
    got = np.asarray(pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(valid), 0.4, tile=128,
                                       interpret=True))
    for li in range(lanes):
        exp = np_greedy_nms(boxes[li], scores[li], valid[li], 0.4)
        np.testing.assert_array_equal(got[li], exp, err_msg=f"lane {li}")


def test_pallas_nms_small_exact(rng):
    boxes = np.array([[[0, 0, 10, 10], [4, 0, 14, 10], [9, 0, 19, 10],
                       [100, 100, 120, 120]]], np.float32)
    scores = np.array([[0.9, 0.8, 0.7, 0.6]], np.float32)
    valid = np.ones((1, 4), bool)
    got = np.asarray(pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(valid), 0.3, tile=128,
                                       interpret=True))
    np.testing.assert_array_equal(got[0], [True, False, True, True])


def test_pallas_perclass_nms_parity(rng):
    """The rank-sequential class-vectorized kernel == the numpy greedy
    oracle on score-sorted inputs, per (image, class) lane."""
    b, c, k = 2, 5, 128
    boxes = np.stack([[rand_boxes(rng, k, scale=120) for _ in range(c)]
                      for _ in range(b)])                  # [B, C, K, 4]
    scores = -np.sort(-rng.uniform(0, 1, (b, c, k)).astype(np.float32), -1)
    valid = np.cumsum(np.ones((b, c, k)), -1) <= rng.randint(3, k, (b, c, 1))
    got = np.asarray(pallas_perclass_nms(jnp.asarray(boxes),
                                         jnp.asarray(valid), 0.4,
                                         interpret=True))
    for bi in range(b):
        for ci in range(c):
            exp = np_greedy_nms(boxes[bi, ci], scores[bi, ci],
                                valid[bi, ci], 0.4)
            np.testing.assert_array_equal(got[bi, ci], exp,
                                          err_msg=f"lane {bi},{ci}")
