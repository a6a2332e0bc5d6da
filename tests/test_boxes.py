"""Box math golden tests: jnp ops vs independently written numpy formulas
with the reference's pixel-inclusive conventions."""

import numpy as np
import jax.numpy as jnp

from neural_motifs_tpu.ops import boxes as B


def np_iou(a, b):
    """Independent numpy IoU oracle with the +1 inclusive convention
    (the algorithm of reference bbox.pyx:15-61)."""
    out = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + 1
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + 1
            if iw > 0 and ih > 0:
                area_a = (a[i, 2] - a[i, 0] + 1) * (a[i, 3] - a[i, 1] + 1)
                area_b = (b[j, 2] - b[j, 0] + 1) * (b[j, 3] - b[j, 1] + 1)
                out[i, j] = iw * ih / (area_a + area_b - iw * ih)
    return out


def rand_boxes(rng, n, scale=500):
    x1 = rng.uniform(0, scale, (n, 1))
    y1 = rng.uniform(0, scale, (n, 1))
    w = rng.uniform(1, scale / 2, (n, 1))
    h = rng.uniform(1, scale / 2, (n, 1))
    return np.concatenate([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_center_size_point_form_roundtrip(rng):
    b = rand_boxes(rng, 50)
    cs = B.center_size(jnp.asarray(b))
    # w = x2-x1+1 inclusive
    np.testing.assert_allclose(np.asarray(cs[:, 2]), b[:, 2] - b[:, 0] + 1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cs[:, 0]), (b[:, 0] + b[:, 2] + 1) / 2, rtol=1e-5)
    back = B.point_form(cs)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-4, atol=1e-3)


def test_iou_matches_oracle(rng):
    a = rand_boxes(rng, 20)
    b = rand_boxes(rng, 15)
    got = np.asarray(B.bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_iou_mask_zeroes_rows(rng):
    a = rand_boxes(rng, 6)
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    got = np.asarray(B.bbox_overlaps(jnp.asarray(a), jnp.asarray(a),
                                     mask_a=jnp.asarray(mask)))
    assert np.all(got[~mask] == 0)
    assert np.all(np.diag(got)[mask] > 0.99)


def test_encode_decode_roundtrip(rng):
    priors = rand_boxes(rng, 30)
    gts = rand_boxes(rng, 30)
    deltas = B.bbox_encode(jnp.asarray(priors), jnp.asarray(gts))
    rec = B.bbox_preds(jnp.asarray(priors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-3, atol=0.1)


def test_bbox_decode_formula(rng):
    # decode must equal: ctr' = ctr + wh*d[:2]; wh' = exp(d[2:])*wh (box_utils.py:28-48)
    priors = rand_boxes(rng, 10)
    deltas = rng.uniform(-0.3, 0.3, (10, 4)).astype(np.float32)
    got = np.asarray(B.bbox_preds(jnp.asarray(priors), jnp.asarray(deltas)))
    w = priors[:, 2] - priors[:, 0] + 1
    h = priors[:, 3] - priors[:, 1] + 1
    cx = priors[:, 0] + 0.5 * w
    cy = priors[:, 1] + 0.5 * h
    ncx = cx + w * deltas[:, 0]
    ncy = cy + h * deltas[:, 1]
    nw = np.exp(deltas[:, 2]) * w
    nh = np.exp(deltas[:, 3]) * h
    exp = np.stack([ncx - 0.5 * nw, ncy - 0.5 * nh,
                    ncx + 0.5 * (nw - 2), ncy + 0.5 * (nh - 2)], 1)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-2)


def test_nms_overlaps_diag_one(rng):
    b = rand_boxes(rng, 8)
    per_cls = np.stack([b, b + 3.0], axis=1)  # [N, 2, 4]
    got = np.asarray(B.nms_overlaps(jnp.asarray(per_cls)))
    assert got.shape == (8, 8, 2)
    np.testing.assert_allclose(got[np.arange(8), np.arange(8), :], 1.0, rtol=1e-5)


def test_union_box(rng):
    a = rand_boxes(rng, 12)
    b = rand_boxes(rng, 12)
    u = np.asarray(B.union_box(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(u[:, 0] == np.minimum(a[:, 0], b[:, 0]))
    assert np.all(u[:, 3] == np.maximum(a[:, 3], b[:, 3]))
