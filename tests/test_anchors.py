"""Anchor generation: golden values against the classic Faster R-CNN anchors
(the MATLAB table reproduced in reference generate_anchors.py:12-37) and
grid-shift structure."""

import numpy as np

from neural_motifs_tpu.ops.anchors import generate_anchors, generate_base_anchors

# Classic anchors for base=16, ratios=(0.5,1,2), scales=(8,16,32) WITH rounding
# disabled differ slightly from MATLAB; the no-rounding widths are
# w = sqrt(16*16/r), h = w*r, scaled. We verify the exact closed form and the
# ratio/scale/area invariants instead of the rounded MATLAB table.


def test_base_anchor_invariants():
    ratios = (0.5, 1.0, 2.0)
    scales = (8.0, 16.0, 32.0)
    a = generate_base_anchors(16, ratios, scales)
    assert a.shape == (9, 4)
    w = a[:, 2] - a[:, 0] + 1
    h = a[:, 3] - a[:, 1] + 1
    # aspect ratio h/w == ratio, area == (16*scale)^2
    k = 0
    for r in ratios:
        for s in scales:
            np.testing.assert_allclose(h[k] / w[k], r, rtol=1e-5)
            np.testing.assert_allclose(w[k] * h[k], (16 * s) ** 2, rtol=1e-5)
            k += 1
    # centered on the (0,0,15,15) window
    np.testing.assert_allclose((a[:, 0] + a[:, 2]) / 2, 7.5, atol=1e-4)
    np.testing.assert_allclose((a[:, 1] + a[:, 3]) / 2, 7.5, atol=1e-4)


def test_identity_ratio_matches_matlab_style():
    # ratio 1, scales 8/16/32: w = h = 16*s, x1 = 7.5 - (w-1)/2
    a = generate_base_anchors(16, (1.0,), (8.0, 16.0, 32.0))
    # x1 = 7.5 - 0.5*(16*s - 1), x2 = 7.5 + 0.5*(16*s - 1)
    exp = np.array([[-56.0, -56.0, 71.0, 71.0],
                    [-120.0, -120.0, 135.0, 135.0],
                    [-248.0, -248.0, 263.0, 263.0]])
    np.testing.assert_allclose(a, exp, atol=1e-4)


def test_grid_shape_and_shifts():
    g = generate_anchors()
    assert g.shape == (37, 37, 20, 4)
    # moving one cell right shifts x by 16, y unchanged
    np.testing.assert_allclose(g[0, 1, :, 0] - g[0, 0, :, 0], 16.0)
    np.testing.assert_allclose(g[0, 1, :, 1], g[0, 0, :, 1])
    # moving one cell down shifts y by 16
    np.testing.assert_allclose(g[1, 0, :, 1] - g[0, 0, :, 1], 16.0)
    np.testing.assert_allclose(g[1, 0, :, 0], g[0, 0, :, 0])


def test_config_anchor_count():
    g = generate_anchors()
    # 4 ratios x 5 scales = 20 anchors/cell (config.py:60-61)
    assert g.shape[2] == 20
