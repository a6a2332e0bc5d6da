"""Anchor generation for the single-level (stride 16) RPN.

Re-derivation of the classic Faster R-CNN anchor enumeration (reference
lib/fpn/generate_anchors.py:39-126, itself from Girshick & Bell's public
code) without the MATLAB rounding, gridded over the IM_SCALE/16 feature map.

Pure numpy at import/setup time (anchors are a constant buffer), returned as
a [H, W, A, 4] float32 array in (x1, y1, x2, y2) with the reference's
pixel-inclusive convention.
"""

from __future__ import annotations

import functools

import numpy as np

from neural_motifs_tpu.config import (ANCHOR_RATIOS, ANCHOR_SCALES, ANCHOR_SIZE,
                                      FEAT_STRIDE, IM_SCALE)


def generate_base_anchors(base_size: int = ANCHOR_SIZE,
                          ratios=ANCHOR_RATIOS,
                          scales=ANCHOR_SCALES) -> np.ndarray:
    """[A, 4] anchors around the (0,0,base-1,base-1) reference window.

    For each aspect ratio r: w = sqrt(base^2 / r), h = w * r (no rounding,
    generate_anchors.py:102-114); then each scale multiplies (w, h).
    Boxes are written center-symmetric with the -1 inclusive convention.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    ctr = (base_size - 1) / 2.0

    ws = np.sqrt(base_size * base_size / ratios)          # [R]
    hs = ws * ratios                                      # [R]
    ws = (ws[:, None] * scales[None, :]).reshape(-1)      # [R*S]
    hs = (hs[:, None] * scales[None, :]).reshape(-1)
    anchors = np.stack([
        ctr - 0.5 * (ws - 1),
        ctr - 0.5 * (hs - 1),
        ctr + 0.5 * (ws - 1),
        ctr + 0.5 * (hs - 1),
    ], axis=1)
    return anchors.astype(np.float32)


@functools.lru_cache(maxsize=8)
def generate_anchors(base_size: int = ANCHOR_SIZE,
                     feat_stride: int = FEAT_STRIDE,
                     im_scale=IM_SCALE,
                     anchor_scales=ANCHOR_SCALES,
                     anchor_ratios=ANCHOR_RATIOS) -> np.ndarray:
    """[H, W, A, 4] anchor grid (generate_anchors.py:39-52): base anchors
    shifted by (x*stride, y*stride) for each feature-map cell.

    `im_scale` is either the square image size or an (im_h, im_w) tuple —
    rectangular pad budgets (aspect-bucketed serving) grid the same base
    anchors over an H x W cell grid; a rect grid is exactly the top-left
    sub-grid of the square one, so results for valid cells are unchanged.
    """
    base = generate_base_anchors(base_size, anchor_ratios, anchor_scales)
    im_h, im_w = ((im_scale, im_scale) if isinstance(im_scale, int)
                  else im_scale)
    shift_y = np.arange(im_h // feat_stride, dtype=np.float32) * feat_stride
    shift_x = np.arange(im_w // feat_stride, dtype=np.float32) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)                # [H, W] each; sx varies along W
    shifts = np.stack([sx, sy, sx, sy], axis=-1)          # [H, W, 4]
    return (shifts[:, :, None, :] + base[None, None]).astype(np.float32)
