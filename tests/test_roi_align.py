"""RoIAlign: the matmul formulation must match a direct numpy port of the
TF crop_and_resize semantics used by the reference CUDA kernel
(roi_align_kernel.cu:15-80 with the (dim-1)/scale normalization of
functions/roi_align.py:25-31)."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu.ops.roi_align import roi_align


def np_crop_and_resize(fmap, box, crop, scale):
    """Oracle: sample grid linspace(x1*s, x2*s, crop) with bilinear lerp,
    zero outside [0, dim-1]. fmap: [H, W, C]; box: (x1,y1,x2,y2) image coords."""
    h, w, c = fmap.shape
    out = np.zeros((crop, crop, c), np.float32)
    x1, y1, x2, y2 = box
    for py in range(crop):
        in_y = y1 * scale + py * (y2 - y1) * scale / (crop - 1)
        if in_y < 0 or in_y > h - 1:
            continue
        ty, by = int(np.floor(in_y)), int(np.ceil(in_y))
        ly = in_y - ty
        for px in range(crop):
            in_x = x1 * scale + px * (x2 - x1) * scale / (crop - 1)
            if in_x < 0 or in_x > w - 1:
                continue
            lx_, rx = int(np.floor(in_x)), int(np.ceil(in_x))
            lx = in_x - lx_
            top = fmap[ty, lx_] + (fmap[ty, rx] - fmap[ty, lx_]) * lx
            bot = fmap[by, lx_] + (fmap[by, rx] - fmap[by, lx_]) * lx
            out[py, px] = top + (bot - top) * ly
    return out


def test_matches_crop_and_resize_oracle(rng):
    h = w = 12
    c = 3
    scale = 1.0 / 16
    fmap = rng.randn(1, h, w, c).astype(np.float32)
    rois = np.array([[[10.0, 20.0, 100.0, 130.0],
                      [0.0, 0.0, 176.0, 176.0],
                      [50.0, 50.0, 60.0, 62.0]]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois), None, 7, scale))
    for r in range(rois.shape[1]):
        exp = np_crop_and_resize(fmap[0], rois[0, r], 7, scale)
        np.testing.assert_allclose(got[0, r], exp, rtol=1e-4, atol=1e-5)


def test_out_of_range_extrapolates_zero(rng):
    fmap = rng.randn(1, 8, 8, 2).astype(np.float32)
    rois = np.array([[[-50.0, -50.0, 300.0, 300.0]]], np.float32)  # way outside
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois), None, 7, 1.0 / 16))
    exp = np_crop_and_resize(fmap[0], rois[0, 0], 7, 1.0 / 16)
    np.testing.assert_allclose(got[0, 0], exp, rtol=1e-4, atol=1e-5)


def test_invalid_rois_produce_zeros(rng):
    fmap = rng.randn(2, 8, 8, 4).astype(np.float32)
    rois = np.tile(np.array([[10.0, 10.0, 90.0, 90.0]], np.float32), (2, 3, 1))
    valid = np.array([[True, False, True], [False, True, True]])
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                               jnp.asarray(valid), 5, 1.0 / 16))
    assert np.all(got[0, 1] == 0) and np.all(got[1, 0] == 0)
    assert np.abs(got[0, 0]).sum() > 0


def test_differentiable(rng):
    fmap = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    rois = jnp.asarray(np.array([[[5.0, 5.0, 100.0, 100.0]]], np.float32))

    def f(fm):
        return roi_align(fm, rois, None, 7, 1.0 / 16).sum()

    g = jax.grad(f)(fmap)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_gather_and_matmul_modes_agree(rng):
    """The gather+lerp implementation == the interpolation-matmul one
    (f32 fmap, tight tolerance); both run through the public chunked entry."""
    from neural_motifs_tpu.ops.roi_align import _roi_align_impl

    fmap = jnp.asarray(rng.standard_normal((2, 19, 23, 8)).astype(np.float32))
    rois = np.zeros((2, 9, 4), np.float32)
    xy = rng.uniform(-20, 300, (2, 9, 2)).astype(np.float32)  # incl. OOB
    wh = rng.uniform(1, 200, (2, 9, 2)).astype(np.float32)
    rois[..., :2] = xy
    rois[..., 2:] = xy + wh
    valid = np.ones((2, 9), bool)
    valid[1, 6:] = False
    a = _roi_align_impl(fmap, jnp.asarray(rois), jnp.asarray(valid), 7,
                        1.0 / 16.0, mode="gather")
    b = _roi_align_impl(fmap, jnp.asarray(rois), jnp.asarray(valid), 7,
                        1.0 / 16.0, mode="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_gather_mode_differentiable(rng):
    """Gather mode backward = scatter-add into the feature map (the autodiff
    analog of the reference's atomicAdd backward) — finite and non-zero."""
    import os
    fmap = jnp.asarray(rng.standard_normal((1, 12, 12, 4)).astype(np.float32))
    rois = jnp.asarray([[[8.0, 8.0, 120.0, 120.0]]])
    old = os.environ.get("NM_ROI_ALIGN")
    os.environ["NM_ROI_ALIGN"] = "gather"
    try:
        g = jax.grad(lambda f: jnp.sum(
            roi_align(f, rois, jnp.ones((1, 1), bool), 7, 1.0 / 16.0) ** 2))(fmap)
    finally:
        if old is None:
            os.environ.pop("NM_ROI_ALIGN", None)
        else:
            os.environ["NM_ROI_ALIGN"] = old
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_pallas_kernel_matches_matmul(rng):
    """The fused Pallas Kronecker kernel (TPU default) == the separable
    matmul form, including roi-padding (R not a tile multiple), invalid
    rois and out-of-bounds boxes; runs in Mosaic interpret mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from neural_motifs_tpu.ops.pallas_roi_align import pallas_roi_align
    from neural_motifs_tpu.ops.roi_align import _roi_align_impl

    fmap = jnp.asarray(rng.standard_normal((2, 19, 23, 8)).astype(np.float32))
    r_cnt = 21  # not a multiple of ROI_TILE
    rois = np.zeros((2, r_cnt, 4), np.float32)
    xy = rng.uniform(-20, 300, (2, r_cnt, 2)).astype(np.float32)
    wh = rng.uniform(1, 200, (2, r_cnt, 2)).astype(np.float32)
    rois[..., :2] = xy
    rois[..., 2:] = xy + wh
    valid = np.ones((2, r_cnt), bool)
    valid[1, 15:] = False
    with pltpu.force_tpu_interpret_mode():
        out = pallas_roi_align(fmap, jnp.asarray(rois), jnp.asarray(valid),
                               7, 1.0 / 16.0)
    ref = _roi_align_impl(fmap, jnp.asarray(rois), jnp.asarray(valid), 7,
                          1.0 / 16.0, mode="matmul")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_kernel_grad(rng):
    """custom_vjp backward (separable-form autodiff) == the matmul form's
    gradient."""
    from jax.experimental.pallas import tpu as pltpu
    from neural_motifs_tpu.ops.pallas_roi_align import pallas_roi_align
    from neural_motifs_tpu.ops.roi_align import _roi_align_impl

    fmap = jnp.asarray(rng.standard_normal((1, 12, 12, 4)).astype(np.float32))
    rois = jnp.asarray([[[8.0, 8.0, 120.0, 120.0], [0.0, 0.0, 40.0, 60.0]]])
    valid = jnp.ones((1, 2), bool)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda f: jnp.sum(
            pallas_roi_align(f, rois, valid, 7, 1.0 / 16.0) ** 2))(fmap)
    gr = jax.grad(lambda f: jnp.sum(
        _roi_align_impl(f, rois, valid, 7, 1.0 / 16.0, mode="matmul") ** 2))(fmap)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-5,
                               atol=1e-5)


def test_pallas_roi_tile_fits_scoped_vmem():
    """VMEM-aware tile chooser (dress-rehearsal regression): the f32
    full-budget eval shape (p=7, 37x37 fmap) OOM'd scoped VMEM at tile 32
    (20.34M measured vs the 16M limit); the chooser must shrink the f32
    tile while keeping bf16 at the swept optimum, and its working-set
    model must stay under the limit for every (dtype, fmap) the budgets
    can produce."""
    from neural_motifs_tpu.ops.pallas_roi_align import (ROI_TILE,
                                                        _pick_roi_tile)

    assert _pick_roi_tile(37 * 37, 7, 2) == ROI_TILE      # bf16 unchanged
    t32 = _pick_roi_tile(37 * 37, 7, 4)
    assert t32 < ROI_TILE                                 # f32 must shrink
    for hw in (37 * 37, 28 * 37, 19 * 19, 7 * 7):
        for itemsize in (2, 4):
            t = _pick_roi_tile(hw, 7, itemsize)
            assert 1 <= t <= ROI_TILE and (t & (t - 1)) == 0
            # measured: scoped footprint ~= 2.4 buffers of the
            # [tile*p*p, hw] temporaries (20.34M at tile=32/f32/1369)
            assert 2.4 * t * 49 * hw * itemsize <= 16e6 or t == 1
