"""RoIAlign — TPU-native crop_and_resize, two implementations.

The reference uses a CUDA gather kernel with TF crop_and_resize semantics
(reference lib/fpn/roi_align/src/cuda/roi_align_kernel.cu:15-80, normalization
quirk in lib/fpn/roi_align/functions/roi_align.py:25-31). Unrolling that
normalization, the sample grid in feature-map coordinates is simply

    u_p = linspace(x1 * s, x2 * s, P)        (s = spatial_scale, P = crop size)

with bilinear interpolation between the two neighbouring cells and zero
extrapolation outside [0, dim-1].

Two equivalent evaluations, switchable via NM_ROI_ALIGN=matmul|gather:

* 'matmul' (default): bilinear interpolation along an axis is a linear map,
  so build per-RoI interpolation matrices R_y [P, H], R_x [P, W] of tent
  weights and evaluate out[r] = R_y[r] @ fmap @ R_x[r]^T on the MXU. The
  [R, P, W, C] intermediate makes it HBM-bound at eval scale (~29ms of the
  SGDet step on the union pairs), but it is still the fastest form on TPU.
* 'gather': each bilinear sample touches exactly 4 feature cells, so gather
  the 4 corner rows and lerp on the VPU — no [P, W]-sized intermediate.
  Measured on the v5e bench: SLOWER end-to-end (694ms vs 392ms @ batch 16)
  — XLA lowers the [B, R*P*Q] row gather poorly — kept as a tested
  alternative for backends with fast gathers.

Both differentiate for free (gather's backward is a scatter-add — exactly
the reference's atomicAdd backward, emitted by autodiff). Invalid/padded
RoIs produce zeros via the weights. Parity-tested against each other and
against the numpy oracle.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array


def _default_mode() -> str:
    """Default 'pallas'; NM_ROI_ALIGN=matmul|gather|kron|pallas overrides.

    Measured on the TPU chip (batch-8 4k-pair union crop, isolated op,
    amortized-dispatch protocol): matmul 37.8 ms (HBM-bound on its
    [R, P, W, C] intermediate), pallas Kronecker kernel 32.0 ms / 69 TF/s
    (round-4 retune: parallel dimension_semantics + tile sweep),
    kron-in-XLA 93 ms, gather 2x matmul. End-to-end SGDet bench @batch 32:
    pallas 82.8 img/s vs matmul 81.8 — the round-3 fusion penalty that kept
    matmul the default no longer appears at the compacted b32 config, so
    the kernel is now the default ON TPU; off-TPU the kernel only exists in
    slow Mosaic interpret mode, so matmul stays the default there (CPU test
    suite, multichip dryruns). The separable form also remains the training
    backward path (custom_vjp) and a selectable eval alternative."""
    mode = os.environ.get("NM_ROI_ALIGN")
    if mode:
        return mode
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "matmul"


def interp_matrix(lo: Array, hi: Array, out_size: int, grid_size: int) -> Array:
    """Tent-weight interpolation matrix.

    lo, hi: [...] sample-interval endpoints in grid coordinates.
    Returns [..., out_size, grid_size] with rows summing to 1 for in-range
    sample points and to 0 for out-of-range ones (extrapolation_value = 0,
    matching roi_align_kernel.cu:46-57).
    """
    p = jnp.arange(out_size, dtype=lo.dtype)
    step = (hi - lo) / (out_size - 1)
    u = lo[..., None] + p * step[..., None]                     # [..., P]
    c = jnp.arange(grid_size, dtype=lo.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - c))       # [..., P, G]
    in_range = (u >= 0.0) & (u <= grid_size - 1.0)
    return w * in_range[..., None]


def _roi_align_matmul(fmap: Array, rois: Array, valid: Array | None,
                      out_size: int, spatial_scale: float) -> Array:
    _, h, w, _ = fmap.shape
    s = jnp.asarray(spatial_scale, fmap.dtype)
    rois = rois.astype(fmap.dtype)
    ry = interp_matrix(rois[..., 1] * s, rois[..., 3] * s, out_size, h)  # [B,R,P,H]
    rx = interp_matrix(rois[..., 0] * s, rois[..., 2] * s, out_size, w)  # [B,R,P,W]
    if valid is not None:
        ry = ry * valid[..., None, None].astype(fmap.dtype)
    # [B,R,P,H] x [B,H,W,C] -> [B,R,P,W,C]
    t = jnp.einsum("brph,bhwc->brpwc", ry, fmap, preferred_element_type=fmap.dtype)
    # [B,R,P,W,C] x [B,R,Q,W] -> [B,R,P,Q,C]
    out = jnp.einsum("brpwc,brqw->brpqc", t, rx, preferred_element_type=fmap.dtype)
    return out


def _corner_weights(u: Array, grid_size: int):
    """Sample coordinate u -> (i0, i1, w0, w1): the two neighbouring cells
    and their tent weights; both weights 0 outside [0, grid-1] (zero
    extrapolation). Matches interp_matrix row-wise."""
    g1 = float(grid_size - 1)
    i0 = jnp.clip(jnp.floor(u), 0.0, g1)
    frac = u - i0
    i1 = jnp.minimum(i0 + 1.0, g1)
    in_range = (u >= 0.0) & (u <= g1)
    w1 = jnp.where(in_range, frac, 0.0)
    w0 = jnp.where(in_range, 1.0 - frac, 0.0)
    return i0.astype(jnp.int32), i1.astype(jnp.int32), w0, w1


def _roi_align_gather(fmap: Array, rois: Array, valid: Array | None,
                      out_size: int, spatial_scale: float) -> Array:
    b, h, w, c = fmap.shape
    r = rois.shape[1]
    p = out_size
    s = jnp.asarray(spatial_scale, rois.dtype)
    grid = jnp.arange(p, dtype=rois.dtype)

    def axis_samples(lo, hi, g):
        step = (hi - lo) / (p - 1)
        u = lo[..., None] + grid * step[..., None]           # [B, R, P]
        return _corner_weights(u, g)

    iy0, iy1, wy0, wy1 = axis_samples(rois[..., 1] * s, rois[..., 3] * s, h)
    ix0, ix1, wx0, wx1 = axis_samples(rois[..., 0] * s, rois[..., 2] * s, w)
    if valid is not None:
        v = valid.astype(wy0.dtype)[..., None]
        wy0 = wy0 * v
        wy1 = wy1 * v

    flat = fmap.reshape(b, h * w, c)
    out = None
    for iy, wy in ((iy0, wy0), (iy1, wy1)):
        for ix, wx in ((ix0, wx0), (ix1, wx1)):
            idx = (iy[..., :, None] * w + ix[..., None, :]).reshape(b, -1)
            vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
            vals = vals.reshape(b, r, p, p, c)
            wgt = (wy[..., :, None] * wx[..., None, :]).astype(fmap.dtype)
            term = vals * wgt[..., None]
            out = term if out is None else out + term
    return out


def _roi_align_kron(fmap: Array, rois: Array, valid: Array | None,
                    out_size: int, spatial_scale: float) -> Array:
    """Single-GEMM form: out[r] = (R_y[r] (x) R_x[r]) @ vec(fmap).

    The separable matmul form materializes a [R, P, W, C] intermediate in
    HBM (the measured cost of the union-pair RoIAlign); here the Kronecker
    interpolation matrix [R, P*P, H*W] contracts against the flattened map
    in ONE dot — 6x the FLOPs of the separable form, but FLOPs are nearly
    free on the MXU at these sizes and the big intermediate disappears
    (XLA fuses the broadcast-product construction of the Kronecker operand
    into the dot)."""
    _, h, w, c = fmap.shape
    s = jnp.asarray(spatial_scale, fmap.dtype)
    rois = rois.astype(fmap.dtype)
    ry = interp_matrix(rois[..., 1] * s, rois[..., 3] * s, out_size, h)
    rx = interp_matrix(rois[..., 0] * s, rois[..., 2] * s, out_size, w)
    if valid is not None:
        ry = ry * valid[..., None, None].astype(ry.dtype)
    b, r = rois.shape[:2]
    p = out_size
    w2 = (ry[:, :, :, None, :, None] * rx[:, :, None, :, None, :]).reshape(
        b, r * p * p, h * w)                      # [B, R*P*P, H*W]
    out = jnp.einsum("bkm,bmc->bkc", w2, fmap.reshape(b, h * w, c))
    return out.reshape(b, r, p, p, c)


def _roi_align_pallas(fmap, rois, valid, out_size, spatial_scale):
    from neural_motifs_tpu.ops.pallas_roi_align import pallas_roi_align
    return pallas_roi_align(fmap, rois, valid, out_size, spatial_scale)


_ROI_MODES = {"matmul": _roi_align_matmul, "gather": _roi_align_gather,
              "kron": _roi_align_kron, "pallas": _roi_align_pallas}


def _roi_align_impl(fmap: Array, rois: Array, valid: Array | None,
                    out_size: int, spatial_scale: float,
                    mode: str | None = None) -> Array:
    fn = _ROI_MODES[mode or _default_mode()]
    return fn(fmap, rois, valid, out_size, spatial_scale)


def roi_align(fmap: Array, rois: Array, valid: Array | None, out_size: int,
              spatial_scale: float, chunk: int = 512) -> Array:
    """Crop-and-resize RoI pooling.

    fmap: [B, H, W, C] (NHWC — TPU-native layout)
    rois: [B, R, 4] boxes in image coordinates (x1, y1, x2, y2)
    valid: [B, R] bool or None
    Returns [B, R, out_size, out_size, C].

    Large R (the all-pairs union features at eval, R ~ 4k) is processed in
    `chunk`-sized groups via lax.map so the [B, R, P, W, C] interpolation
    intermediate stays bounded (~chunk * P * W * C per image) instead of
    materializing gigabytes.
    """
    b, r = rois.shape[:2]
    if _default_mode() == "pallas":
        # the Pallas kernel tiles the roi axis itself (grid R/ROI_TILE) and
        # never materializes a [R, P, W, C] intermediate — no chunking
        return _roi_align_impl(fmap, rois, valid, out_size, spatial_scale)
    if chunk and r > chunk:
        pad = (-r) % chunk
        if pad:
            rois = jnp.concatenate(
                [rois, jnp.zeros((b, pad, 4), rois.dtype)], axis=1)
            v = (valid if valid is not None
                 else jnp.ones((b, r), bool))
            valid = jnp.concatenate([v, jnp.zeros((b, pad), bool)], axis=1)
        n = rois.shape[1] // chunk
        rr = jnp.swapaxes(rois.reshape(b, n, chunk, 4), 0, 1)
        vv = jnp.swapaxes(valid.reshape(b, n, chunk), 0, 1)
        out = jax.lax.map(
            lambda args: _roi_align_impl(fmap, args[0], args[1], out_size,
                                         spatial_scale),
            (rr, vv))
        out = jnp.swapaxes(out, 0, 1).reshape(
            b, n * chunk, out_size, out_size, fmap.shape[-1])
        return out[:, :r]
    return _roi_align_impl(fmap, rois, valid, out_size, spatial_scale)
