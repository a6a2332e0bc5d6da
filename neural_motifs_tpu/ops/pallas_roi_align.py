"""Fused RoIAlign Pallas kernel — Kronecker interpolation entirely in VMEM.

The production RoIAlign (ops/roi_align.py) evaluates the crop as two
separable interpolation matmuls; at SGDet eval scale (4k union pairs/image)
its [R, P, W, C] intermediate makes the op HBM-bound: measured 38.9 ms of
the batch-8 step, ~4x the bandwidth roofline. The algebraic alternative —
one GEMM against the Kronecker matrix (R_y ⊗ R_x) [R·P·P, H·W] — trades
6x the FLOPs (nearly free on the MXU) for no intermediate at all, but XLA
will not fuse the Kronecker construction into the dot and materializes it
(measured 93 ms). This kernel does the fusion by hand:

  grid (B, R/RT); per program, entirely in VMEM:
    1. broadcast R_y/R_x tiles over the q/p axes (major-dim broadcasts)
    2. expand columns h -> (h, w) and w -> (h, w) with two tiny constant
       0/1 expansion GEMMs (E_y [H, H*W], E_x [W, H*W]) — MXU-friendly and
       layout-safe (no unaligned lane reshapes)
    3. W2 = RYexp * RXexp  (the Kronecker tile, [RT*P*P, H*W] bf16)
    4. out = W2 @ fmap_flat [H*W, C]   — the one big GEMM

Zero-extrapolation and invalid-RoI masking are already folded into the
interpolation weights (interp_matrix), so the kernel itself is pure GEMM
math. Backward uses the separable form's autodiff VJP via jax.custom_vjp
(train-time union features are ~256 pairs, where the separable form is
fine anyway).

Reference equivalent: lib/fpn/roi_align/src/cuda/roi_align_kernel.cu
(forward gather kernel + atomicAdd backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_motifs_tpu.ops.roi_align import _roi_align_matmul, interp_matrix

Array = jax.Array

ROI_TILE = 32  # rois per program at bf16 (sweep r4: 8/16/32/64 all ~32 ms
               # at eval scale with the amortized-dispatch protocol)


def _pick_roi_tile(hw: int, p: int, itemsize: int) -> int:
    """Largest power-of-two tile whose scoped-VMEM working set fits.

    The kernel's live set per program is ~2.4 buffers of the
    [tile*p*p, hw] temporaries (rye/rxe/w2, partially reused by Mosaic):
    measured 20.34 MB at (tile=32, p=7, hw=1369, f32) against the 16 MB
    scoped limit — the f32 full-budget OOM the dress rehearsal caught
    (parity runbook pins -dtype float32). Budget 12 MB for safety."""
    per_tile = 2.4 * p * p * hw * itemsize
    t = ROI_TILE
    while t > 1 and t * per_tile > 12e6:
        t //= 2
    return t


def _expansion_constant(h: int, w: int) -> np.ndarray:
    """E_y [H, H*W]: E_y[i, (h, w)] = [i == h]. Multiplying by it expands an
    h-indexed column to the flattened (h, w) grid without any lane-unaligned
    reshape. (The w-expansion is a pltpu.repeat tile in the kernel, so no
    E_x constant is needed.)"""
    ey = np.zeros((h, h * w), np.float32)
    cols = np.arange(h * w)
    ey[cols // w, cols] = 1.0
    return ey


def _kernel(ryx_ref, rxx_ref, ey_ref, fmap_ref, out_ref):
    # all-2D body (Mosaic rejects high-rank reshapes): rows are (r, p, q).
    # bf16 temporaries keep the three [RT*49, H*W] tiles inside VMEM at
    # ROI_TILE=32. Column expansion w -> (h, w) is a lane-repeat tile on the
    # VPU; h -> (h, w) is one 0/1 expansion GEMM (E_y) — doing both as GEMMs
    # would cost a third of the kernel's FLOPs (the K axis pads 37->128).
    dt = fmap_ref.dtype
    h = ey_ref.shape[0]
    # pltpu.repeat has TILE semantics (whole-array copies along the axis):
    # tiling rx H times along lanes gives col (h, w) -> rx[row, w] exactly;
    # the h-expansion (value constant across each W-wide group) needs the
    # 0/1 expansion GEMM.
    rye = jnp.dot(ryx_ref[0], ey_ref[:],
                  preferred_element_type=jnp.float32).astype(dt)
    rxe = pltpu.repeat(rxx_ref[0], h, axis=1)        # [RT*P*P, H*W]
    w2 = rye * rxe                                   # [RT*P*P, H*W]
    out = jnp.dot(w2, fmap_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_forward(fmap: Array, rois: Array, valid: Array | None,
                    out_size: int, spatial_scale: float) -> Array:
    b, h, w, c = fmap.shape
    r = rois.shape[1]
    p = out_size
    # weights computed exactly like _roi_align_matmul (same dtype path) so
    # the kernel is a bit-compatible drop-in for the separable form
    s = jnp.asarray(spatial_scale, fmap.dtype)
    rois_c = rois.astype(fmap.dtype)
    ry = interp_matrix(rois_c[..., 1] * s, rois_c[..., 3] * s, p, h)
    rx = interp_matrix(rois_c[..., 0] * s, rois_c[..., 2] * s, p, w)
    if valid is not None:
        ry = ry * valid[..., None, None].astype(ry.dtype)
    ry = ry.astype(fmap.dtype)
    rx = rx.astype(fmap.dtype)

    roi_tile = _pick_roi_tile(h * w, p, jnp.dtype(fmap.dtype).itemsize)
    pad = (-r) % roi_tile
    if pad:
        ry = jnp.pad(ry, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rx = jnp.pad(rx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    rp = r + pad
    tiles = rp // roi_tile
    rows_per_tile = roi_tile * p * p

    # row-broadcast to the (r, p, q) grid OUTSIDE the kernel (tiny: [*, H]
    # columns, ~58MB at eval scale) so the kernel body stays 2-D
    ryx = jnp.broadcast_to(ry[:, :, :, None, :],
                           (b, rp, p, p, h)).reshape(b, rp * p * p, h)
    rxx = jnp.broadcast_to(rx[:, :, None, :, :],
                           (b, rp, p, p, w)).reshape(b, rp * p * p, w)

    ey = _expansion_constant(h, w)
    fmap_flat = fmap.reshape(b, h * w, c)

    flops = 2 * b * rp * p * p * h * w * c
    out = pl.pallas_call(
        _kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, rows_per_tile, h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_tile, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h * w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rp * p * p, c), fmap.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=fmap_flat.size * 2 * tiles +
            rp * p * p * b * c * 2, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        # run in Mosaic interpret mode off-TPU (same policy as pallas_nms)
        interpret=jax.default_backend() != "tpu",
    )(ryx, rxx, jnp.asarray(ey, fmap.dtype), fmap_flat)
    return out.reshape(b, rp, p, p, c)[:, :r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_roi_align(fmap: Array, rois: Array, valid: Array | None,
                     out_size: int, spatial_scale: float) -> Array:
    """Drop-in replacement for ops.roi_align._roi_align_impl (one chunk):
    fmap [B, H, W, C], rois [B, R, 4] -> [B, R, P, P, C]."""
    return _pallas_forward(fmap, rois, valid, out_size, spatial_scale)


def _fwd(fmap, rois, valid, out_size, spatial_scale):
    return (_pallas_forward(fmap, rois, valid, out_size, spatial_scale),
            (fmap, rois, valid))


def _bwd(out_size, spatial_scale, res, g):
    fmap, rois, valid = res
    # separable-form VJP (autodiff): same math, and the backward runs only
    # on train-scale pair counts where the separable form is not the
    # bottleneck. rois/valid get no gradient (indices in the reference too).
    _, vjp = jax.vjp(
        lambda f: _roi_align_matmul(f, rois, valid, out_size, spatial_scale),
        fmap)
    return vjp(g)[0], None, None


pallas_roi_align.defvjp(_fwd, _bwd)
