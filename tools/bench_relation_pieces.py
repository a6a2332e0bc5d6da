"""Micro-benchmark of the SGDet relation-stage pieces at eval scale.

The stage profiler (bench_eval_stages.py) shows the relation stage at
~127ms of the 213ms batch-8 step; this tool times its components in
isolation on the attached TPU with the exact eval shapes:

  fmap [B, 37, 37, 512] bf16, 64 objects/img, P = 4032 ordered pairs/img

  roi_align_union : union-box RoIAlign, chunk 512 (the [R, 7, 37, 512]
                    interpolation intermediate is the HBM cost)
  mask_conv       : 27x27 pair-mask rasterize + 2-conv net
  union_fc        : 25088->4096 + 4096->4096 fc tower over all pairs
  pair_head       : edge-rep gather/product + rel_compress + freq gather
  sort            : triplet score + argsort + score gather (decode tail)

Usage: python tools/bench_relation_pieces.py [iters] [batch]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(name, fn, *args, iters=8):
    """Dispatch `iters` executions back-to-back and fetch ONE scalar at the
    end: device executions serialize, so (total / iters) is the per-step
    device time without the ~28ms-per-fetch axon tunnel overhead that a
    fetch-every-iteration loop would add."""
    import jax
    import jax.numpy as jnp
    jf = jax.jit(fn)
    # barrier WITHOUT materializing an f32 copy of the (multi-GB at b32)
    # output: sum in the native dtype, cast only the scalar
    fetch = jax.jit(lambda o: jnp.sum(
        jax.tree_util.tree_leaves(o)[0]).astype(jnp.float32))
    t0 = time.time()
    out = jf(*args)
    _ = float(fetch(out))
    compile_s = time.time() - t0
    t0 = time.time()
    for _i in range(iters):
        out = jf(*args)
    _ = float(fetch(out))
    med = (time.time() - t0) / iters
    print(f"{name:16s} {med * 1000:8.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.models.rel_model import (UnionVGGHead,
                                                    all_pair_indices)
    from neural_motifs_tpu.ops import boxes as box_ops
    from neural_motifs_tpu.ops.roi_align import roi_align
    from neural_motifs_tpu.ops.union_boxes import draw_union_boxes

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    o = 64
    h = w = C.IM_SCALE // C.FEAT_STRIDE  # 37
    cdim = 512
    rng = np.random.RandomState(0)

    fmap = jax.device_put(jnp.asarray(
        rng.randn(b, h, w, cdim).astype(np.float32)).astype(jnp.bfloat16))
    xy = rng.uniform(0, C.IM_SCALE * 0.7, (b, o, 2))
    wh = rng.uniform(30, C.IM_SCALE * 0.3, (b, o, 2))
    boxes = jax.device_put(jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, C.IM_SCALE - 1)], -1).astype(np.float32)))
    sub_np, obj_np = all_pair_indices(o)
    p = len(sub_np)
    sub = jax.device_put(jnp.broadcast_to(jnp.asarray(sub_np), (b, p)))
    obj = jax.device_put(jnp.broadcast_to(jnp.asarray(obj_np), (b, p)))
    pvalid = jax.device_put(jnp.ones((b, p), bool))

    take = lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)

    def union_align(fmap, boxes, sub, obj, pvalid):
        sb = take(boxes, sub)
        ob = take(boxes, obj)
        union = box_ops.union_box(sb, ob)
        return roi_align(fmap, union, pvalid, 7, 1.0 / C.FEAT_STRIDE,
                         chunk=int(os.environ.get("NM_BENCH_CHUNK", "512")))

    t_align = timed("roi_align_union", union_align, fmap, boxes, sub, obj,
                    pvalid, iters=iters)

    # mask rasterize + conv (params initialized once, applied functionally)
    import flax.linen as nn

    class MaskConv(nn.Module):
        @nn.compact
        def __call__(self, masks):
            bp, s, _, _ = masks.shape
            x = nn.Conv(256, (7, 7), strides=2, padding=3,
                        dtype=jnp.bfloat16, param_dtype=jnp.float32)(masks)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            x = nn.Conv(512, (3, 3), padding=1, dtype=jnp.bfloat16,
                        param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            return x

    mc = MaskConv()
    s27 = 27
    dummy = jnp.zeros((8, s27, s27, 2), jnp.bfloat16)
    mc_vars = mc.init(jax.random.PRNGKey(0), dummy)

    def mask_conv(boxes, sub, obj):
        sb = take(boxes, sub)
        ob = take(boxes, obj)
        pairs = jnp.concatenate([sb, ob], -1)
        masks = draw_union_boxes(pairs, s27) - 0.5
        masks = jnp.moveaxis(masks, -3, -1).astype(jnp.bfloat16)
        x = masks.reshape(b * p, s27, s27, 2)
        return mc.apply(mc_vars, x)

    t_mask = timed("mask_conv", mask_conv, boxes, sub, obj, iters=iters)

    head = UnionVGGHead(pooling_dim=4096, fc_dim=4096, dtype=jnp.bfloat16)
    pooled = jax.device_put(jnp.asarray(
        rng.randn(b, 512, 7, 7, cdim).astype(np.float32)).astype(jnp.bfloat16))
    hvars = head.init(jax.random.PRNGKey(0), pooled)

    def union_fc(hvars, pooled):
        # chunked like the model: 8 chunks of 512 pairs; params passed as an
        # argument (a closure would embed 411MB of weights as jit constants
        # and blow up the remote-compile request). Each chunk input is
        # perturbed so XLA cannot CSE the 8 applications into one.
        outs = []
        for k in range(p // 512 + (1 if p % 512 else 0)):
            outs.append(head.apply(
                hvars, pooled * jnp.bfloat16(1.0 + 1e-3 * k), train=False))
        return jnp.concatenate(outs, axis=1)

    t_fc = timed("union_fc(x8chk)", union_fc, hvars, pooled, iters=iters)

    edge_rep = jax.device_put(jnp.asarray(
        rng.randn(b, o, 2, 4096).astype(np.float32)))
    wcomp = jax.device_put(jnp.asarray(
        rng.randn(4096, 51).astype(np.float32) * 0.01).astype(jnp.bfloat16))
    freq = jax.device_put(jnp.asarray(
        rng.randn(151 * 151, 51).astype(np.float32)))
    preds = jax.device_put(jnp.asarray(
        rng.randint(1, 151, (b, o)).astype(np.int32)))
    vr = jax.device_put(jnp.asarray(
        rng.randn(b, p, 4096).astype(np.float32)).astype(jnp.bfloat16))

    def pair_head(edge_rep, vr, preds):
        srep = take(edge_rep[:, :, 0], sub)
        orep = take(edge_rep[:, :, 1], obj)
        prod = (srep * orep).astype(jnp.bfloat16) * vr
        dists = (prod @ wcomp).astype(jnp.float32)
        sc = jnp.take_along_axis(preds, sub, 1)
        oc = jnp.take_along_axis(preds, obj, 1)
        return dists + freq[sc * 151 + oc]

    t_head = timed("pair_head", pair_head, edge_rep, vr, preds, iters=iters)

    rel_dists = jax.device_put(jnp.asarray(
        rng.randn(b, p, 51).astype(np.float32)))
    oscores = jax.device_put(jnp.asarray(
        rng.rand(b, o).astype(np.float32)))

    def sort_stage(rel_dists, oscores):
        rel_rep = jax.nn.softmax(rel_dists, axis=-1)
        s0 = jnp.take_along_axis(oscores, sub, 1)
        s1 = jnp.take_along_axis(oscores, obj, 1)
        trip = jnp.max(rel_rep[..., 1:], -1) * s0 * s1
        order = jnp.argsort(-trip, axis=1)
        return jnp.take_along_axis(rel_rep, order[..., None], axis=1)

    t_sort = timed("sort", sort_stage, rel_dists, oscores, iters=iters)

    total = t_align + t_mask + t_fc + t_head + t_sort
    print(f"\nsum of pieces @b{b}: {total * 1000:.1f} ms "
          f"(stage profiler said ~127 ms inside the full step)")


if __name__ == "__main__":
    main()
