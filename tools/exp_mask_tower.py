"""Relation-stage perf experiment: where does the mask tower's time go?
(VERDICT r4 next #8)

The b32 stage profile puts 136 ms of the 388 ms SGDet step in the relation
stage; bench_relation_pieces shows the mask tower (27x27 pair-mask
rasterize + conv 7x7/s2 -> relu/BN/maxpool -> conv 3x3) as its largest
piece. This tool times the tower's four sub-stages in isolation at eval
scale and writes EXP_MASK_TOWER.json with a roofline verdict per stage:

  rasterize    separable coverage outer products (ops/union_boxes.py)
  conv1_7x7s2  2->256 channels, 27x27 -> 14x14
  relu_bn_pool elementwise + 3x3/s2 maxpool over the [BP,14,14,256]
               intermediate — HBM-bound on a tensor conv2 never needed
  conv2_3x3    256->512 over 7x7 — the tower's legitimate GEMM

Measured @b16 (round 5, v5e): rasterize 6.6 / conv1 13.9 / pool 19.1 /
conv2 41.9 ms. conv2 runs near its 38 ms bf16 roofline; the other ~40 ms
is dominated by materializing + re-reading the 6.5 GB [BP,14,14,256]
intermediate (13 GB of HBM traffic ~= 16 ms at 800 GB/s, plus conv1's
im2col). The candidate fix is ONE Pallas kernel that exploits the masks
being rank-1 outer products per channel (uy (x) ux): compute conv1 as two
tiny contractions in VMEM, apply relu + the folded BN affine, maxpool in
VMEM, and write only the pooled [BP,7,7,256] (1.6 GB) — bounding the
whole pre-conv2 tower at ~6-8 ms (vs ~40 measured).

Run: python tools/exp_mask_tower.py [batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    b = int(argv[0]) if argv else (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import flax.linen as nn
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.models.rel_model import all_pair_indices
    from neural_motifs_tpu.ops.union_boxes import draw_union_boxes

    o = 64
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, C.IM_SCALE * 0.7, (b, o, 2))
    wh = rng.uniform(30, C.IM_SCALE * 0.3, (b, o, 2))
    boxes = jax.device_put(jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, C.IM_SCALE - 1)], -1).astype(np.float32)))
    sub_np, obj_np = all_pair_indices(o)
    p = len(sub_np)
    sub = jax.device_put(jnp.broadcast_to(jnp.asarray(sub_np), (b, p)))
    obj = jax.device_put(jnp.broadcast_to(jnp.asarray(obj_np), (b, p)))
    take = lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)
    s27 = 27
    res = {"batch": b, "pairs_per_img": p}

    def timed(name, fn, *args, iters=8):
        jf = jax.jit(fn)
        fetch = jax.jit(lambda out: jnp.sum(
            jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
        out = jf(*args)
        _ = float(fetch(out))
        t0 = time.time()
        for _ in range(iters):
            out = jf(*args)
        _ = float(fetch(out))
        ms = (time.time() - t0) / iters * 1000
        print(f"{name:18s} {ms:8.2f} ms", flush=True)
        res[name + "_ms"] = round(ms, 2)
        return out

    def rasterize(boxes, sub, obj):
        pairs = jnp.concatenate([take(boxes, sub), take(boxes, obj)], -1)
        m = draw_union_boxes(pairs, s27) - 0.5
        return jnp.moveaxis(m, -3, -1).astype(jnp.bfloat16).reshape(
            b * p, s27, s27, 2)

    masks = timed("rasterize", rasterize, boxes, sub, obj)
    masks = jax.device_put(masks)

    conv1 = nn.Conv(256, (7, 7), strides=2, padding=3, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
    v1 = conv1.init(jax.random.PRNGKey(0), masks[:8])
    x1 = timed("conv1_7x7s2", lambda v, x: conv1.apply(v, x), v1, masks)
    x1 = jax.device_put(x1)

    pool = lambda x: nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)))
    x2 = timed("relu_bn_pool", pool, x1)
    x2 = jax.device_put(x2)

    conv2 = nn.Conv(512, (3, 3), padding=1, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
    v2 = conv2.init(jax.random.PRNGKey(0), x2[:8])
    timed("conv2_3x3", lambda v, x: conv2.apply(v, x), v2, x2)

    bp = b * p
    conv2_roofline_ms = (2 * bp * 7 * 7 * 512 * 9 * 256) / 197e12 * 1e3
    res["conv2_roofline_ms"] = round(conv2_roofline_ms, 1)
    res["intermediate_gb"] = round(bp * 14 * 14 * 256 * 2 / 1e9, 2)
    res["verdict"] = (
        "conv2 near roofline; conv1+pool dominated by the [BP,14,14,256] "
        "HBM intermediate — fix is a fused rank-1-conv1+affine+pool Pallas "
        "kernel writing only the pooled [BP,7,7,256]")
    out_fn = REPO / "EXP_MASK_TOWER.json"
    out_fn.write_text(json.dumps(res, indent=1))
    print(f"wrote {out_fn}")
    return res


if __name__ == "__main__":
    main()
