"""A/B the int8 serving path (NM_QUANT=int8, ops/quant.py) against the
default bf16 towers at the bench config, on the attached TPU.

Measures, on identical inputs and identical parameters:
  * steady-state img/s for both paths (pipelined dispatch/fetch, scalar
    fetch as the remote-platform barrier),
  * discrete divergence of what R@K actually consumes: top-K triplet-set
    Jaccard and top-1 triplet agreement per image (same protocol as
    tools/precision_audit.py).

Two separate processes would be cleaner for jit-cache hygiene, but the env
flag is read at TRACE time (ops/quant.py quant_mode) and the two variants
hash to different jaxprs, so within-process A/B is sound; the flag is set
before each jit and the compiled executables are distinct.

Usage: NM_BENCH_BATCH=24 python tools/bench_quant.py [iters]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def topk_triplets(pred, k=100):
    """Set of (sub_idx, obj_idx, predicate) for the top-k triplets of each
    image in a fetched SGPrediction (rows are already triplet-score
    sorted; predicate = argmax over non-background rel scores, the same
    decode the evaluator consumes)."""
    out = []
    for i in range(pred.rel_inds.shape[0]):
        rows = set()
        for j in range(pred.rel_inds.shape[1]):
            if not pred.rel_valid[i, j] or len(rows) >= k:
                break
            rows.add((int(pred.rel_inds[i, j, 0]),
                      int(pred.rel_inds[i, j, 1]),
                      int(pred.rel_scores[i, j, 1:].argmax()) + 1))
        out.append(rows)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ.pop("NM_QUANT", None)

    import bench as bench_mod  # reuse the exact bench model/input builder

    model, params, batch_stats, images, im_hw = bench_mod.build_bench_state()
    images = jax.device_put(jnp.asarray(images))
    im_hw = jax.device_put(jnp.asarray(im_hw))

    def make_fn():
        @jax.jit
        def forward(p, bs, im, hw):
            return model.apply({"params": p, "batch_stats": bs}, images=im,
                               im_hw=hw, train=False,
                               rngs={"sample": jax.random.PRNGKey(0)})
        return forward

    results = {}
    preds = {}
    for label, env in (("bf16", None), ("int8", "int8")):
        if env is None:
            os.environ.pop("NM_QUANT", None)
        else:
            os.environ["NM_QUANT"] = env
        fn = make_fn()
        t0 = time.time()
        out = fn(params, batch_stats, images, im_hw)
        _ = float(jnp.sum(out.obj_scores))
        print(f"# {label} compile+first {time.time() - t0:.1f}s", flush=True)
        pending = fn(params, batch_stats, images, im_hw)
        t0 = time.time()
        for _ in range(iters):
            nxt = fn(params, batch_stats, images, im_hw)
            _ = float(jnp.sum(pending.obj_scores))
            pending = nxt
        dt = (time.time() - t0) / iters
        rate = images.shape[0] / dt
        results[label] = rate
        preds[label] = jax.device_get(pending)
        print(f"# {label}: {rate:.1f} img/s ({dt * 1000:.1f} ms/step)",
              flush=True)

    a, b = topk_triplets(preds["bf16"]), topk_triplets(preds["int8"])
    # two empty sets agree perfectly (an image with no surviving rels is
    # not a divergence) — without this, an all-empty prediction batch
    # reads as jaccard 0.0 and looks like total disagreement
    jac = [1.0 if not (x | y) else len(x & y) / len(x | y)
           for x, y in zip(a, b)]
    sizes = [len(x) for x in a]
    import json
    print(json.dumps({
        "bf16_img_s": round(results["bf16"], 2),
        "int8_img_s": round(results["int8"], 2),
        "speedup": round(results["int8"] / results["bf16"], 3),
        "top100_triplet_jaccard_mean": round(float(np.mean(jac)), 4),
        "top100_triplet_jaccard_min": round(float(np.min(jac)), 4),
        # if this is ~0 the jaccard comparison is vacuous (no rels kept
        # at all, e.g. random-init params + sgdet NMS)
        "bf16_top100_mean_set_size": round(float(np.mean(sizes)), 1),
    }))


if __name__ == "__main__":
    main()
