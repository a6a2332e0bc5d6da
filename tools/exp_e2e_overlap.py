"""Attribute the serving-e2e overlap gap (VERDICT r4 weak #2 / next #4).

BENCH_E2E_r04.json: e2e 42.2 img/s vs min-stage bound 54.7 (overlap
efficiency 0.64) — ~12 img/s unattributed. Hypotheses, each measured
in isolation here at the bench config (b8, 592x592, uint8 host batches):

  H1 host->device transfer cost: the device-only leg runs on RESIDENT
     buffers; e2e must ship ~8.4 MB of uint8 images per batch over the
     axon tunnel to the remote TPU. Measured: t_put.
  H2 transfer/compute serialization: if the remote link serializes
     device_put with the running step (one ordered stream), the transfer
     can never hide under device compute no matter what the host does.
     Measured: dispatch a step on resident buffers, device_put the next
     batch while it runs — overlapped wall vs serial sum.
  H3 fetch round trip: the pipelined scalar fetch (~25-30 ms tunnel
     latency, attributed in round 4) — re-measured here as t_fetch.
  H4 decode/dispatch GIL contention on the 1-core host: loader-only
     rate with and without a concurrent device pipeline.

Writes EXP_E2E_OVERLAP.json with the per-piece times and a predicted
e2e rate from the serialization model; if predicted ~= measured e2e,
the gap is attributed (structural on this platform), and the fix/negative
is recorded per the exp_s2d_backbone.py standard.

Run: python tools/exp_e2e_overlap.py [--out EXP_E2E_OVERLAP.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def median_time(fn, iters=12, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-images", type=int, default=96)
    ap.add_argument("--out", default=str(REPO / "EXP_E2E_OVERLAP.json"))
    a = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.batching import Loader, device_prefetch
    from neural_motifs_tpu.models.rel_model import RelModel
    from tools.bench_loader import JpegDataset

    tmp = os.path.join(tempfile.gettempdir(), "nm_loader_bench")
    os.makedirs(tmp, exist_ok=True)
    ds = JpegDataset(tmp, a.n_images)
    budgets = C.PadBudgets()
    rng = np.random.RandomState(0)
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    model = RelModel(
        num_classes=nc, num_rels=npred, mode="sgdet", budgets=budgets,
        dtype=jnp.bfloat16, hidden_dim=512, pooling_dim=4096, obj_dim=4096,
        embed_dim=200, nl_obj=2, nl_edge=4, order="leftright", use_bias=True,
        use_tanh=False, limit_vision=False, thresh=0.05,
        embed_vecs=rng.randn(nc, 200).astype(np.float32) * 0.1,
        decoder_embed_vecs=rng.randn(nc + 1, 100).astype(np.float32) * 0.1,
        freq_table=rng.randn(nc * nc, npred).astype(np.float32) * 0.1)

    loader = Loader(ds, a.batch, shuffle=False, num_workers=1, prefetch=4,
                    budgets=budgets, process_index=0, process_count=1,
                    im_budget=(592, 592))
    first = next(iter(loader))
    host_images = np.asarray(first.images)
    host_hw = np.asarray(first.im_hw)
    img_bytes = host_images.nbytes

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    init_kw = dict(images=jnp.asarray(first.images),
                   im_hw=jnp.asarray(first.im_hw),
                   gt_boxes=jnp.asarray(first.gt_boxes),
                   gt_classes=jnp.asarray(first.gt_classes),
                   gt_mask=jnp.asarray(first.gt_mask),
                   gt_rels=jnp.asarray(first.gt_rels),
                   gt_rel_mask=jnp.asarray(first.gt_rel_mask))
    variables = jax.jit(lambda rr: model.init(rr, train=True, **init_kw))(rngs)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def forward(p, bs, images, im_hw):
        return model.apply({"params": p, "batch_stats": bs},
                           images=images, im_hw=im_hw, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})

    dimg = jax.device_put(jnp.asarray(host_images))
    dhw = jax.device_put(jnp.asarray(host_hw))
    out = forward(params, batch_stats, dimg, dhw)
    _ = float(jnp.sum(out.obj_scores))
    print("# compiled", flush=True)

    res = {"batch": a.batch, "image_mb_per_batch": round(img_bytes / 1e6, 2)}

    # --- t_put: host->device transfer, fully synchronous
    def put():
        jax.block_until_ready(jax.device_put(host_images))
    res["t_put_s"] = round(median_time(put), 4)

    # --- concurrent puts: if the link pipelines, N in-flight transfers
    # amortize the per-chunk round trips and t_put_concurrent << t_put
    def put4():
        bufs = [jax.device_put(host_images) for _ in range(4)]
        for bb in bufs:
            jax.block_until_ready(bb)
    res["t_put_concurrent4_per_put_s"] = round(median_time(put4, iters=6) / 4,
                                               4)

    # --- t_fetch: device->host round trip of a FRESH tiny computation each
    # call (a cached jax.Array memoizes _value; fetching it twice is free)
    jsum = jax.jit(lambda x, i: jnp.sum(x) + i)
    res["t_fetch_s"] = round(median_time(
        lambda: float(jsum(dhw, np.random.randint(1000)))), 4)

    # --- t_step: device step, amortized (dispatch N, one fetch)
    def steps_n(n=4):
        pend = None
        for _ in range(n):
            pend = forward(params, batch_stats, dimg, dhw)
        _ = float(jnp.sum(pend.obj_scores))

    t4 = median_time(lambda: steps_n(4), iters=6)
    t8 = median_time(lambda: steps_n(8), iters=6)
    t_step = (t8 - t4) / 4.0
    res["t_step_s"] = round(t_step, 4)

    # --- H2: can a device_put hide under a running step?
    def overlapped():
        pend = forward(params, batch_stats, dimg, dhw)
        d2 = jax.device_put(host_images)        # issued while step runs
        jax.block_until_ready(d2)
        _ = float(jnp.sum(pend.obj_scores))

    t_olap = median_time(overlapped)
    serial = t_step + res["t_put_s"] + res["t_fetch_s"]
    res["t_step_plus_put_overlapped_s"] = round(t_olap, 4)
    res["t_step_plus_put_serial_model_s"] = round(serial, 4)
    # 1.0 = fully serialized (put+fetch add linearly), 0.0 = fully hidden
    res["put_serialization_fraction"] = round(
        max(0.0, (t_olap - t_step))
        / max(res["t_put_s"] + res["t_fetch_s"], 1e-9), 3)

    # --- H4: loader-only rate (decode+collate on the single core)
    t0 = time.time()
    n = sum(b.images.shape[0] for b in loader)
    res["loader_only_imgs_s"] = round(n / (time.time() - t0), 2)

    # --- measured e2e (same protocol as bench_e2e_eval), at prefetch
    # depths 2 (the default) and 4 (deeper transfer pipelining)
    prep = lambda b: (jax.device_put(jnp.asarray(b.images)),
                      jax.device_put(jnp.asarray(b.im_hw)))
    for depth in (2, 4):
        t0 = time.time()
        pending, count = None, 0
        for b, (di, dh) in device_prefetch(loader, prep, depth=depth):
            pred = forward(params, batch_stats, di, dh)
            if pending is not None:
                _ = float(jnp.sum(pending.obj_scores))
            pending = pred
            count += b.images.shape[0]
        _ = float(jnp.sum(pending.obj_scores))
        res[f"e2e_imgs_s_depth{depth}"] = round(count / (time.time() - t0), 2)
    res["e2e_imgs_s"] = res["e2e_imgs_s_depth2"]

    # serialization-model prediction: per batch, the link pays
    # step + serialized_fraction*(put+fetch), and the host decode runs in
    # parallel (bounded below by the loader rate)
    ser = res["put_serialization_fraction"]
    t_link = t_step + ser * (res["t_put_s"] + res["t_fetch_s"])
    pred_rate = min(a.batch / t_link, res["loader_only_imgs_s"])
    res["e2e_predicted_imgs_s"] = round(pred_rate, 2)
    res["model_error_pct"] = round(
        100 * (pred_rate - res["e2e_imgs_s"]) / res["e2e_imgs_s"], 1)

    print(json.dumps(res, indent=1))
    Path(a.out).write_text(json.dumps(res, indent=1))
    print(f"wrote {a.out}")
    return res


if __name__ == "__main__":
    main()
