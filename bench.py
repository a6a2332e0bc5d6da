"""Benchmark: MotifNet SGDet inference throughput (images/sec/chip) at full
VG scale (592x592 images, 151 classes, 51 predicates, top-64 objects, all
overlapping pairs) on the attached TPU.

Baseline: the reference publishes no in-repo throughput number
(BASELINE.md); the widely-reported eval speed of the PyTorch 0.3 SGDet
pipeline on a Titan X is ~2 img/s (sequential host NMS + python decoder
loop). BASELINE.json's target is >=5x Titan-X img/s/chip, so
vs_baseline = imgs_per_sec / 2.0 — the target is vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

TITAN_X_SGDET_IMG_S = 2.0  # documented estimate, see module docstring


def build_bench_state(batch=None):
    """Bench-config model + inputs + initialized params, shared with the
    A/B tools (tools/bench_quant.py). Returns
    (model, params, batch_stats, images_np [B,H,W,3] f32, im_hw_np)."""
    import jax

    # Device-discovery watchdog: a wedged remote chip (stale terminal
    # lease/dead terminal) makes PJRT init block FOREVER with zero output —
    # fail loud and fast instead so the caller gets a diagnosable record.
    # Healthy init is < 60 s; compiles happen after devices() returns and
    # are not subject to this timer.
    import threading

    _init_done = threading.Event()

    def _watchdog():
        if not _init_done.wait(300):
            rec = {
                "metric": "sgdet_inference_imgs_per_sec_per_chip",
                "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
                "error": "TPU device discovery timed out after 300s — "
                         "remote terminal unreachable/wedged"}
            # attach the most recent on-device measurement (clearly labeled
            # as prior-round evidence, NOT this run's value) so a
            # wedged-chip round still carries a diagnosable record
            try:
                import os as _os
                here = _os.path.dirname(_os.path.abspath(__file__))
                prior = sorted(f for f in _os.listdir(here)
                               if f.startswith("BENCH_r")
                               and f.endswith(".json"))
                if prior:
                    with open(_os.path.join(here, prior[-1])) as f:
                        rec["last_good_round"] = {
                            "file": prior[-1],
                            "parsed": json.load(f).get("parsed")}
            except Exception:
                pass
            print(json.dumps(rec), flush=True)
            import os as _os
            _os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()
    _init_done.set()

    # persistent compile cache: repeat runs of the same config skip the
    # ~8-minute XLA compile (same knobs tests/conftest.py uses)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.models.rel_model import RelModel

    # default = the tuned config (round-4 sweep with the Pallas RoIAlign
    # default: 82.8 @b32 / 86.2 @b48 img/s — the batch amortizes the
    # serial NMS/decode chains, and the ~11min cold compile is paid once
    # into the persistent cache) so the tracked BENCH artifact reflects
    # real capability. The "~25ms fixed per-step
    # overhead" noted in earlier rounds was attributed in round 4: it is
    # the axon tunnel's host-fetch round trip, hidden by the pipelined
    # loop below and absent from device time (docs/ROUND4.md §3).
    if batch is None:
        batch = int(__import__("os").environ.get("NM_BENCH_BATCH", "48"))

    budgets = C.PadBudgets()
    rng = np.random.RandomState(0)
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    model_name = __import__("os").environ.get("NM_BENCH_MODEL", "motifnet")
    # NM_BENCH_THRESH=0.0 keeps the top-64 rois regardless of (untrained)
    # detector scores — used by the A/B fidelity tools so sgdet decisions
    # are non-vacuous at random init (same trick as tools/precision_audit)
    thresh = float(__import__("os").environ.get("NM_BENCH_THRESH", "0.05"))
    if model_name == "stanford":
        from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
        model = RelModelStanford(
            num_classes=nc, num_rels=npred, mode="sgdet", budgets=budgets,
            dtype=jnp.bfloat16, thresh=thresh)
    else:
        model = RelModel(
            num_classes=nc, num_rels=npred, mode="sgdet", budgets=budgets,
            dtype=jnp.bfloat16, hidden_dim=512, pooling_dim=4096, obj_dim=4096,
            embed_dim=200, nl_obj=2, nl_edge=4, order="leftright", use_bias=True,
            use_tanh=False, limit_vision=False, thresh=thresh,
            embed_vecs=rng.randn(nc, 200).astype(np.float32) * 0.1,
            decoder_embed_vecs=rng.randn(nc + 1, 100).astype(np.float32) * 0.1,
            freq_table=rng.randn(nc * nc, npred).astype(np.float32) * 0.1,
            union_chunk=int(__import__("os").environ.get("NM_BENCH_CHUNK", "512")))

    g, r = budgets.max_gt_boxes, budgets.max_gt_rels
    im = C.IM_SCALE
    images = rng.randn(batch, im, im, 3).astype(np.float32) * 0.3
    im_hw = np.full((batch, 2), float(im), np.float32)
    gt_boxes = np.zeros((batch, g, 4), np.float32)
    gt_classes = np.zeros((batch, g), np.int32)
    gt_mask = np.zeros((batch, g), bool)
    gt_rels = np.zeros((batch, r, 3), np.int32)
    gt_rel_mask = np.zeros((batch, r), bool)
    for i in range(batch):
        n = 12
        xy = rng.uniform(0, im * 0.6, (n, 2))
        wh = rng.uniform(30, im * 0.35, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, im - 1)], 1)
        gt_classes[i, :n] = rng.randint(1, nc, n)
        gt_mask[i, :n] = True

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    t0 = time.time()
    init_kw = dict(images=jnp.asarray(images), im_hw=jnp.asarray(im_hw),
                   gt_boxes=jnp.asarray(gt_boxes),
                   gt_classes=jnp.asarray(gt_classes),
                   gt_mask=jnp.asarray(gt_mask), gt_rels=jnp.asarray(gt_rels),
                   gt_rel_mask=jnp.asarray(gt_rel_mask))
    variables = jax.jit(lambda r: model.init(r, train=True, **init_kw))(rngs)
    print(f"# init {time.time() - t0:.1f}s", flush=True)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, params, batch_stats, images, im_hw


def main():
    import jax
    import jax.numpy as jnp

    iters = int(__import__("os").environ.get("NM_BENCH_ITERS", "10"))
    model, params, batch_stats, images, im_hw = build_bench_state()

    @jax.jit
    def forward(params, batch_stats, images, im_hw):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images=images, im_hw=im_hw, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})

    def analyzed_flops(*args) -> float | None:
        """XLA's own FLOP count for the compiled step (counts matmul/conv
        MACs×2; Pallas custom-calls are opaque to it — NMS/RoIAlign kernels
        are a small share of total FLOPs, so this slightly UNDERcounts)."""
        try:
            cost = forward.lower(*args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost["flops"])
        except Exception as e:  # remote backends may not expose cost models
            print(f"# cost_analysis unavailable: {e}", flush=True)
            return None

    # bf16 peak of the attached chip generation, for MFU
    _PEAKS = {"TPU v5 lite": 197e12, "TPU v5": 275e12, "TPU v4": 275e12,
              "TPU v6 lite": 918e12}
    def peak_flops() -> float | None:
        kind = jax.devices()[0].device_kind
        for k, v in _PEAKS.items():
            if kind.startswith(k):
                return v
        return None

    # several distinct input buffers, resident on device, cycled so no
    # caching/do-nothing shortcut is possible; every iteration blocks.
    dbufs = [jax.device_put(jnp.asarray(images + 0.01 * k))
             for k in range(min(4, iters))]
    dhw = jax.device_put(jnp.asarray(im_hw))

    t0 = time.time()
    out = forward(params, batch_stats, dbufs[0], dhw)
    # IMPORTANT: under the axon remote platform block_until_ready is a no-op
    # until the first host fetch; pull a scalar to force real execution.
    _ = float(jnp.sum(out.obj_scores))
    print(f"# compile+first+fetch {time.time() - t0:.1f}s", flush=True)

    # warmup (fetch again so readiness tracking is live)
    out = forward(params, batch_stats, dbufs[-1], dhw)
    _ = float(jnp.sum(out.obj_scores))

    profile_dir = __import__("os").environ.get("NM_BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            jax.block_until_ready(forward(params, batch_stats, dbufs[0], dhw))

    sync = __import__("os").environ.get("NM_BENCH_SYNC") == "1"
    per_iter = []
    if sync:
        # latency mode: hard barrier every iteration (includes the ~30ms remote
        # dispatch+fetch round trip of the axon tunnel per step)
        for i in range(iters):
            t0 = time.time()
            out = forward(params, batch_stats, dbufs[i % len(dbufs)], dhw)
            _ = float(jnp.sum(out.obj_scores))   # scalar fetch = hard barrier
            per_iter.append(time.time() - t0)
    else:
        # throughput mode (default): software-pipelined like a real eval
        # loop — dispatch step i, then fetch step i-1's scalar, so the host
        # round trip overlaps device compute. Every step's result is still
        # fully fetched (no iteration can be skipped by the runtime).
        pending = forward(params, batch_stats, dbufs[0], dhw)
        t_prev = time.time()
        for i in range(1, iters + 1):
            nxt = (forward(params, batch_stats, dbufs[i % len(dbufs)], dhw)
                   if i < iters else None)
            _ = float(jnp.sum(pending.obj_scores))  # fetch step i-1
            now = time.time()
            per_iter.append(now - t_prev)
            t_prev = now
            pending = nxt
    # median per-iteration time is robust to tunnel hiccups
    med = sorted(per_iter)[len(per_iter) // 2]
    print(f"# per-iter times ({'sync' if sync else 'pipelined'}): "
          f"{[round(t, 4) for t in per_iter]}", flush=True)
    img_s = images.shape[0] / med

    rec = {
        "metric": "sgdet_inference_imgs_per_sec_per_chip",
        "value": round(img_s, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_s / TITAN_X_SGDET_IMG_S, 3),
    }
    flops = analyzed_flops(params, batch_stats, dbufs[0], dhw)
    peak = peak_flops()
    if flops:
        rec["flops_per_img"] = round(flops / images.shape[0], 0)
        if peak:
            rec["mfu"] = round(flops / med / peak, 4)
            rec["peak_flops_bf16"] = peak
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
