"""Relation evaluation entry point (equivalent of reference
models/eval_rels.py): runs the model over val/test, prints R@20/50/100,
optionally caches prediction entries."""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader, loader_im_kw
from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
from neural_motifs_tpu.models.rel_model import prediction_to_entries
from neural_motifs_tpu.training import checkpoint as ckpt_lib
from neural_motifs_tpu.training.train_rels import batch_kwargs, build_model



def main(argv=None, datasets=None):
    """datasets: optional (train, val, test) triple built by the caller with
    explicit paths (e.g. tools/parity_runbook.py); default loads VG from the
    configured data dir."""
    cfg = C.ModelConfig.from_args(argv)
    if datasets is not None:
        train, val, test = datasets
    else:
        try:
            from neural_motifs_tpu.data.visual_genome import VG
            train, val, test = VG.splits(num_val_im=cfg.val_size,
                                         filter_duplicate_rels=True,
                                         use_proposals=cfg.use_proposals,
                                         filter_non_overlap=cfg.mode == "sgdet")
        except FileNotFoundError as e:
            print(f"[eval_rels] {e}\nFalling back to SyntheticVG.")
            from neural_motifs_tpu.data.synthetic import SyntheticVG
            train, val, test = SyntheticVG.splits(num_images=32)
    data = test if cfg.test else val

    model = build_model(cfg, train)
    loader = Loader(data, cfg.batch_size * cfg.num_devices, shuffle=False,
                    budgets=cfg.budgets, num_workers=cfg.num_workers,
                    drop_last=False, **loader_im_kw(cfg))
    example = loader.peek()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)},
                           train=True, **batch_kwargs(example))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    params, batch_stats = ckpt_lib.restore_rel_variables(cfg, params,
                                                         batch_stats)

    eval_fn = jax.jit(lambda p, bs, kw: model.apply(
        {"params": p, "batch_stats": bs}, train=False,
        rngs={"sample": jax.random.PRNGKey(0)}, **kw))

    # SPMD eval: batches sharded over the data axis, params replicated —
    # the TPU-native analog of the reference's per-GPU result gather
    # (lib/rel_model.py:549-560). -ngpu N = data-mesh size.
    from neural_motifs_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    mesh = make_mesh(num_data=cfg.num_devices)
    if mesh.size > 1:
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        batch_stats = jax.device_put(batch_stats, repl)

    evaluator = BasicSceneGraphEvaluator(cfg.mode, multiple_preds=cfg.multi_pred)
    all_pred_entries = []
    seen_ids = set()  # final-batch pad repeats an image id; evaluate once
    from neural_motifs_tpu.utils.observe import PairBudgetTelemetry
    pairs_tel = PairBudgetTelemetry(cfg.budgets.max_pairs_eval)

    def consume(batch, pred):
        # device_get blocks on the async step; by consuming batch k only
        # after batch k+1 is dispatched, the ~25MB fetch and the host-side
        # evaluator overlap the device compute of the next step
        pred = jax.device_get(pred)
        pairs_tel.update(pred.num_valid_pairs)
        for i, entry in enumerate(prediction_to_entries(pred)):
            idx = int(batch.image_ids[i])
            if idx < 0 or idx in seen_ids:   # -1 = tail-pad repeat
                continue
            seen_ids.add(idx)
            gt = {"gt_classes": data.gt_classes[idx].copy(),
                  "gt_relations": data.relationships[idx].copy(),
                  "gt_boxes": data.gt_boxes[idx].copy()}
            evaluator.evaluate_scene_graph_entry(gt, entry)
            if cfg.cache:
                all_pred_entries.append(entry)

    # device_prefetch: batch k+1's host->device image transfer runs in a
    # background thread while the device computes batch k; the pending/
    # consume pattern below additionally overlaps the result fetch + host
    # evaluator with device compute (tools/bench_e2e_eval.py measures both)
    from neural_motifs_tpu.data.batching import device_prefetch
    pending = None
    for batch, kw in device_prefetch(
            loader, lambda b: batch_kwargs(shard_batch(b, mesh))):
        pred = eval_fn(params, batch_stats, kw)
        if pending is not None:
            consume(*pending)
        pending = (batch, pred)
    if pending is not None:
        consume(*pending)
    print(loader.truncation_report(), flush=True)
    print(pairs_tel.report(), flush=True)
    evaluator.print_stats()
    if cfg.cache:
        with open(cfg.cache, "wb") as f:
            pickle.dump(all_pred_entries, f)
    return evaluator


if __name__ == "__main__":
    main()
