"""Relation-model training entry point (equivalent of reference
models/train_rels.py). Run:

    python -m neural_motifs_tpu.training.train_rels -m sgcls -model motifnet \
        -order leftright -nl_obj 2 -nl_edge 4 -hidden_dim 512 -use_bias ...

Losses: object-class CE + rel CE over sampled pairs; detector frozen (its
params get zero gradient via stop_gradient on the fmap plus an optimizer
mask); VGG-fc towers at lr/10; R@100-plateau lr schedule with early exit.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader
from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
from neural_motifs_tpu.models.frequency import freq_bias_table
from neural_motifs_tpu.models.rel_model import RelModel, prediction_to_entries
from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
from neural_motifs_tpu.models.word_vectors import obj_edge_vectors
from neural_motifs_tpu.parallel.mesh import make_mesh, shard_batch
from neural_motifs_tpu.training import checkpoint as ckpt_lib
from neural_motifs_tpu.training.losses import rel_losses
from neural_motifs_tpu.training.train_state import (PlateauScheduler, TrainState,
                                                    create_train_state,
                                                    make_optimizer,
                                                    make_train_step, set_lr_scale)


def batch_kwargs(batch) -> dict:
    return dict(images=batch.images, im_hw=batch.im_hw, gt_boxes=batch.gt_boxes,
                gt_classes=batch.gt_classes, gt_mask=batch.gt_mask,
                gt_rels=batch.gt_rels, gt_rel_mask=batch.gt_rel_mask)


def build_model(cfg: C.ModelConfig, train_data, dtype=None):
    classes = train_data.ind_to_classes
    embed = obj_edge_vectors(classes, wv_dim=cfg.embed_dim)
    dec_embed = obj_edge_vectors(["start"] + list(classes), wv_dim=100)
    freq = freq_bias_table(train_data) if cfg.use_bias else None
    cls = RelModel if cfg.model == "motifnet" else RelModelStanford
    kw = dict(num_classes=train_data.num_classes,
              num_rels=train_data.num_predicates, mode=cfg.mode,
              use_proposals=cfg.use_proposals, budgets=cfg.budgets,
              use_resnet=cfg.use_resnet, obj_dim=cfg.obj_dim,
              dtype=dtype or jnp.dtype(cfg.compute_dtype))
    if cls is RelModel:
        kw.update(embed_vecs=embed, decoder_embed_vecs=dec_embed,
                  freq_table=freq, embed_dim=cfg.embed_dim,
                  hidden_dim=cfg.hidden_dim, pooling_dim=cfg.pooling_dim,
                  nl_obj=cfg.nl_obj, nl_edge=cfg.nl_edge, order=cfg.order,
                  rec_dropout=cfg.rec_dropout, use_bias=cfg.use_bias,
                  use_tanh=cfg.use_tanh, limit_vision=cfg.limit_vision,
                  pass_in_obj_feats_to_decoder=cfg.pass_in_obj_feats_to_decoder,
                  pass_in_obj_feats_to_edge=cfg.pass_in_obj_feats_to_edge)
    return cls(**kw)


def val_epoch(model, state, val_loader, val_data, cfg, eval_fn, mesh=None):
    """Validation epoch. With a mesh, eval runs the same SPMD story as
    training: params/batch_stats replicated once, every batch sharded over
    the 'data' axis, XLA partitioning the (collective-free) eval graph —
    the TPU-native analog of the reference's per-GPU result gather
    (lib/rel_model.py:549-560). device_get reassembles the global
    SGPrediction on the host."""
    evaluator = BasicSceneGraphEvaluator.all_modes()
    from neural_motifs_tpu.utils.observe import PairBudgetTelemetry
    pairs_tel = PairBudgetTelemetry(cfg.budgets.max_pairs_eval)
    params, batch_stats = state.params, state.batch_stats
    if mesh is not None and mesh.size > 1:
        from neural_motifs_tpu.parallel.mesh import replicated
        params = jax.device_put(params, replicated(mesh))
        batch_stats = jax.device_put(batch_stats, replicated(mesh))

    seen_ids = set()  # final-batch pad repeats an image id; evaluate once

    def consume(batch, pred):
        # fetched only after the NEXT batch is dispatched, so the host
        # transfer + evaluator overlap device compute (pipelined eval loop)
        pred = jax.device_get(pred)
        pairs_tel.update(pred.num_valid_pairs)
        for i, entry in enumerate(prediction_to_entries(pred)):
            idx = int(batch.image_ids[i])
            if idx < 0 or idx in seen_ids:   # -1 = tail-pad repeat
                continue
            seen_ids.add(idx)
            gt = {"gt_classes": val_data.gt_classes[idx].copy(),
                  "gt_relations": val_data.relationships[idx].copy(),
                  "gt_boxes": val_data.gt_boxes[idx].copy()}
            evaluator[cfg.mode].evaluate_scene_graph_entry(gt, entry)

    # background-thread device transfer + pipelined fetch (see eval_rels)
    from neural_motifs_tpu.data.batching import device_prefetch

    def prep(b):
        kw = batch_kwargs(shard_batch(b, mesh) if mesh is not None else b)
        return kw if mesh is not None else jax.device_put(kw)

    pending = None
    for batch, kw in device_prefetch(val_loader, prep):
        pred = eval_fn(params, batch_stats, kw)
        if pending is not None:
            consume(*pending)
        pending = (batch, pred)
    if pending is not None:
        consume(*pending)
    if pairs_tel.images:
        print(pairs_tel.report(), flush=True)
    evaluator[cfg.mode].print_stats()
    return evaluator[cfg.mode].mean_recall(100)


def main(argv=None):
    cfg = C.ModelConfig.from_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        train, val, _ = VG.splits(num_val_im=cfg.val_size,
                                  filter_duplicate_rels=True,
                                  use_proposals=cfg.use_proposals,
                                  filter_non_overlap=cfg.mode == "sgdet")
    except FileNotFoundError as e:
        print(f"[train_rels] {e}\nFalling back to SyntheticVG (smoke mode).")
        from neural_motifs_tpu.data.synthetic import SyntheticVG
        train, val, _ = SyntheticVG.splits(num_images=64)

    mesh = make_mesh()
    global_batch = cfg.batch_size * cfg.num_devices
    # -im_budget HxW|auto applies to TRAINING too: the reference pads each
    # blob only to its batch max (dataloaders/blob.py), so bucketed /
    # rect-budget batches are the faithful shape story, and a 4:3 bucket
    # cuts ~25% of the backbone FLOPs per step (one compiled step per
    # bucket shape).
    from neural_motifs_tpu.data.batching import loader_im_kw
    train_loader, val_loader = Loader.splits(train, val, batch_size=global_batch,
                                             budgets=cfg.budgets,
                                             num_workers=cfg.num_workers,
                                             **loader_im_kw(cfg))
    model = build_model(cfg, train)

    lr = cfg.lr * cfg.num_devices * cfg.batch_size
    tx = make_optimizer(lr, l2=cfg.l2, clip=cfg.clip, adam=cfg.adam,
                        fc_lr_factor=0.1, freeze_detector=True)
    rng = jax.random.PRNGKey(0)
    example = train_loader.peek()
    state = create_train_state(model, rng, batch_kwargs(example), tx)

    sched = PlateauScheduler()
    if cfg.ckpt:
        if cfg.ckpt.endswith((".tar", ".pth", ".pt")):
            loaded, loaded_stats = ckpt_lib.import_reference_rel_model(
                cfg.ckpt, hidden_dim=cfg.hidden_dim, obj_dim=cfg.obj_dim,
                embed_dim=cfg.embed_dim, nl_obj=cfg.nl_obj, nl_edge=cfg.nl_edge,
                pooling_dim=cfg.pooling_dim,
                pass_in_obj_feats_to_decoder=cfg.pass_in_obj_feats_to_decoder,
                pass_in_obj_feats_to_edge=cfg.pass_in_obj_feats_to_edge)
            state = state.replace(
                params=ckpt_lib.optimistic_restore(state.params, loaded),
                batch_stats=ckpt_lib.optimistic_restore(
                    state.batch_stats, loaded_stats))
        else:
            # our own checkpoint: exact resume (optimizer momentum, injected
            # lr scale, scheduler, step) when the payload carries them
            payload = ckpt_lib.load_checkpoint(cfg.ckpt)
            state = ckpt_lib.restore_train_state(payload, state, sched)

    from neural_motifs_tpu.utils.observe import print_para
    print_para(state.params)
    train_step = make_train_step(rel_losses, batch_kwargs)
    eval_fn = jax.jit(lambda params, bs, kw: model.apply(
        {"params": params, "batch_stats": bs}, train=False,
        rngs={"sample": jax.random.PRNGKey(0)}, **kw))

    base_scale = sched.scale
    if base_scale != 1.0:   # resumed mid-schedule: re-inject the lr scale
        state = state.replace(opt_state=set_lr_scale(state.opt_state,
                                                     base_scale))
    step_rng = jax.random.PRNGKey(42)
    from neural_motifs_tpu.data.batching import device_prefetch
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        agg = []
        prev = None
        # batch k+1 transfers in a background thread while the device runs
        # step k; the loss fetch (a host sync) is deferred one step so it
        # overlaps too instead of hard-stopping the pipeline every step
        for bi, (batch, dev_batch) in enumerate(device_prefetch(
                train_loader, lambda b: shard_batch(b, mesh))):
            state, losses = train_step(state, dev_batch, step_rng)
            if prev is not None:
                agg.append({k: float(v) for k, v in prev.items()})
            prev = losses
            if bi % cfg.print_interval == 0 and bi >= cfg.print_interval:
                window = agg[-cfg.print_interval:]
                mean = {k: np.mean([a[k] for a in window]) for k in window[0]}
                dt = (time.time() - t0) / (bi + 1)
                print(f"e{epoch}b{bi}/{len(train_loader)} {dt:.3f}s/batch "
                      f"{dt * len(train_loader) / 60:.1f}m/epoch  {mean}",
                      flush=True)
        if prev is not None:
            agg.append({k: float(v) for k, v in prev.items()})
        print(train_loader.truncation_report(), flush=True)
        if cfg.save_dir:
            ckpt_lib.save_checkpoint(f"{cfg.save_dir}/vgrel-{epoch}.mp", state,
                                     sched=sched)
        r100 = val_epoch(model, state, val_loader, val, cfg, eval_fn,
                         mesh=mesh)
        print(val_loader.truncation_report(), flush=True)
        scale = sched.step(r100)
        if scale != base_scale:
            # inject the new scale; momentum buffers survive (ADVICE r1)
            base_scale = scale
            state = state.replace(
                opt_state=set_lr_scale(state.opt_state, scale))
        if lr * scale <= lr / 99.0:
            print("exiting training early", flush=True)
            break


if __name__ == "__main__":
    main()
