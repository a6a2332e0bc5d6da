"""Detector pretraining entry point (equivalent of reference
models/train_detector.py): RoI class CE + class-conditional box loss +
RPN class/box losses over in-graph anchor targets; SGD momentum, clip 5,
plateau schedule on detection mAP (or val loss without pycocotools)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader
from neural_motifs_tpu.models.detector import ObjectDetector
from neural_motifs_tpu.parallel.mesh import make_mesh, shard_batch
from neural_motifs_tpu.training import checkpoint as ckpt_lib
from neural_motifs_tpu.training.losses import detector_losses
from neural_motifs_tpu.training.train_state import (PlateauScheduler,
                                                    create_train_state,
                                                    make_optimizer,
                                                    make_train_step,
                                                    set_lr_scale)


def batch_kwargs(batch) -> dict:
    return dict(images=batch.images, im_hw=batch.im_hw, gt_boxes=batch.gt_boxes,
                gt_classes=batch.gt_classes, gt_mask=batch.gt_mask)


def detection_map(model, state, loader, dataset) -> float:
    """Detection mAP@0.5 over the faux-COCO adapter
    (train_detector.py:158-181): pycocotools' COCOeval when installed,
    otherwise the self-contained evaluator in evaluation/det_map.py (same
    protocol: greedy matching, maxDets 100, 101-point interpolation)."""
    eval_fn = jax.jit(lambda p, bs, kw: model.apply(
        {"params": p, "batch_stats": bs}, train=False, **kw))
    results = []
    seen_ids = set()  # final-batch pad repeats an image id; evaluate once
    for batch in loader:
        out = eval_fn(state.params, state.batch_stats, batch_kwargs(batch))
        boxes_all = jax.device_get(out.boxes_all)
        scores = jax.device_get(out.obj_scores)
        preds = jax.device_get(out.obj_preds)
        valid = jax.device_get(out.rm_valid)
        for i in range(len(batch.image_ids)):
            if int(batch.image_ids[i]) < 0 \
                    or int(batch.image_ids[i]) in seen_ids:
                continue
            seen_ids.add(int(batch.image_ids[i]))
            for j in np.where(valid[i])[0]:
                cls = int(preds[i, j])
                box = boxes_all[i, j, cls] * C.BOX_SCALE / C.IM_SCALE
                results.append({
                    "image_id": int(batch.image_ids[i]), "category_id": cls,
                    "bbox": [float(box[0]), float(box[1]),
                             float(box[2] - box[0] + 1), float(box[3] - box[1] + 1)],
                    "score": float(scores[i, j])})
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
        gt = COCO()
        gt.dataset = dataset.coco_annotations()
        gt.createIndex()
        dt = gt.loadRes(results) if results else None
        if dt is None:
            return 0.0
        ev = COCOeval(gt, dt, "bbox")
        ev.evaluate(); ev.accumulate(); ev.summarize()
        return float(ev.stats[1])  # mAP@0.5
    except ImportError:
        from neural_motifs_tpu.evaluation.det_map import coco_map
        return coco_map(dataset.coco_annotations(), results)["map_50"]


def main(argv=None):
    cfg = C.ModelConfig.from_args(argv)
    try:
        from neural_motifs_tpu.data.visual_genome import VG
        train, val, _ = VG.splits(num_val_im=cfg.val_size,
                                  filter_empty_rels=False,
                                  filter_non_overlap=False)
    except FileNotFoundError as e:
        print(f"[train_detector] {e}\nFalling back to SyntheticVG.")
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
    model = ObjectDetector(num_classes=train.num_classes, mode="rpntrain",
                           dtype=jnp.dtype(cfg.compute_dtype),
                           budgets=cfg.budgets, use_resnet=cfg.use_resnet,
                           remat=cfg.remat)
    lr = cfg.lr * cfg.num_devices * cfg.batch_size
    tx = make_optimizer(lr, l2=cfg.l2, clip=cfg.clip, adam=cfg.adam)
    example = train_loader.peek()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               batch_kwargs(example), tx)
    sched = PlateauScheduler()
    if cfg.ckpt:
        if cfg.ckpt.endswith((".tar", ".pth", ".pt")):
            loaded = ckpt_lib.import_reference_detector(cfg.ckpt)
            state = state.replace(
                params=ckpt_lib.optimistic_restore(state.params, loaded))
        else:
            payload = ckpt_lib.load_checkpoint(cfg.ckpt)
            state = ckpt_lib.restore_train_state(payload, state, sched)

    train_step = make_train_step(detector_losses, batch_kwargs)
    base_scale = sched.scale
    if base_scale != 1.0:
        state = state.replace(opt_state=set_lr_scale(state.opt_state,
                                                     base_scale))
    rng = jax.random.PRNGKey(7)
    from neural_motifs_tpu.data.batching import device_prefetch
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        # batch k+1's host->device transfer overlaps step k (loss fetches
        # only happen at print_interval, so steps already pipeline)
        for bi, (batch, dev_batch) in enumerate(device_prefetch(
                train_loader, lambda b: shard_batch(b, mesh))):
            state, losses = train_step(state, dev_batch, rng)
            if bi % cfg.print_interval == 0:
                dt = (time.time() - t0) / (bi + 1)
                print(f"e{epoch}b{bi} {dt:.3f}s/b "
                      f"{ {k: float(v) for k, v in losses.items()} }", flush=True)
        print(train_loader.truncation_report(), flush=True)
        if cfg.save_dir:
            ckpt_lib.save_checkpoint(f"{cfg.save_dir}/vg-{epoch}.mp", state,
                                     sched=sched)
        m = detection_map(model, state, val_loader, val)
        print(f"epoch {epoch}: mAP {m:.4f}")
        scale = sched.step(m)
        if scale != base_scale:
            # apply the plateau drop (was a no-op in r1, ADVICE low):
            # injected scale keeps SGD momentum across LR reductions
            base_scale = scale
            state = state.replace(
                opt_state=set_lr_scale(state.opt_state, scale))


if __name__ == "__main__":
    main()
