"""Training-step throughput at full VG scale (canonical MotifNet topology).

Usage: python tools/bench_train.py [sgcls|sgdet] [batch] [iters]
Prints s/batch and images/sec for the jitted train step (detector frozen,
as in reference rel training). The reference printed s/batch live
(train_rels.py:110-111) but committed no number; Titan-X-era runs were
O(1 s/batch) at batch 6.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.rel_model import RelModel
from neural_motifs_tpu.training.losses import rel_losses
from neural_motifs_tpu.training.train_state import (create_train_state,
                                                    make_optimizer,
                                                    make_train_step)


def main(mode="sgcls", batch=6, iters=8):
    budgets = C.PadBudgets()
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    r = np.random.RandomState(0)
    if mode == "det":
        return main_det(batch, iters)
    model = RelModel(
        num_classes=nc, num_rels=npred, mode=mode, budgets=budgets,
        dtype=jnp.bfloat16, hidden_dim=512, pooling_dim=4096, obj_dim=4096,
        embed_dim=200, nl_obj=2, nl_edge=4, order="leftright", use_bias=True,
        use_tanh=False, limit_vision=False, thresh=0.05, rec_dropout=0.1,
        embed_vecs=r.randn(nc, 200).astype(np.float32) * 0.1,
        decoder_embed_vecs=r.randn(nc + 1, 100).astype(np.float32) * 0.1,
        freq_table=r.randn(nc * nc, npred).astype(np.float32) * 0.1)

    g, rl = budgets.max_gt_boxes, budgets.max_gt_rels
    im = C.IM_SCALE
    gt_boxes = np.zeros((batch, g, 4), np.float32)
    gt_classes = np.zeros((batch, g), np.int32)
    gt_mask = np.zeros((batch, g), bool)
    gt_rels = np.zeros((batch, rl, 3), np.int32)
    gt_rel_mask = np.zeros((batch, rl), bool)
    for i in range(batch):
        n = 14
        xy = r.uniform(0, im * 0.6, (n, 2))
        wh = r.uniform(40, im * 0.35, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, im - 1)], 1)
        gt_classes[i, :n] = r.randint(1, nc, n)
        gt_mask[i, :n] = True
        sub = r.randint(0, n, 10)
        obj = (sub + r.randint(1, n, 10)) % n
        gt_rels[i, :10] = np.stack([sub, obj, r.randint(1, npred, 10)], 1)
        gt_rel_mask[i, :10] = True
    batch_arrays = dict(
        images=r.randn(batch, im, im, 3).astype(np.float32) * 0.3,
        im_hw=np.full((batch, 2), float(im), np.float32),
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_mask=gt_mask,
        gt_rels=gt_rels, gt_rel_mask=gt_rel_mask)

    tx = make_optimizer(1e-3 * batch, fc_lr_factor=0.1, freeze_detector=True)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0), batch_arrays, tx)
    print(f"# init {time.time() - t0:.1f}s", flush=True)
    step = make_train_step(rel_losses, lambda b: b, donate=True)
    key = jax.random.PRNGKey(1)

    # Device-resident input buffers, cycled: measures the train STEP, not
    # the host->device tunnel transfer (in real training the loader
    # prefetch + async dispatch overlap the transfer with compute).
    dbufs = []
    for k in range(2):
        ba = dict(batch_arrays)
        ba["images"] = batch_arrays["images"] + 0.01 * k
        dbufs.append({kk: jax.device_put(jnp.asarray(v))
                      for kk, v in ba.items()})

    t0 = time.time()
    state, m = step(state, dbufs[0], key)
    _ = float(m["total"])  # fetch barrier (axon)
    print(f"# compile+first {time.time() - t0:.1f}s", flush=True)

    profile_dir = os.environ.get("NM_BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, m = step(state, dbufs[0], key)
            _ = float(m["total"])

    times = []
    for i in range(iters):
        t0 = time.time()
        state, m = step(state, dbufs[i % len(dbufs)], key)
        _ = float(m["total"])
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"# per-step: {[round(t, 3) for t in times]}")
    print(f"train[{mode}] batch={batch}: {med:.3f}s/batch, "
          f"{batch / med:.2f} imgs/sec")
    return med


def main_det(batch=6, iters=8):
    """Detector-pretraining step (rpntrain: anchor targets + RPN/RoI losses,
    backward through the full VGG trunk). NM_BENCH_REMAT=1 wraps the trunk
    in jax.checkpoint (recompute in backward) — the knob that makes large
    batches fit; reference setup was batch 6/GPU (pretrain_detector.sh)."""
    from neural_motifs_tpu.models.detector import ObjectDetector
    from neural_motifs_tpu.training.losses import detector_losses

    remat = os.environ.get("NM_BENCH_REMAT") == "1"
    budgets = C.PadBudgets()
    nc = C.VG_NUM_CLASSES
    r = np.random.RandomState(0)
    model = ObjectDetector(num_classes=nc, mode="rpntrain", budgets=budgets,
                           dtype=jnp.bfloat16, remat=remat)
    im = C.IM_SCALE
    g = budgets.max_gt_boxes
    gt_boxes = np.zeros((batch, g, 4), np.float32)
    gt_classes = np.zeros((batch, g), np.int32)
    gt_mask = np.zeros((batch, g), bool)
    for i in range(batch):
        n = 14
        xy = r.uniform(0, im * 0.6, (n, 2))
        wh = r.uniform(40, im * 0.35, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, im - 1)], 1)
        gt_classes[i, :n] = r.randint(1, nc, n)
        gt_mask[i, :n] = True
    batch_arrays = dict(
        images=r.randn(batch, im, im, 3).astype(np.float32) * 0.3,
        im_hw=np.full((batch, 2), float(im), np.float32),
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_mask=gt_mask)

    tx = make_optimizer(1e-3 * batch)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0), batch_arrays, tx)
    print(f"# init {time.time() - t0:.1f}s", flush=True)
    step = make_train_step(detector_losses, lambda b: b, donate=True)
    key = jax.random.PRNGKey(1)
    dbufs = []
    for k in range(2):
        ba = dict(batch_arrays)
        ba["images"] = batch_arrays["images"] + 0.01 * k
        dbufs.append({kk: jax.device_put(jnp.asarray(v))
                      for kk, v in ba.items()})
    t0 = time.time()
    state, m = step(state, dbufs[0], key)
    _ = float(m["total"])
    print(f"# compile+first {time.time() - t0:.1f}s", flush=True)
    times = []
    for i in range(iters):
        t0 = time.time()
        state, m = step(state, dbufs[i % len(dbufs)], key)
        _ = float(m["total"])
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"# per-step: {[round(t, 3) for t in times]}")
    print(f"train[det{'+remat' if remat else ''}] batch={batch}: "
          f"{med:.3f}s/batch, {batch / med:.2f} imgs/sec")
    return med


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "sgcls", int(a[1]) if len(a) > 1 else 6,
         int(a[2]) if len(a) > 2 else 8)
