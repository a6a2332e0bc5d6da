"""Train-step cost ablation: times the sgcls train step with components
disabled to locate the bottleneck (LSTM stack vs union-vision tower vs
backbone/towers). Usage: python tools/ablate_train.py [batch]"""

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
from tools.bench_train import main as _unused  # noqa: F401  (path setup)


def make_batch(batch, budgets, r):
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
        gt_classes[i, :n] = r.randint(1, C.VG_NUM_CLASSES, n)
        gt_mask[i, :n] = True
        sub = r.randint(0, n, 10)
        obj = (sub + r.randint(1, n, 10)) % n
        gt_rels[i, :10] = np.stack([sub, obj, r.randint(1, C.VG_NUM_PREDICATES, 10)], 1)
        gt_rel_mask[i, :10] = True
    return dict(images=r.randn(batch, im, im, 3).astype(np.float32) * 0.3,
                im_hw=np.full((batch, 2), float(im), np.float32),
                gt_boxes=gt_boxes, gt_classes=gt_classes, gt_mask=gt_mask,
                gt_rels=gt_rels, gt_rel_mask=gt_rel_mask)


def time_variant(name, batch_arrays, iters=6, **mk):
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    r = np.random.RandomState(0)
    kw = dict(num_classes=nc, num_rels=npred, mode="sgcls",
              budgets=C.PadBudgets(), dtype=jnp.bfloat16, hidden_dim=512,
              pooling_dim=4096, obj_dim=4096, embed_dim=200, nl_obj=2,
              nl_edge=4, order="leftright", use_bias=True, use_tanh=False,
              limit_vision=False, rec_dropout=0.1,
              embed_vecs=r.randn(nc, 200).astype(np.float32) * 0.1,
              decoder_embed_vecs=r.randn(nc + 1, 100).astype(np.float32) * 0.1,
              freq_table=r.randn(nc * nc, npred).astype(np.float32) * 0.1)
    kw.update(mk)
    model = RelModel(**kw)
    tx = make_optimizer(6e-3, fc_lr_factor=0.1, freeze_detector=True)
    state = create_train_state(model, jax.random.PRNGKey(0), batch_arrays, tx)
    step = make_train_step(rel_losses, lambda b: b, donate=True)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = step(state, batch_arrays, key)
    _ = float(m["total"])
    compile_t = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        state, m = step(state, batch_arrays, key)
        _ = float(m["total"])
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:32s} compile {compile_t:6.1f}s  step {med * 1000:7.1f}ms",
          flush=True)
    return med


def main(batch=6):
    r = np.random.RandomState(0)
    batch_arrays = make_batch(batch, C.PadBudgets(), r)
    time_variant("full", dict(batch_arrays))
    time_variant("no_vision", dict(batch_arrays), use_vision=False)
    time_variant("no_lstm (nl 0/0)", dict(batch_arrays), nl_obj=0, nl_edge=0)
    time_variant("no_lstm no_vision", dict(batch_arrays), nl_obj=0, nl_edge=0,
                 use_vision=False)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
