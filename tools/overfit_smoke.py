"""Overfit smoke: train MotifNet sgcls on a fixed tiny synthetic batch for
N steps and verify the loss drops — end-to-end evidence that the jitted
train step (detector frozen, context LSTMs, decoder teacher forcing, union
features, freq bias) optimizes. Runs on whatever device jax picks (TPU on
the bench machine). Usage: python tools/overfit_smoke.py [steps]
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

TINY = C.PadBudgets(max_gt_boxes=8, max_gt_rels=8, rois_per_img=16,
                    objs_per_img=8, rels_per_img=16, rels_per_img_refine=8,
                    max_pairs_eval=56, rpn_pre_nms_topn_train=64,
                    rpn_post_nms_topn_train=32, rpn_pre_nms_topn_test=64,
                    rpn_post_nms_topn_test=16)
NC, NP, B, IM = 16, 8, 4, 64


def make_batch(rng):
    g, r = TINY.max_gt_boxes, TINY.max_gt_rels
    gt_boxes = np.zeros((B, g, 4), np.float32)
    gt_classes = np.zeros((B, g), np.int32)
    gt_mask = np.zeros((B, g), bool)
    gt_rels = np.zeros((B, r, 3), np.int32)
    gt_rel_mask = np.zeros((B, r), bool)
    for b in range(B):
        n = 6
        xy = rng.uniform(0, IM * 0.5, (n, 2))
        wh = rng.uniform(8, IM * 0.45, (n, 2))
        gt_boxes[b, :n] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        gt_classes[b, :n] = rng.randint(1, NC, n)
        gt_mask[b, :n] = True
        sub = rng.randint(0, n, 4)
        obj = (sub + rng.randint(1, n, 4)) % n
        gt_rels[b, :4] = np.stack([sub, obj, rng.randint(1, NP, 4)], 1)
        gt_rel_mask[b, :4] = True
    return dict(images=rng.randn(B, IM, IM, 3).astype(np.float32) * 0.1,
                im_hw=np.full((B, 2), float(IM), np.float32),
                gt_boxes=gt_boxes, gt_classes=gt_classes, gt_mask=gt_mask,
                gt_rels=gt_rels, gt_rel_mask=gt_rel_mask)


def main(steps: int = 40, mode: str = "sgcls", model_name: str = "motifnet"):
    rng = np.random.RandomState(0)
    r2 = np.random.RandomState(1)
    if model_name == "stanford":
        from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
        model = RelModelStanford(num_classes=NC, num_rels=NP, mode=mode,
                                 budgets=TINY, dtype=jnp.float32, thresh=0.0,
                                 obj_dim=64)
    else:
        model = RelModel(num_classes=NC, num_rels=NP, mode=mode, budgets=TINY,
                         dtype=jnp.float32, thresh=0.0, hidden_dim=32,
                         pooling_dim=64, obj_dim=64, embed_dim=8, nl_obj=2,
                         nl_edge=2, use_bias=True, limit_vision=False,
                         rec_dropout=0.0,
                         embed_vecs=r2.randn(NC, 8).astype(np.float32),
                         decoder_embed_vecs=r2.randn(NC + 1, 100).astype(np.float32),
                         freq_table=np.zeros((NC * NC, NP), np.float32))
    batch = make_batch(rng)
    tx = make_optimizer(2e-3, l2=0.0, clip=5.0, fc_lr_factor=None,
                        freeze_detector=True)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(rel_losses, lambda b: b, donate=False)

    key = jax.random.PRNGKey(7)
    losses = []
    t0 = time.time()
    for i in range(steps):
        state, m = step(state, batch, key)
        losses.append(float(m["total"]))
        if i % 10 == 0:
            print(f"step {i}: total={losses[-1]:.4f} "
                  f"class={float(m['class_loss']):.4f} "
                  f"rel={float(m['rel_loss']):.4f}", flush=True)
    print(f"{steps} steps in {time.time() - t0:.1f}s")
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    print(f"loss {first:.4f} -> {last:.4f}")
    assert last < first * 0.8, "loss did not drop on the overfit batch"
    print(f"OVERFIT SMOKE [{model_name}/{mode}]: OK")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 40, a[1] if len(a) > 1 else "sgcls",
         a[2] if len(a) > 2 else "motifnet")
