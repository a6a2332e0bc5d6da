"""Exact BatchNorm running-stat recalibration.

The reference keeps torch-momentum 0.001 BNs (pos_embed BN,
reference rel_model.py:103-108, union-mask conv BNs,
get_union_boxes.py:31-39), so running stats converge only after thousands
of steps — fine for the 50k-step VG schedules, but after a SHORT run
(finetune, synthetic overfit, audit pretrain) eval-mode normalization uses
badly stale statistics and the eval forward diverges from the train
forward. This module sets the running stats to the TRUE dataset statistics
in one shot, without touching any model code:

For a stats leaf with momentum m, one train-mode pass over batch i updates
    new = m * old + (1 - m) * s_i
where s_i is the batch statistic. m is a per-module constant we do not
know here, so we run the SAME batch from two different starting trees
(old_a, old_b = old_a + 1) and solve elementwise:
    m   = new_a - new_b + 1... (see below; (new_a-new_b) = m*(a-b) = -m)
    s_i = (new_a - m * a) / (1 - m)

Batch statistics are pooled over batches by the law of total variance:
mean = avg of batch means; var = avg of batch vars + var of batch means
(equal-size batches). Leaves are paired mean<->var by their tree path
(flax BN collections name them 'mean'/'var').
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def _recover_batch_stats(run_pass: Callable[[Any], Any], stats: Any) -> Any:
    """Per-batch statistics implied by one EMA update, solved from two
    passes with shifted starting stats. run_pass(stats_tree) -> mutated
    stats tree."""
    new_a = run_pass(stats)
    stats_b = jax.tree_util.tree_map(lambda x: x + 1.0, stats)
    new_b = run_pass(stats_b)

    def solve(a, na, nb):
        m = jnp.clip(nb - na, 0.0, 1.0 - 1e-6)  # m = (nb-na)/(b-a), b-a=1
        return (na - m * a) / (1.0 - m)

    return jax.tree_util.tree_map(solve, stats, new_a, new_b)


def calibrate_batch_stats(apply_fn: Callable, params: Any, batch_stats: Any,
                          batches: list, rngs: dict | Callable[[int], dict],
                          **apply_kw) -> Any:
    """Return a batch_stats tree whose running stats equal the dataset
    statistics measured over `batches` (list of model-kwargs dicts).

    apply_fn: flax apply, called as
        apply_fn({'params': params, 'batch_stats': bs}, train=True,
                 mutable=['batch_stats'], rngs=..., **batch, **apply_kw)
    rngs: dict, or a callable index -> dict (fresh dropout keys per batch).
    """
    if not jax.tree_util.tree_leaves(batch_stats):
        return batch_stats

    def run_pass(bs, batch, r):
        _, mut = apply_fn({"params": params, "batch_stats": bs},
                          train=True, mutable=["batch_stats"], rngs=r,
                          **batch, **apply_kw)
        return mut["batch_stats"]

    jit_pass = jax.jit(run_pass)
    per_batch = []
    for i, b in enumerate(batches):
        r = rngs(i) if callable(rngs) else rngs
        per_batch.append(jax.device_get(_recover_batch_stats(
            lambda bs: jit_pass(bs, b, r), batch_stats)))

    # pool: means average; vars average + variance of the means (total-var)
    flat = [jax.tree_util.tree_flatten_with_path(pb)[0] for pb in per_batch]
    treedef = jax.tree_util.tree_structure(per_batch[0])
    paths = [p for p, _ in flat[0]]

    def norm(p):
        return tuple(str(getattr(k, "key", k)) for k in p)

    stacked = {norm(p): np.stack([np.asarray(f[j][1]) for f in flat])
               for j, p in enumerate(paths)}

    pooled = []
    for p in paths:
        key = norm(p)
        arr = stacked[key]
        if key[-1] == "var":
            mean_key = key[:-1] + ("mean",)
            if mean_key in stacked:
                mu = stacked[mean_key]
                pooled.append(arr.mean(0) + mu.var(0))
                continue
        pooled.append(arr.mean(0))
    return jax.tree_util.tree_unflatten(treedef, pooled)
