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
know here, so we run the SAME batch from two starting trees of all-zeros
and all-ones and solve elementwise:
    new_0 = (1 - m) * s_i          new_1 = m + (1 - m) * s_i
    m     = new_1 - new_0          s_i   = new_0 / (1 - m)
Starting from 0/1 (rather than the current stats +- a shift) matters
numerically: solving s_i = (new - m*old)/(1-m) amplifies float32 rounding
by |s_i - old|/(1-m) — with torch-0.001 momentum that is 1000x the gap
between the stale stat and the batch stat, which produced NEGATIVE
recovered variances (and NaN eval scores) when the gap was ~1e4. With the
0/1 start every term is O(s_i * (1-m) + 1), so the error stays relative
to s_i itself.

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
    passes with all-zeros / all-ones starting stats (train-mode forwards
    never READ running stats, so the start tree cannot perturb the batch
    statistic being recovered). run_pass(stats_tree) -> mutated tree."""
    new_0 = run_pass(jax.tree_util.tree_map(jnp.zeros_like, stats))
    new_1 = run_pass(jax.tree_util.tree_map(jnp.ones_like, stats))

    def solve(n0, n1, orig):
        # An element NOT EMA-updated by this forward (e.g. a BN inside a
        # mode-conditional branch that never ran) comes back unchanged:
        # n0 == 0, n1 == 1, so n1 - n0 == 1 exactly. A real momentum is
        # bounded well below 1 (torch default 0.1..0.999), so treat
        # m >= 1 - 1e-6 as "untouched" and preserve the original stat
        # instead of corrupting it to mean=0 / var=0.
        m = n1 - n0
        untouched = m >= 1.0 - 1e-6
        m = jnp.clip(m, 0.0, 1.0 - 1e-6)
        return jnp.where(untouched, orig, n0 / (1.0 - m))

    return jax.tree_util.tree_map(solve, new_0, new_1, stats)


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
                # clamp: recovery noise must never produce a negative
                # variance (rsqrt would NaN the whole eval forward)
                pooled.append(np.maximum(arr.mean(0) + mu.var(0), 0.0))
                continue
        pooled.append(arr.mean(0))
    return jax.tree_util.tree_unflatten(treedef, pooled)
