"""Train state + optimizer + pjit-compiled steps.

Reference training harness semantics (models/train_rels.py,
models/train_detector.py): SGD momentum 0.9, weight decay, global grad-norm
clip 5, VGG-fc params at lr/10 for rel training, ReduceLROnPlateau on the
val metric. On TPU the whole update is one jitted function over the data
mesh; gradients are averaged by XLA (the loss is a mean over the global
batch, so no explicit psum appears in user code).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from neural_motifs_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state)


def _is_fc_path(path) -> bool:
    """roi_fmap* towers get lr/10 (train_rels.py:57-62)."""
    keys = [getattr(p, "key", "") for p in path]
    return any(str(k).startswith("roi_fmap") for k in keys)


def _is_frozen_path(path) -> bool:
    """Detector subtree is frozen during rel training (train_rels.py:51-52)."""
    keys = [getattr(p, "key", "") for p in path]
    return bool(keys) and str(keys[0]) == "detector"


def make_optimizer(lr: float, l2: float = 1e-4, clip: float = 5.0,
                   momentum: float = 0.9, adam: bool = False,
                   fc_lr_factor: Optional[float] = None,
                   freeze_detector: bool = False):
    """SGD(momentum)/Adam + weight decay + global-norm clip; optional
    reduced-lr group for the VGG fc towers; optional hard-frozen detector
    subtree (no update, no weight decay)."""
    def base(scale):
        # lr may be a float or an optax schedule (callable step -> rate);
        # group scale factors compose either way
        rate = ((lambda ct: lr(ct) * scale) if callable(lr) else lr * scale)
        core = (optax.adam(rate, eps=1e-3) if adam
                else optax.sgd(rate, momentum=momentum))
        return optax.chain(optax.add_decayed_weights(l2), core)

    def label_fn(params):
        def lbl(p, _):
            if freeze_detector and _is_frozen_path(p):
                return "frozen"
            if fc_lr_factor is not None and _is_fc_path(p):
                return "fc"
            return "rest"
        return jax.tree_util.tree_map_with_path(lbl, params)

    groups = {"rest": base(1.0), "frozen": optax.set_to_zero()}
    if fc_lr_factor is not None:
        groups["fc"] = base(fc_lr_factor)
    tx = optax.multi_transform(groups, label_fn)
    # trailing injected scale: ReduceLROnPlateau drops multiply this scale
    # (set_lr_scale) instead of rebuilding the optimizer, so SGD momentum
    # buffers survive LR drops — matching torch ReduceLROnPlateau semantics.
    lr_scale = optax.inject_hyperparams(optax.scale)(step_size=1.0)
    return optax.chain(optax.clip_by_global_norm(clip), tx, lr_scale)


def set_lr_scale(opt_state, scale: float):
    """Update the injected lr scale of a make_optimizer() opt_state without
    touching momentum buffers (replaces the reference's in-place
    param_group['lr'] update that ReduceLROnPlateau performs)."""
    states = list(opt_state)
    inj = states[-1]
    hp = dict(inj.hyperparams)
    hp["step_size"] = jnp.asarray(scale, jnp.float32)
    states[-1] = inj._replace(hyperparams=hp)
    return tuple(states)


def create_train_state(model, rng, example_batch_args: dict, tx) -> TrainState:
    # jit the whole init: one compiled program instead of thousands of
    # individual param-init dispatches (matters on remote TPU backends)
    rngs = {"params": rng, "sample": rng, "dropout": rng}
    variables = jax.jit(lambda r: model.init(r, train=True,
                                             **example_batch_args))(rngs)
    params = variables["params"]
    # plain {} (not FrozenDict) so stat-less models (the VGG detector has no
    # BN) produce the same container type flax returns from
    # mutable=["batch_stats"] — mismatched empties break the skip_nonfinite
    # tree_map in make_train_step
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx, apply_fn=model.apply)


def make_train_step(loss_from_output: Callable, model_kwargs_from_batch: Callable,
                    donate: bool = True, skip_nonfinite: bool = True):
    """Builds a jitted train step: state, batch, rng -> (state, metrics).

    skip_nonfinite: if the loss or grad norm is NaN/Inf, the update is
    dropped and the old state kept (a failure-containment behavior the
    reference lacks — a bad batch there corrupts the weights)."""

    def step(state: TrainState, batch, rng):
        kwargs = model_kwargs_from_batch(batch)
        r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, state.step), 3)

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                train=True, rngs={"sample": r1, "dropout": r2},
                mutable=["batch_stats"], **kwargs)
            losses = loss_from_output(out)
            return losses["total"], (losses, mutated)

        (loss, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        new_bs = mutated.get("batch_stats", state.batch_stats)
        if not jax.tree_util.tree_leaves(new_bs):
            # stat-less model: keep the original (possibly differently-typed
            # empty) container so old/new states stay tree-compatible
            new_bs = state.batch_stats
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "dtype") else new,
                new_state, state)
            losses["skipped"] = (~ok).astype(jnp.float32)
        losses["grad_norm"] = gnorm
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class PlateauScheduler:
    """ReduceLROnPlateau('max') equivalent (train_rels.py:68-69): tracks the
    val metric, multiplies a host-side lr scale by `factor` after `patience`
    non-improving epochs (with cooldown). The scale is passed into the
    optimizer via optax.scale_by_learning_rate injection — here we simply
    rebuild the tx when it fires, which is cheap."""

    def __init__(self, patience: int = 3, factor: float = 0.1,
                 threshold: float = 1e-4, cooldown: int = 1):
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.cooldown = cooldown
        self.best = -float("inf")
        self.num_bad = 0
        self.cool = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric > self.best + self.threshold:
            self.best = metric
            self.num_bad = 0
        elif self.cool > 0:
            self.cool -= 1
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
                self.cool = self.cooldown
        return self.scale

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad,
                "cool": self.cool, "scale": self.scale}

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d["best"])
        self.num_bad = int(d["num_bad"])
        self.cool = int(d["cool"])
        self.scale = float(d["scale"])
