"""Data-parallel correctness + multi-host/multi-worker loader semantics
(VERDICT r1 items 3 and 6).

* The pjit'd train step over an 8-device mesh must produce the SAME loss
  and updated params as the single-device step on the identical global
  batch — the correctness property the psum must preserve (replacing the
  reference's replicate/scatter/gather DP, dataloaders/blob.py:148-180).
* The Loader's per-host slicing must partition every global batch exactly,
  and the process-pool decode path must produce identical batches to the
  serial path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader
from neural_motifs_tpu.data.synthetic import SyntheticVG
from neural_motifs_tpu.training.losses import rel_losses
from neural_motifs_tpu.training.train_state import create_train_state, make_optimizer


def test_dp_step_equals_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from __graft_entry__ import _tiny_setup

    n = 8
    assert len(jax.devices()) >= n
    model, batch = _tiny_setup(num_images=n)
    tx = make_optimizer(1e-3, fc_lr_factor=0.1)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)

    def step(state, batch):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                train=True,
                rngs={"sample": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"], **batch)
            losses = rel_losses(out)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), losses

    # single device
    dev0 = jax.devices()[0]
    b1 = {k: jax.device_put(jnp.asarray(v), dev0) for k, v in batch.items()}
    s1, l1 = jax.jit(step)(jax.device_put(state, dev0), b1)

    # 8-device data-parallel mesh
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n, 1), ("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    b8 = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    with mesh:
        s8, l8 = jax.jit(step, in_shardings=(repl, bsh))(
            jax.device_put(state, repl), b8)

    np.testing.assert_allclose(float(l1["total"]), float(l8["total"]),
                               rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # batch_stats (masked BN reductions) must also agree across layouts
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _mini_budgets():
    return C.PadBudgets(max_gt_boxes=16, max_gt_rels=16)


def test_loader_multihost_slices_partition_global_batch():
    """Two simulated hosts with the same seed must decode disjoint halves of
    the identical global batch, in order."""
    ds = SyntheticVG(num_images=16, mode="val")
    whole = Loader(ds, 4, shuffle=True, budgets=_mini_budgets(), seed=3,
                   prefetch=0, process_index=0, process_count=1)
    h0 = Loader(ds, 4, shuffle=True, budgets=_mini_budgets(), seed=3,
                prefetch=0, process_index=0, process_count=2)
    h1 = Loader(ds, 4, shuffle=True, budgets=_mini_budgets(), seed=3,
                prefetch=0, process_index=1, process_count=2)
    for bw, b0, b1 in zip(whole, h0, h1):
        assert b0.images.shape[0] == 2 and b1.images.shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([b0.image_ids, b1.image_ids]), bw.image_ids)
        np.testing.assert_array_equal(
            np.concatenate([b0.gt_classes, b1.gt_classes]), bw.gt_classes)


def test_loader_process_pool_matches_serial():
    ds = SyntheticVG(num_images=12, mode="val")  # deterministic entries
    serial = Loader(ds, 4, shuffle=False, budgets=_mini_budgets(),
                    prefetch=0, num_workers=1, process_index=0,
                    process_count=1)
    pooled = Loader(ds, 4, shuffle=False, budgets=_mini_budgets(),
                    prefetch=2, num_workers=2, process_index=0,
                    process_count=1)
    got_s = list(serial)
    got_p = list(pooled)
    assert len(got_s) == len(got_p) == 3
    for a, b in zip(got_s, got_p):
        np.testing.assert_array_equal(a.image_ids, b.image_ids)
        np.testing.assert_allclose(a.images, b.images)
        np.testing.assert_array_equal(a.gt_rels, b.gt_rels)
