"""Mesh/sharding: param sharding rules and the multichip dryrun (the same
path the driver validates)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from neural_motifs_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             param_sharding, shard_batch)


def test_make_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (len(jax.devices()), 1)


def test_param_sharding_rules():
    """Megatron col/row split: fc0 output-sharded (kernel+bias), fc1/proj
    input-sharded (kernel only); everything else replicated."""
    mesh = make_mesh(num_data=len(jax.devices()) // 2, num_model=2)
    params = {
        "roi_fmap": {"fc0": {"kernel": jnp.zeros((64, 32)),
                             "bias": jnp.zeros((32,))},
                     "fc1": {"kernel": jnp.zeros((32, 32)),
                             "bias": jnp.zeros((32,))}},
        "other": {"kernel": jnp.zeros((4096, 4096)),
                  "conv": jnp.zeros((3, 3, 8, 8))},
        "odd": {"fc0": {"kernel": jnp.zeros((8, 7))}},  # 7 % 2 != 0
    }
    sh = param_sharding(mesh, params, shard_fc=True)
    assert sh["roi_fmap"]["fc0"]["kernel"].spec == P(None, "model")
    assert sh["roi_fmap"]["fc0"]["bias"].spec == P("model")
    assert sh["roi_fmap"]["fc1"]["kernel"].spec == P("model", None)
    assert sh["roi_fmap"]["fc1"]["bias"].spec == P()
    assert sh["other"]["kernel"].spec == P()
    assert sh["other"]["conv"].spec == P()
    assert sh["odd"]["fc0"]["kernel"].spec == P()
    # shard_fc=False or a trivial model axis: everything replicated
    sh_off = param_sharding(mesh, params, shard_fc=False)
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh_off))
    sh_1d = param_sharding(make_mesh(), params, shard_fc=True)
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh_1d))


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    n = len(jax.devices())

    class B:
        pass

    batch = {"x": np.zeros((n * 2, 3), np.float32)}
    out = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    assert out["x"].sharding.spec == P("data")


def test_dryrun_multichip_two_devices():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(2)


def test_tp_dp_step_equals_single_device():
    """One train step on a 2-D (data=2, model=2) mesh — batch sharded over
    'data', the fc towers tensor-parallel over 'model' with matching
    momentum shardings — must reproduce the single-device step on the same
    global batch (the TP analog of test_dp_step_equals_single_device)."""
    from jax.sharding import Mesh, NamedSharding
    from __graft_entry__ import _tiny_setup
    from neural_motifs_tpu.parallel.mesh import state_shardings
    from neural_motifs_tpu.training.losses import rel_losses
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer)

    assert len(jax.devices()) >= 4
    model, batch = _tiny_setup(num_images=2)
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

    dev0 = jax.devices()[0]
    b1 = {k: jax.device_put(jnp.asarray(v), dev0) for k, v in batch.items()}
    s1, l1 = jax.jit(step)(jax.device_put(state, dev0), b1)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    ssh = state_shardings(mesh, state, shard_fc=True)
    # the fc towers must actually be sharded (not a silent all-replicated run)
    specs = {s.spec for s in jax.tree_util.tree_leaves(
        state_shardings(mesh, state.params, shard_fc=True))}
    assert P(None, "model") in specs and P("model", None) in specs
    b4 = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    with mesh:
        s4, l4 = jax.jit(step, in_shardings=(ssh, bsh))(
            jax.device_put(state, ssh), b4)

    np.testing.assert_allclose(float(l1["total"]), float(l4["total"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s4.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
