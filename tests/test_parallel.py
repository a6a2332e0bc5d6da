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
    mesh = make_mesh()
    params = {"big": jnp.zeros((4096, 4096)), "small": jnp.zeros((16, 16))}
    sh = param_sharding(mesh, params, shard_fc=True)
    assert sh["big"].spec == P(None, "model")
    assert sh["small"].spec == P()


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
