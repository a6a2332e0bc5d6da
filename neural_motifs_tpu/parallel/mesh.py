"""Device mesh + sharding layout.

Replaces the reference's hand-rolled replicated-module data parallelism
(Blob.scatter / nn.parallel.replicate / gather_res,
dataloaders/blob.py:148-180 + lib/object_detector.py:410-422) with the JAX
SPMD recipe: one `Mesh`, batch arrays sharded over the 'data' axis, params
replicated (optionally sharded over a 'model' axis for the big fc layers),
and XLA inserting psum/all-gather collectives over ICI. Multi-host scaling
uses the same code path via jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """1-D data mesh by default; optional second 'model' axis for tensor
    parallelism of the 25088x4096 fc towers."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devs = np.asarray(devices[:num_data * num_model]).reshape(num_data, num_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded along the leading (image) axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params: Any, shard_fc: bool = False) -> Any:
    """Sharding tree for params: replicated, except (optionally) the two
    widest Dense kernels which shard their output dim over MODEL_AXIS."""
    def rule(path, leaf):
        if shard_fc and leaf.ndim == 2 and leaf.shape[0] * leaf.shape[1] >= 4096 * 4096:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host Batch (NamedTuple of numpy arrays) with the batch
    axis split over DATA_AXIS.

    Single-host: plain sharded device_put. Multi-host: each process holds
    only its local slice (Loader._chunks), and
    make_array_from_process_local_data assembles the global array across
    hosts — the SPMD replacement for Blob.scatter + image_offset."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sh)
    return jax.tree_util.tree_map(
        lambda x: put(x) if x is not None else None, batch)
