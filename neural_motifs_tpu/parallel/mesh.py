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


def _leaf_sharding(mesh: Mesh, path, leaf, shard_fc: bool) -> NamedSharding:
    """Megatron-style TP rule for the three VGG fc towers (detector RoI
    head, rel obj head, union head — the 25088x4096 / 4096x4096 GEMMs that
    hold ~85% of the params): `fc0` is column-sharded (output dim over
    MODEL_AXIS, bias sharded along), `fc1`/`proj` are row-sharded (input dim
    over MODEL_AXIS, bias replicated) so the pair needs exactly one psum and
    the [*, 4096] hidden activation never materializes unsharded. The rule
    keys on layer names anywhere in the path, so it applies equally to
    params and to optimizer momentum (whose paths embed the param paths).
    Everything else — convs, LSTM, heads, batch_stats, counters — is
    replicated (pure data parallelism)."""
    repl = NamedSharding(mesh, P())
    if not shard_fc:
        return repl
    nm = mesh.shape[MODEL_AXIS]
    if nm <= 1 or not hasattr(leaf, "ndim"):
        return repl
    keys = {str(getattr(p, "key", "")) for p in path}
    col, row = "fc0" in keys, ("fc1" in keys or "proj" in keys)
    if col and leaf.ndim == 2 and leaf.shape[1] % nm == 0:
        return NamedSharding(mesh, P(None, MODEL_AXIS))
    if col and leaf.ndim == 1 and leaf.shape[0] % nm == 0:
        return NamedSharding(mesh, P(MODEL_AXIS))
    if row and leaf.ndim == 2 and leaf.shape[0] % nm == 0:
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    return repl


def param_sharding(mesh: Mesh, params: Any, shard_fc: bool = False) -> Any:
    """Sharding tree for params: replicated, except (with shard_fc) the wide
    fc towers which are tensor-parallel over MODEL_AXIS (see _leaf_sharding)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_sharding(mesh, path, leaf, shard_fc), params)


def state_shardings(mesh: Mesh, state: Any, shard_fc: bool = False) -> Any:
    """Sharding tree for a whole TrainState (params + optimizer momentum +
    batch_stats + step). Momentum buffers inherit their param's TP layout
    because optax state paths embed the param path keys."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_sharding(mesh, path, leaf, shard_fc), state)


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
