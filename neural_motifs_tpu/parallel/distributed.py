"""Multi-host scale-out helper.

The reference is single-host only (3 local GPUs via torch.nn.parallel;
SURVEY §2.4). Here, multi-host = the SAME pjit train step over a bigger
mesh: call `initialize()` on every host (jax.distributed), build the mesh
over jax.devices() (all hosts' chips), feed each host its
jax.process_index() shard of the global batch, and XLA routes gradient
psums over ICI within a slice and DCN across slices. No other code changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-ops on single-host setups.
    Args fall back to the standard env vars / TPU metadata autodetection."""
    if num_processes in (None, 1) and not coordinator_address and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_slice(global_index: np.ndarray) -> np.ndarray:
    """Which dataset indices this host should load: contiguous shard of the
    global batch order (host-sharded input pipeline)."""
    p = jax.process_index()
    n = jax.process_count()
    per = len(global_index) // n
    return global_index[p * per:(p + 1) * per]


def assert_same_across_hosts(x: float, tag: str = "value") -> None:
    """Cheap cross-host agreement check (e.g. eval metrics): gathers the
    scalar over the 'data' axis and asserts max-min is tiny."""
    import jax.numpy as jnp
    arr = jax.experimental.multihost_utils.process_allgather(jnp.float32(x))
    if float(arr.max() - arr.min()) > 1e-6:
        raise AssertionError(f"{tag} differs across hosts: {arr}")
