"""REAL multi-process (multi-host) training-step smoke.

Round-1/2 multi-host evidence was simulation only (per-host Loader slices +
a virtual single-process mesh). This tool runs the actual thing: TWO OS
processes, each owning 4 CPU devices, joined with jax.distributed.initialize
(gloo CPU collectives stand in for the TPU slice's ICI/DCN fabric), one
global 8-way data-parallel mesh, each process feeding only its
process_index slice of the global batch through
jax.make_array_from_process_local_data (parallel/mesh.shard_batch — the
SPMD replacement for the reference's Blob.scatter + image_offset,
dataloaders/blob.py:148-180).

Two full relation train steps run under pjit; gradient psums cross the
process boundary. The parent then runs the identical global batch on a
single-process 8-device mesh and asserts the per-step losses match, so the
multi-process path is proven numerically equivalent — not just "it ran".

Usage:  python tools/multihost_smoke.py            # parent: spawn + verify
        (writes MULTIHOST_SMOKE.json at the repo root)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PORT = int(os.environ.get("NM_MH_PORT", "29521"))
NSTEPS = 2
GLOBAL_BATCH = 8  # one image per device on the 8-way data mesh


def _train_losses(pid: int, nproc: int) -> list[float]:
    """Run NSTEPS data-parallel train steps on an 8-device global mesh and
    return the loss sequence. nproc=1: single process owning all 8 devices;
    nproc=2: this process owns 4 and must collectively execute with its
    peer."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", GLOBAL_BATCH // nproc)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                                   num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    from __graft_entry__ import _tiny_setup
    from neural_motifs_tpu.parallel.mesh import shard_batch, state_shardings
    from neural_motifs_tpu.training.losses import rel_losses
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer)

    assert len(jax.devices()) == GLOBAL_BATCH, (
        f"expected {GLOBAL_BATCH} global devices, got {len(jax.devices())}")
    mesh = Mesh(np.asarray(jax.devices()).reshape(GLOBAL_BATCH), ("data",))

    # every process builds the SAME global batch deterministically, then
    # feeds only its slice — exactly the multi-host Loader contract
    # (same-seed global order, per-host decode of batch[lo:hi]).
    model, global_batch = _tiny_setup(num_images=GLOBAL_BATCH)
    per = GLOBAL_BATCH // jax.process_count()
    lo = jax.process_index() * per
    local = {k: v[lo:lo + per] for k, v in global_batch.items()}

    tx = make_optimizer(1e-3, fc_lr_factor=0.1)
    state = create_train_state(model, jax.random.PRNGKey(0), global_batch, tx)
    state_sh = state_shardings(mesh, state)
    state = jax.device_put(state, state_sh)

    with mesh:
        device_batch = shard_batch(local if jax.process_count() > 1
                                   else global_batch, mesh)

        def step(state, batch):
            def loss_fn(params):
                out, _ = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    train=True,
                    rngs={"sample": jax.random.PRNGKey(1),
                          "dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"], **batch)
                losses = rel_losses(out)
                return losses["total"], losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads), losses

        jstep = jax.jit(step, in_shardings=(state_sh,
                                            jax.tree_util.tree_map(
                                                lambda x: x.sharding,
                                                device_batch)))
        losses = []
        for _ in range(NSTEPS):
            state, l = jstep(state, device_batch)
            losses.append(float(l["total"]))
    return losses


def _child_main():
    pid = int(os.environ["NM_MH_PID"])
    nproc = int(os.environ["NM_MH_NPROC"])
    losses = _train_losses(pid, nproc)
    print("NM_MH_RESULT " + json.dumps({"pid": pid, "losses": losses}),
          flush=True)


def _spawn(pid: int, nproc: int) -> subprocess.Popen:
    env = dict(os.environ, NM_MH_ROLE="child", NM_MH_PID=str(pid),
               NM_MH_NPROC=str(nproc))
    return subprocess.Popen([sys.executable, __file__],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)


def _collect(p: subprocess.Popen, timeout: int = 900) -> dict:
    out, _ = p.communicate(timeout=timeout)
    if p.returncode != 0:
        raise RuntimeError(f"child failed rc={p.returncode}:\n{out}")
    for line in out.splitlines():
        if line.startswith("NM_MH_RESULT "):
            return json.loads(line[len("NM_MH_RESULT "):])
    raise RuntimeError(f"no result line in child output:\n{out}")


def main():
    import numpy as np

    # 2-process run: both children must be alive simultaneously (they
    # rendezvous at the coordinator and at every collective).
    kids = [_spawn(i, 2) for i in range(2)]
    res = [_collect(p) for p in kids]
    res.sort(key=lambda r: r["pid"])
    print(f"2-process losses: p0={res[0]['losses']} p1={res[1]['losses']}")
    np.testing.assert_allclose(res[0]["losses"], res[1]["losses"], rtol=1e-6)

    # single-process reference on the identical global batch
    ref = _collect(_spawn(0, 1))
    print(f"1-process reference losses: {ref['losses']}")
    np.testing.assert_allclose(res[0]["losses"], ref["losses"],
                               rtol=2e-4, atol=2e-5)

    artifact = {
        "ok": True,
        "nproc": 2,
        "devices_per_proc": GLOBAL_BATCH // 2,
        "steps": NSTEPS,
        "losses_multiproc": res[0]["losses"],
        "losses_singleproc": ref["losses"],
    }
    (REPO / "MULTIHOST_SMOKE.json").write_text(json.dumps(artifact, indent=1))
    print("MULTIHOST SMOKE: OK — 2-process x 4-device DP step == "
          "single-process 8-device step")


if __name__ == "__main__":
    if os.environ.get("NM_MH_ROLE") == "child":
        _child_main()
    else:
        main()
