"""Real multi-process (multi-host) execution test.

Wraps tools/multihost_smoke.py: TWO OS processes joined via
jax.distributed.initialize (gloo CPU collectives), one global 8-device
data-parallel mesh, each process feeding its process_index slice through
jax.make_array_from_process_local_data; asserts the 2-step loss sequence
equals a single-process run of the identical global batch.

Spawning two concurrent JAX compiles is expensive on a 1-core CI host
(~10 min), so this runs only when NM_TEST_MULTIHOST=1; the committed
artifact of the last run is MULTIHOST_SMOKE.json at the repo root.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(os.environ.get("NM_TEST_MULTIHOST") != "1",
                    reason="set NM_TEST_MULTIHOST=1 (slow: two concurrent "
                           "JAX processes; see MULTIHOST_SMOKE.json for the "
                           "committed artifact)")
def test_two_process_dp_equals_single_process():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_smoke.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    art = json.loads((REPO / "MULTIHOST_SMOKE.json").read_text())
    assert art["ok"] and art["nproc"] == 2
    assert art["losses_multiproc"] == pytest.approx(art["losses_singleproc"],
                                                    rel=2e-4)
