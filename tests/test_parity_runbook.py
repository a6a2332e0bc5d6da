"""Fixture-driven dry run of tools/parity_runbook.py (VERDICT r2 #8): the
one-command import -> eval -> gate pipeline must work end-to-end on a
fabricated VG-SGG.h5 + torch-format vgrel checkpoint, so it closes the R@K
parity gate the day real data/checkpoints land.

Runs in a subprocess with NM_TPU_IM_SCALE=96 (the dry-run hook) so the VGG
stack stays cheap on this 1-core host; the gate logic itself is also tested
in-process (both directions)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_vg_loader import vg_fixture  # noqa: F401  (pytest fixture)
from tests.test_e2e_parity import fabricate_full_sd

from tools.parity_runbook import PAPER, check_gate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_check_gate_logic():
    measured = {m: dict(t) for m, t in PAPER.items()}
    rep = check_gate(measured, PAPER, gate=0.2)
    assert set(rep) == {"predcls", "sgcls", "sgdet"}
    assert all(r["pass"] for r in rep.values())
    # within-gate drift still passes; beyond-gate fails
    measured["sgcls"][50] += 0.19
    assert check_gate(measured, PAPER, 0.2)["sgcls"]["pass"]
    measured["sgcls"][100] -= 0.21
    assert not check_gate(measured, PAPER, 0.2)["sgcls"]["pass"]
    # R@20 is informational: a large R@20 drift alone must not fail the gate
    measured = {m: dict(t) for m, t in PAPER.items()}
    measured["sgdet"][20] += 5.0
    assert check_gate(measured, PAPER, 0.2)["sgdet"]["pass"]


def test_runbook_dry_run(vg_fixture, tmp_path):  # noqa: F811
    # tiny reference-layout checkpoint matching the fixture's 10 classes /
    # 10 predicates (bg included) at the dry-run dims below
    sd = fabricate_full_sd(np.random.RandomState(3), nc=10, nprd=10,
                           obj_dim=128, pool_dim=128, embed_dim=16, hid=24,
                           nl_obj=2, nl_edge=2)
    ckpt = tmp_path / "vgrel-7.tar"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               str(ckpt))
    out = tmp_path / "PARITY.json"

    env = dict(os.environ)
    env.update(NM_TPU_IM_SCALE="96", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    # JAX_PLATFORMS=cpu alone is NOT enough: with PALLAS_AXON_POOL_IPS set,
    # sitecustomize registers the axon TPU plugin and overrides
    # jax_platforms after env processing — the subprocess would then hang
    # on an unreachable/claimed chip. Dropping the var keeps the dry run
    # hermetic on CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [sys.executable, "-m", "tools.parity_runbook",
           "--vg-h5", str(vg_fixture / "VG-SGG.h5"),
           "--vg-dicts", str(vg_fixture / "dicts.json"),
           "--vg-image-data", str(vg_fixture / "image_data.json"),
           "--vg-images", str(vg_fixture / "imgs"),
           "--sgcls-ckpt", str(ckpt),
           "--modes", "sgcls", "--val-size", "2", "--out", str(out),
           "--extra-args",
           "-nl_obj", "2", "-nl_edge", "2", "-hidden_dim", "24",
           "-pooling_dim", "128", "-obj_dim", "128", "-embed_dim", "16",
           "-b", "1", "-dtype", "float32",
           "-max_gt_boxes", "8", "-max_gt_rels", "8",
           "-objs_per_img", "8", "-max_pairs_eval", "56"]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=1200)
    # rc 1 is a legitimate gate-FAIL, but an unhandled exception also exits
    # 1 — the written artifact is what distinguishes them
    assert proc.returncode in (0, 1) and out.exists(), \
        f"runbook crashed (rc={proc.returncode}):\n" \
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"

    payload = json.loads(out.read_text())
    rep = payload["report"]["sgcls"]
    assert rep["expected"] == {str(k): v for k, v in PAPER["sgcls"].items()} \
        or rep["expected"] == PAPER["sgcls"]  # json int-keys round-trip
    assert set(map(int, rep["measured"])) == {20, 50, 100}
    for k, v in rep["measured"].items():
        assert 0.0 <= v <= 100.0
    # recalls are cumulative in K
    m = {int(k): v for k, v in rep["measured"].items()}
    assert m[20] <= m[50] <= m[100]
    assert ("PASS" in proc.stdout) or ("FAIL" in proc.stdout)
    assert payload["all_pass"] == (proc.returncode == 0)
