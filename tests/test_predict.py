"""tools/predict.py — the custom-image serving entry point (no reference
equivalent: models/eval_rels.py only walks VG splits). The subprocess dry
run exercises the full chain: JPEG decode -> aspect buckets -> padded batch
-> sgdet forward -> JSON records + rendered graphs, with a tail-padded
final batch (5 images at -b 2)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tools.predict import (ImageFolder, Taxonomy, entry_to_record,
                           expand_image_paths, label_names)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    # landscape / portrait / square / tiny / non-JPEG: one per bucket plus
    # format fallbacks
    shapes = [(80, 120, "a.jpg"), (120, 80, "b.jpg"), (100, 100, "c.jpg"),
              (9, 37, "d.jpg"), (64, 48, "e.png")]
    for h, w, name in shapes:
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(str(d / name))
    return d


def test_expand_image_paths(image_dir, tmp_path):
    paths = expand_image_paths([str(image_dir)])
    assert len(paths) == 5 and paths == sorted(paths)
    single = expand_image_paths([paths[0]])
    assert single == [paths[0]]
    with pytest.raises(FileNotFoundError):
        expand_image_paths([str(tmp_path / "nope")])
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        expand_image_paths([str(empty)])


def test_image_folder_sizes_and_entries(image_dir):
    data = ImageFolder(expand_image_paths([str(image_dir)]))
    sizes = data.image_sizes()
    assert sizes.shape == (5, 2)
    assert (sizes == [(80, 120), (120, 80), (100, 100), (9, 37),
                      (64, 48)]).all()
    e = data[0]
    assert e["img"].dtype == np.uint8 and e["gt_boxes"].shape == (0, 4)
    from neural_motifs_tpu import config as C
    assert max(e["img"].shape[:2]) == C.IM_SCALE


def test_entry_to_record_and_names():
    entry = {
        "pred_boxes": np.array([[0., 0., 512., 512.], [100., 100., 200., 300.],
                                [0., 0., 1., 1.]]),
        "pred_classes": np.array([3, 5, 2]),
        "obj_scores": np.array([0.9, 0.8, 0.1]),
        "obj_valid": np.array([True, True, False]),
        "pred_rel_inds": np.array([[0, 1], [1, 2], [1, 0]]),
        "rel_scores": np.array([[0.1, 0.2, 0.7], [0.0, 1.0, 0.0],
                                [0.2, 0.3, 0.5]]),
    }
    rec = entry_to_record(entry, "x.jpg", (300, 600), topk=10)
    assert rec["height"] == 300 and rec["width"] == 600
    assert [o["id"] for o in rec["objects"]] == [0, 1]
    # BOX_SCALE -> original pixels: sf = 600/1024
    assert rec["objects"][0]["box"][2] == pytest.approx(512 * 600 / 1024)
    # relation touching the invalid object 2 is dropped; predicate skips bg
    assert [(r["subject"], r["object"]) for r in rec["relations"]] \
        == [(0, 1), (1, 0)]
    assert rec["relations"][0]["predicate"] == 2
    assert rec["relations"][0]["score"] == pytest.approx(0.7)

    tax = Taxonomy(["__background__", "a", "b", "c", "d", "e"],
                   ["__background__", "on", "near"])
    named = label_names(rec, tax)
    assert named["objects"][0]["label"] == "c"
    assert named["relations"][0]["predicate"] == "near"
    # original record untouched (ints)
    assert rec["objects"][0]["label"] == 3


def test_predict_cli_dry_run(image_dir, tmp_path):
    """Full pipeline in a subprocess at NM_TPU_IM_SCALE=96 (dry-run hook):
    5 images, -b 2 (tail-padded final batch), aspect buckets, viz out."""
    out = tmp_path / "preds.json"
    viz = tmp_path / "viz"
    env = dict(os.environ)
    env.update(NM_TPU_IM_SCALE="96", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic: no TPU plugin
    cmd = [sys.executable, "-m", "tools.predict",
           "-images", str(image_dir), "-out", str(out), "-viz", str(viz),
           "-topk", "5", "-names",
           "-b", "2", "-im_budget", "auto", "-dtype", "float32",
           "-nl_obj", "1", "-nl_edge", "1", "-hidden_dim", "24",
           "-pooling_dim", "128", "-obj_dim", "128", "-embed_dim", "16",
           "-max_gt_boxes", "8", "-max_gt_rels", "8", "-objs_per_img", "8",
           "-max_pairs_eval", "56"]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=1200)
    assert proc.returncode == 0, \
        f"predict crashed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"

    records = json.loads(out.read_text())
    assert len(records) == 5                       # tail batch not dropped
    by_file = {os.path.basename(r["file"]): r for r in records}
    assert set(by_file) == {"a.jpg", "b.jpg", "c.jpg", "d.jpg", "e.png"}
    assert by_file["a.jpg"]["height"] == 80 and by_file["a.jpg"]["width"] == 120
    for r in records:
        ids = {o["id"] for o in r["objects"]}
        for o in r["objects"]:
            x1, y1, x2, y2 = o["box"]
            assert x1 <= x2 and y1 <= y2
            assert isinstance(o["label"], str)     # -names
            assert 0.0 <= o["score"] <= 1.0
        for rel in r["relations"]:
            assert rel["subject"] in ids and rel["object"] in ids
            assert isinstance(rel["predicate"], str)
    # every image got a rendered graph (stem.png) + triplet sidecar (stem.txt)
    rendered = sorted(f for f in os.listdir(viz) if f.endswith(".png"))
    assert rendered == ["a.png", "b.png", "c.png", "d.png", "e.png"]
    assert sorted(f for f in os.listdir(viz) if f.endswith(".txt")) \
        == ["a.txt", "b.txt", "c.txt", "d.txt", "e.txt"]
