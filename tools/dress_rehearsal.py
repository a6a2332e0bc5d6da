"""Full-dataset-scale dress rehearsal on fabricated reference-schema VG
(VERDICT r4 next-item #3).

Every fixture test runs on tiny fabricated data; this tool validates the
*realistically sized* path the day real Visual Genome lands: a fabricated
VG-SGG.h5 with the reference's exact schema at the reference's exact scale
(108,073 usable images, ~1.2M boxes, ~1.3M relationships,
dataloaders/visual_genome.py:264-362), 108k real JPEG files on disk (5,000
unique VG-sized images + hardlinks), then — each in its own subprocess so
peak RSS is attributable —

  load    load_graphs for all three splits incl. the sgdet non-overlap
          filter (visual_genome.py:346-356), full VG construction with the
          image-list alignment guard, and the 5k-image header scan
  counts  frequency-count build over the ~77k-image train split through
          the native nm_count_triples kernel (get_dataset_counts.py:12-46)
  eval    a FULL 5,000-image val-epoch via tools/parity_runbook.py (the
          reference eval flow, models/eval_rels.py:87-112) with a
          fabricated canonical-layout vgrel-7.tar — the R@K gate is
          EXPECTED to fail on random weights; wall-clock/RSS/telemetry
          are the deliverable
  train   200 sgcls train steps at the canonical config (b6) through the
          real Loader/train_step stack

Writes DRESS_REHEARSAL.json: per-stage wall-clock, peak RSS, throughput,
and telemetry violations. Usage:

    python -m tools.dress_rehearsal --all          # fabricate + all stages
    python -m tools.dress_rehearsal --stage load   # one stage
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ROOT = os.path.join(REPO, ".dress_vg")

N_H5 = 108073            # load_image_filenames EXPECTED_NUM_IMAGES
CORRUPTED_IDS = (1592, 1722, 4616, 4617)   # listed but never on disk
N_TEST = 26000           # split=2 tail; rest split=0 (train+val)
N_POOL = 5000            # unique JPEGs; the rest are hardlinks
NC, NP = 150, 50         # VG taxonomy (bg excluded, as in the dicts file)
BOX_SCALE = 1024
VAL_SIZE = 5000

# VG-typical (w, h); the aspect spread exercises SquarePad + bucket logic
POOL_DIMS = [(500, 375), (375, 500), (640, 480), (480, 640), (800, 600),
             (1024, 768), (500, 333), (333, 500), (800, 533), (1024, 683)]


def vg_paths(root: str) -> dict:
    sf = os.path.join(root, "stanford_filtered")
    return {"h5": os.path.join(sf, "VG-SGG.h5"),
            "dicts": os.path.join(sf, "VG-SGG-dicts.json"),
            "image_data": os.path.join(sf, "image_data.json"),
            "images": os.path.join(root, "vg_images")}


def rss_gb() -> float:
    """Peak RSS of THIS process (VmHWM), GB."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return round(int(line.split()[1]) / 1e6, 3)
    return -1.0


# ---------------------------------------------------------------- fabricate

def fabricate(root: str, seed: int = 0) -> dict:
    from PIL import Image

    t_start = time.time()
    rng = np.random.default_rng(seed)
    paths = vg_paths(root)
    os.makedirs(os.path.dirname(paths["h5"]), exist_ok=True)
    os.makedirs(paths["images"], exist_ok=True)

    # --- image ids: 1..N such that skipping the corrupted ids leaves N_H5
    n_listed = N_H5 + len(CORRUPTED_IDS)
    ids = np.arange(1, n_listed + 1)
    usable = ids[~np.isin(ids, CORRUPTED_IDS)]
    assert len(usable) == N_H5

    # --- scene graphs (vectorized draws, one cheap python pass for rels)
    t0 = time.time()
    n_boxes = np.clip(rng.poisson(9, N_H5) + 2, 2, 30)
    first_box = np.concatenate([[0], np.cumsum(n_boxes)[:-1]]).astype(np.int64)
    last_box = first_box + n_boxes - 1
    total_boxes = int(n_boxes.sum())

    wh = rng.integers(24, 480, (total_boxes, 2))
    half = wh // 2
    cx = rng.integers(0, BOX_SCALE - 1, total_boxes)
    cy = rng.integers(0, BOX_SCALE - 1, total_boxes)
    cx = np.clip(cx, half[:, 0] + 1, BOX_SCALE - 1 - half[:, 0])
    cy = np.clip(cy, half[:, 1] + 1, BOX_SCALE - 1 - half[:, 1])
    boxes = np.column_stack([cx, cy, wh[:, 0], wh[:, 1]]).astype(np.int32)
    labels = rng.integers(1, NC + 1, total_boxes).astype(np.int32)

    n_rels = np.clip(rng.poisson(5, N_H5) + 1, 1, 25)
    total_rels = int(n_rels.sum())
    first_rel = np.concatenate([[0], np.cumsum(n_rels)[:-1]]).astype(np.int64)
    last_rel = first_rel + n_rels - 1
    predicates = rng.integers(1, NP + 1, total_rels).astype(np.int32)

    # pair choice per image: sampled WITH replacement (natural duplicate
    # (s,o) pairs exercise the dup-rel sampling path,
    # visual_genome.py:177-185); the object box of each rel is re-centered
    # inside its subject box so the pair overlaps (IoU > 0) and sgdet's
    # filter_non_overlap keeps the image (visual_genome.py:346-356)
    rel_img = np.repeat(np.arange(N_H5), n_rels)
    sub_l = (rng.random(total_rels) * n_boxes[rel_img]).astype(np.int64)
    off = 1 + (rng.random(total_rels)
               * (n_boxes[rel_img] - 1)).astype(np.int64)
    obj_l = (sub_l + off) % n_boxes[rel_img]          # != sub_l always
    sub_g = first_box[rel_img] + sub_l
    obj_g = first_box[rel_img] + obj_l
    jitter = rng.random((total_rels, 2)) * 0.6 - 0.3
    boxes[obj_g, 0] = np.clip(boxes[sub_g, 0]
                              + (jitter[:, 0] * boxes[sub_g, 2]).astype(np.int32),
                              boxes[obj_g, 2] // 2 + 1,
                              BOX_SCALE - 1 - boxes[obj_g, 2] // 2)
    boxes[obj_g, 1] = np.clip(boxes[sub_g, 1]
                              + (jitter[:, 1] * boxes[sub_g, 3]).astype(np.int32),
                              boxes[obj_g, 3] // 2 + 1,
                              BOX_SCALE - 1 - boxes[obj_g, 3] // 2)
    relationships = np.column_stack([sub_g, obj_g]).astype(np.int32)

    split = np.zeros(N_H5, np.int32)
    split[-N_TEST:] = 2
    t_graphs = time.time() - t0

    import h5py
    t0 = time.time()
    with h5py.File(paths["h5"], "w") as f:
        f["split"] = split
        f["boxes_1024"] = boxes
        f["boxes_512"] = np.maximum(boxes // 2, 1)
        f["labels"] = labels[:, None]
        f["img_to_first_box"] = first_box.astype(np.int32)
        f["img_to_last_box"] = last_box.astype(np.int32)
        f["img_to_first_rel"] = first_rel.astype(np.int32)
        f["img_to_last_rel"] = last_rel.astype(np.int32)
        f["relationships"] = relationships
        f["predicates"] = predicates[:, None]
    t_h5 = time.time() - t0

    with open(paths["dicts"], "w") as f:
        json.dump({"label_to_idx": {f"class_{i:03d}": i
                                    for i in range(1, NC + 1)},
                   "predicate_to_idx": {f"pred_{i:02d}": i
                                        for i in range(1, NP + 1)}}, f)

    # --- JPEGs: N_POOL unique smooth-noise images at VG-typical sizes
    # (low-res noise upscaled -> realistic decode cost, fast encode),
    # remaining 103k filenames hardlinked onto the pool
    t0 = time.time()
    dims = [POOL_DIMS[i % len(POOL_DIMS)] for i in range(N_POOL)]
    pool_fns = []
    for i in range(N_POOL):
        w, h = dims[i]
        fn = os.path.join(paths["images"], f"{usable[i]}.jpg")
        if not os.path.exists(fn):
            lo = rng.integers(0, 256, (h // 16, w // 16, 3), np.uint8)
            Image.fromarray(lo).resize((w, h), Image.BILINEAR).save(
                fn, quality=80)
        pool_fns.append(fn)
        if (i + 1) % 1000 == 0:
            print(f"[fabricate] pool {i + 1}/{N_POOL}", flush=True)
    t_pool = time.time() - t0

    t0 = time.time()
    n_link = 0
    for i in range(N_POOL, N_H5):
        fn = os.path.join(paths["images"], f"{usable[i]}.jpg")
        if not os.path.exists(fn):
            os.link(pool_fns[i % N_POOL], fn)
            n_link += 1
    t_link = time.time() - t0

    im_data = []
    dim_by_fn = {usable[i]: dims[i % N_POOL] for i in range(N_H5)}
    for img_id in ids:
        w, h = dim_by_fn.get(img_id, POOL_DIMS[0])
        im_data.append({"image_id": int(img_id), "width": w, "height": h})
    with open(paths["image_data"], "w") as f:
        json.dump(im_data, f)

    stats = {"wall_s": round(time.time() - t_start, 1),
             "graphs_s": round(t_graphs, 1), "h5_write_s": round(t_h5, 1),
             "jpeg_pool_s": round(t_pool, 1), "hardlink_s": round(t_link, 1),
             "n_images": N_H5, "n_boxes": total_boxes, "n_rels": total_rels,
             "n_unique_jpegs": N_POOL, "n_hardlinks": n_link,
             "peak_rss_gb": rss_gb()}
    print(f"[fabricate] {stats}", flush=True)
    return stats


# ------------------------------------------------------------------- stages

def stage_load(root: str) -> dict:
    from neural_motifs_tpu.data.visual_genome import VG, load_graphs

    p = vg_paths(root)
    out = {}

    t0 = time.time()   # the sgdet train load: per-image IoU non-overlap
    mask, bxs, cls, rels = load_graphs(p["h5"], "train", num_val_im=VAL_SIZE,
                                       filter_non_overlap=True)
    out["load_graphs_train_sgdet_s"] = round(time.time() - t0, 1)
    out["train_sgdet_images"] = len(bxs)
    out["train_sgdet_rels"] = int(sum(len(r) for r in rels))

    t0 = time.time()
    mask, bxs, cls, rels = load_graphs(p["h5"], "train", num_val_im=VAL_SIZE)
    out["load_graphs_train_s"] = round(time.time() - t0, 1)
    out["train_images"] = len(bxs)

    t0 = time.time()
    val = VG("val", roidb_file=p["h5"], dict_file=p["dicts"],
             image_file=p["image_data"], image_dir=p["images"],
             num_val_im=VAL_SIZE, filter_non_overlap=False)
    out["vg_val_construct_s"] = round(time.time() - t0, 1)
    out["val_images"] = len(val)
    assert len(val) == VAL_SIZE, len(val)

    t0 = time.time()
    sizes = val.image_sizes()          # 5k native jpeg header parses
    out["val_header_scan_s"] = round(time.time() - t0, 1)
    assert (sizes > 0).all()

    t0 = time.time()
    test = VG("test", roidb_file=p["h5"], dict_file=p["dicts"],
              image_file=p["image_data"], image_dir=p["images"],
              num_val_im=VAL_SIZE, filter_non_overlap=False)
    out["vg_test_construct_s"] = round(time.time() - t0, 1)
    out["test_images"] = len(test)

    # one real __getitem__ roundtrip per split (decode + pad + rel dedupe)
    t0 = time.time()
    for ds in (val, test):
        e = ds[0]
        assert e["img"].shape[2] == 3 and len(e["gt_boxes"]) >= 2
    out["getitem_roundtrip_s"] = round(time.time() - t0, 2)
    out["peak_rss_gb"] = rss_gb()
    return out


def stage_counts(root: str) -> dict:
    from neural_motifs_tpu.data.visual_genome import VG
    from neural_motifs_tpu.models.frequency import get_counts, box_filter

    p = vg_paths(root)
    t0 = time.time()
    train = VG("train", roidb_file=p["h5"], dict_file=p["dicts"],
               image_file=p["image_data"], image_dir=p["images"],
               num_val_im=VAL_SIZE, filter_non_overlap=False)
    t_load = time.time() - t0

    t0 = time.time()
    fg, bg = get_counts(train, must_overlap=True)
    t_native = time.time() - t0

    # naive-loop cost on a 2k-image prefix -> extrapolated python-loop cost
    t0 = time.time()
    sub_fg = np.zeros_like(fg)
    for i in range(2000):
        cl = train.gt_classes[i]
        for (s, o, pr) in train.relationships[i]:
            sub_fg[cl[s], cl[o], pr] += 1
        for (s, o) in box_filter(train.gt_boxes[i], must_overlap=True):
            pass
    t_naive_2k = time.time() - t0

    return {"train_images": len(train), "vg_construct_s": round(t_load, 1),
            "get_counts_native_s": round(t_native, 1),
            "naive_loop_2k_s": round(t_naive_2k, 1),
            "naive_loop_extrapolated_s":
                round(t_naive_2k * len(train) / 2000, 1),
            "fg_total": int(fg.sum()), "bg_total": int(bg.sum()),
            "peak_rss_gb": rss_gb()}


def fabricate_ckpt(root: str) -> str:
    """Canonical-layout vgrel-7.tar via the same fabricator the import
    tests use, He-rescaled: raw unit-normal weights explode through the 13
    VGG convs at full dims (activations hit inf by the trunk's end, every
    score goes NaN and the evaluator's sort-monotonicity telemetry fires on
    every image). 1/sqrt(fan_in) keeps the forward finite so the rehearsal
    measures real telemetry, not NaN noise."""
    import torch
    sys.path.insert(0, REPO)
    from tests.test_torch_import import fabricate_reference_sd

    fn = os.path.join(root, "vgrel-7.tar")
    if not os.path.exists(fn):
        sd = fabricate_reference_sd(np.random.RandomState(11))
        for k, v in sd.items():
            v = np.asarray(v)
            if k.endswith(".weight") and v.ndim >= 2:
                sd[k] = v / np.sqrt(np.prod(v.shape[1:]))
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, fn)
    return fn


def stage_eval(root: str) -> dict:
    from tools import parity_runbook

    p = vg_paths(root)
    ckpt = fabricate_ckpt(root)
    out_fn = os.path.join(root, "PARITY_DRESS.json")
    t0 = time.time()
    rc = parity_runbook.main([
        "--vg-h5", p["h5"], "--vg-dicts", p["dicts"],
        "--vg-image-data", p["image_data"], "--vg-images", p["images"],
        "--sgcls-ckpt", ckpt, "--modes", "sgcls",
        "--val-size", str(VAL_SIZE), "--out", out_fn])
    wall = time.time() - t0
    with open(out_fn) as f:
        parity = json.load(f)
    r = parity["report"]["sgcls"]
    # the canonical runbook flags include -test (the paper's R@K table IS
    # the test split), so the epoch covers the full 26k test carve — even
    # more demanding than the 5k-val "done" bar
    return {"wall_s": round(wall, 1), "images": N_TEST,
            "split": "test (canonical -test flag)",
            "imgs_per_s_incl_compile": round(N_TEST / wall, 1),
            "runbook_exit": rc,
            "gate_failed_as_expected_random_weights": not r["pass"],
            "measured_r@k": r["measured"], "peak_rss_gb": rss_gb()}


def stage_train(root: str, steps: int = 200) -> dict:
    import jax
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.batching import Loader, device_prefetch
    from neural_motifs_tpu.data.visual_genome import VG
    from neural_motifs_tpu.parallel.mesh import make_mesh, shard_batch
    from neural_motifs_tpu.training.losses import rel_losses
    from neural_motifs_tpu.training.train_rels import batch_kwargs, build_model
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer,
                                                        make_train_step)

    p = vg_paths(root)
    cfg = C.ModelConfig.from_args(
        ["-m", "sgcls", "-model", "motifnet", "-order", "leftright",
         "-nl_obj", "2", "-nl_edge", "4", "-b", "6", "-clip", "5",
         "-hidden_dim", "512", "-pooling_dim", "4096", "-use_bias",
         "-lr", "1e-5"])
    t0 = time.time()
    train, val = (VG(m, roidb_file=p["h5"], dict_file=p["dicts"],
                     image_file=p["image_data"], image_dir=p["images"],
                     num_val_im=VAL_SIZE, filter_non_overlap=False)
                  for m in ("train", "val"))
    t_data = time.time() - t0

    mesh = make_mesh()
    loader, _ = Loader.splits(train, val, batch_size=cfg.batch_size,
                              budgets=cfg.budgets, num_workers=1)
    model = build_model(cfg, train)
    tx = make_optimizer(cfg.lr * cfg.batch_size, l2=cfg.l2, clip=cfg.clip,
                        fc_lr_factor=0.1, freeze_detector=True)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               batch_kwargs(loader.peek()), tx)
    t_init = time.time() - t0

    train_step = make_train_step(rel_losses, batch_kwargs)
    rng = jax.random.PRNGKey(42)
    t_compile = None
    losses = None
    t0 = time.time()
    done = 0
    while done < steps:
        for batch, dev in device_prefetch(loader,
                                          lambda b: shard_batch(b, mesh)):
            state, losses = train_step(state, dev, rng)
            if t_compile is None:
                jax.block_until_ready(losses)
                _ = float(losses["total"])          # real host fetch barrier
                t_compile = time.time() - t0
                t0 = time.time()
            done += 1
            if done % 50 == 0:
                print(f"[train] step {done}/{steps} "
                      f"{ {k: round(float(v), 3) for k, v in losses.items()} }",
                      flush=True)
            if done >= steps:
                break
    final = {k: float(v) for k, v in losses.items()}
    steady = time.time() - t0
    assert all(np.isfinite(v) for v in final.values()), final
    report = loader.truncation_report()
    print(report, flush=True)
    return {"steps": steps, "data_load_s": round(t_data, 1),
            "state_init_s": round(t_init, 1),
            "first_step_s": round(t_compile, 1),
            "steady_wall_s": round(steady, 1),
            "imgs_per_s": round((steps - 1) * cfg.batch_size / steady, 1),
            "final_losses": {k: round(v, 4) for k, v in final.items()},
            "truncation_report": report, "peak_rss_gb": rss_gb()}


STAGES = {"load": stage_load, "counts": stage_counts, "eval": stage_eval,
          "train": stage_train}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=DEFAULT_ROOT)
    ap.add_argument("--stage", choices=list(STAGES) + ["fabricate"])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "DRESS_REHEARSAL.json"))
    a = ap.parse_args(argv)

    if a.stage:
        fn = fabricate if a.stage == "fabricate" else STAGES[a.stage]
        res = fn(a.root)
        print("DRESS_STAGE_JSON: " + json.dumps({a.stage: res}), flush=True)
        return 0

    if not a.all:
        ap.error("need --stage or --all")

    report = {"scale": {"n_images": N_H5, "val_size": VAL_SIZE,
                        "unique_jpegs": N_POOL}}
    if not os.path.exists(vg_paths(a.root)["h5"]):
        report["fabricate"] = fabricate(a.root)
    for name in STAGES:
        print(f"\n[dress] ===== stage {name} =====", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "tools.dress_rehearsal",
             "--root", a.root, "--stage", name],
            cwd=REPO, capture_output=True, text=True)
        tail = "\n".join(proc.stdout.splitlines()[-30:])
        print(tail, flush=True)
        if proc.returncode != 0:
            print(proc.stderr[-4000:], flush=True)
            report[name] = {"FAILED": True, "wall_s": round(time.time() - t0, 1),
                            "stderr_tail": proc.stderr[-2000:]}
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("DRESS_STAGE_JSON: "):
                report.update(json.loads(line[len("DRESS_STAGE_JSON: "):]))
        report[name]["stage_wall_s"] = round(time.time() - t0, 1)

    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\n[dress] wrote {a.out}", flush=True)
    failed = [k for k, v in report.items()
              if isinstance(v, dict) and v.get("FAILED")]
    print(f"[dress] failed stages: {failed or 'none'}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
