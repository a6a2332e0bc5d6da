"""End-to-end learning proof on the STRUCTURED synthetic dataset: the full
two-stage reference recipe (detector pretraining, reference
models/train_detector.py, then relation training, models/train_rels.py) on
scenes whose classes are color-keyed and whose predicates are deterministic
functions of box geometry (data/synthetic.py StructuredSyntheticVG) — so a
working train -> decode -> eval chain MUST reach R@20 ~= 1 on the train
split and high recall on held-out scenes, with the REAL evaluator
(evaluation/sg_eval.py). An unlearnable dataset can never show this; VG
itself is absent on this machine.

Stages (each records train + heldout recall into TRAINED_SYNTH.json):
  det      rpntrain detector pretraining -> detection mAP@0.5
  sgcls    MotifNet gtbox-mode relation training on the frozen detector
  sgdet    MotifNet refinerels training seeded from the sgcls weights
           (the reference's refine_for_detection.sh recipe)
  stanford RelModelStanford sgcls training (GRU message passing)
  stanford-sgdet  RelModelStanford refinerels training seeded from the
           stanford sgcls weights
  sgcls-plateau   MotifNet sgcls with the reference's constant-lr +
           ReduceLROnPlateau(R@100) + early-exit recipe
           (train_rels.py:68-69,203-207) instead of cosine decay

Run: python tools/train_synth.py [--scale full|mid] [--stages det,sgcls,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

def scale_cfg(name: str):
    from neural_motifs_tpu import config as C
    if name == "full":
        # IM_SCALE rendering, VGG16 at full resolution, mid-size heads
        return dict(
            im=C.IM_SCALE, nc=16, np_=7, batch=8,
            n_train=192, n_heldout=48,
            budgets=C.PadBudgets(max_gt_boxes=16, max_gt_rels=96,
                                 rels_per_img=128, max_pairs_eval=4096),
            model_kw=dict(hidden_dim=256, pooling_dim=1024, obj_dim=1024,
                          embed_dim=64, nl_obj=2, nl_edge=2),
            det_steps=900, rel_steps=1600, sgdet_steps=1200,
            stanford_steps=1000, det_lr=1e-3, rel_lr=1e-3)
    if name == "tiny":  # CPU-runnable smoke (tests/test_train_synth.py).
        # im=96 / boxes 0.35-0.55 of the image: objects are 34-53 px,
        # matching the two smallest learned anchors (35/66 px) so the
        # detector stage is geometrically feasible at this resolution.
        return dict(
            im=96, nc=7, np_=7, batch=4,
            n_train=16, n_heldout=8,
            data_kw=dict(box_range=(0.35, 0.55), min_objs=2, max_objs=4,
                         margin=0.04),
            budgets=C.PadBudgets(max_gt_boxes=12, max_gt_rels=64,
                                 rels_per_img=48, objs_per_img=16,
                                 max_pairs_eval=132,
                                 rpn_pre_nms_topn_train=512,
                                 rpn_post_nms_topn_train=256,
                                 rpn_pre_nms_topn_test=512,
                                 rpn_post_nms_topn_test=128),
            model_kw=dict(hidden_dim=64, pooling_dim=128, obj_dim=128,
                          embed_dim=16, nl_obj=1, nl_edge=1),
            det_steps=300, rel_steps=600, sgdet_steps=300,
            stanford_steps=300, det_lr=1e-3, rel_lr=2e-3)
    if name == "mid":   # fast TPU sanity loop (compiles are the long pole)
        return dict(
            im=192, nc=12, np_=7, batch=8,
            n_train=96, n_heldout=32,
            budgets=C.PadBudgets(max_gt_boxes=16, max_gt_rels=96,
                                 rels_per_img=64, objs_per_img=32,
                                 max_pairs_eval=992,
                                 rpn_pre_nms_topn_train=2000,
                                 rpn_post_nms_topn_train=1000,
                                 rpn_pre_nms_topn_test=2000,
                                 rpn_post_nms_topn_test=500),
            model_kw=dict(hidden_dim=128, pooling_dim=256, obj_dim=256,
                          embed_dim=32, nl_obj=2, nl_edge=2),
            det_steps=600, rel_steps=800, sgdet_steps=600,
            stanford_steps=500, det_lr=1e-3, rel_lr=1e-3)
    raise ValueError(name)


def make_data(sc):
    from neural_motifs_tpu.data.synthetic import StructuredSyntheticVG
    kw = sc.get("data_kw", {})
    train = StructuredSyntheticVG(sc["n_train"], "train", seed=3,
                                  num_classes=sc["nc"],
                                  num_predicates=sc["np_"],
                                  im_size=sc["im"], **kw)
    heldout = StructuredSyntheticVG(sc["n_heldout"], "val", seed=3,
                                    num_classes=sc["nc"],
                                    num_predicates=sc["np_"],
                                    im_size=sc["im"], **kw)
    return train, heldout


def render_batches(ds, sc, budgets):
    """Pre-render the whole dataset once into host batch dicts (the scenes
    are deterministic per index; re-rendering per epoch on this 1-core host
    would be the bottleneck)."""
    from neural_motifs_tpu.data.synthetic import structured_batch_dicts
    b = sc["batch"]
    out = []
    for s in range(0, len(ds) - b + 1, b):
        out.append(structured_batch_dicts(ds, range(s, s + b), budgets))
    return out


# --------------------------------------------------------------------------
# eval helpers
# --------------------------------------------------------------------------

def eval_recall(model, params, batch_stats, batches, mode: str,
                eval_jit=None):
    """Real-evaluator R@K over a list of host batch dicts."""
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
    from neural_motifs_tpu.models.rel_model import prediction_to_entries

    feed = ("images", "im_hw") + (
        ("gt_boxes", "gt_classes", "gt_mask") if mode != "sgdet" else ())
    if eval_jit is None:
        eval_jit = jax.jit(lambda p, bs, kw: model.apply(
            {"params": p, "batch_stats": bs}, train=False,
            rngs={"sample": jax.random.PRNGKey(0)}, **kw))
    ev = BasicSceneGraphEvaluator(mode)
    s = C.BOX_SCALE / C.IM_SCALE
    for b in batches:
        kw = {k: jnp.asarray(b[k]) for k in feed}
        pred = jax.device_get(eval_jit(params, batch_stats, kw))
        for i, entry in enumerate(prediction_to_entries(pred)):
            m, rm = b["gt_mask"][i], b["gt_rel_mask"][i]
            if not rm.any():
                continue
            gt = {"gt_classes": b["gt_classes"][i][m],
                  "gt_relations": b["gt_rels"][i][rm],
                  "gt_boxes": b["gt_boxes"][i][m] * s}
            ev.evaluate_scene_graph_entry(gt, entry)
    return {k: round(float(100 * np.mean(v)), 2)
            for k, v in ev.result_dict[mode + "_recall"].items()}, eval_jit


def train_loop(state, step, batches, steps, rng, tag, log_every=100):
    import jax
    t0 = time.time()
    last = None
    for i in range(steps):
        state, m = step(state, batches[i % len(batches)],
                        jax.random.fold_in(rng, i))
        if i % log_every == 0 or i == steps - 1:
            last = {k: round(float(v), 4) for k, v in m.items()}
            print(f"# [{tag}] step {i}/{steps}: {last}", flush=True)
    print(f"# [{tag}] {steps} steps in {time.time() - t0:.1f}s", flush=True)
    return state, last


# --------------------------------------------------------------------------
# stages
# --------------------------------------------------------------------------

def trunk_warmup(det, params, batch_stats, dtb, steps, lr):
    """Short gtbox-mode class-CE warmup of the trunk + RoI head.

    The reference NEVER trains the detector from a random trunk — it loads
    ImageNet-pretrained VGG (lib/object_detector.py vgg16(pretrained=True))
    before rpntrain. From scratch, the joint rpntrain loss has a sticky
    'predict background everywhere' minimum (~80% of sampled rois are bg,
    class CE plateaus at fg_frac*ln(NC) with fg accuracy at chance —
    measured on this synthetic set). 300-400 steps of pure fg class CE over
    GT boxes makes the trunk class-discriminative first, standing in for
    the ImageNet init this dataless environment cannot have."""
    import jax
    import optax
    from neural_motifs_tpu.training.losses import masked_ce

    gt_det = det.clone(mode="gtbox")
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr, eps=1e-3))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        def loss_fn(p):
            out = gt_det.apply({"params": p, "batch_stats": batch_stats},
                               train=True, rngs={"sample": key, "dropout": key},
                               **batch)
            ce = masked_ce(out.od_obj_dists, batch["gt_classes"], out.od_valid)
            acc = (((out.od_obj_dists.argmax(-1) == batch["gt_classes"])
                    & out.od_valid).sum() / out.od_valid.sum())
            return ce, acc
        (ce, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, ce, acc

    t0 = time.time()
    for i in range(steps):
        params, opt, ce, acc = step(params, opt, dtb[i % len(dtb)],
                                    jax.random.fold_in(jax.random.PRNGKey(11), i))
        if i % 100 == 0 or i == steps - 1:
            print(f"# [det/warmup] step {i}/{steps}: ce {float(ce):.4f} "
                  f"gtbox-acc {float(acc):.3f}", flush=True)
    print(f"# [det/warmup] {steps} steps in {time.time() - t0:.1f}s", flush=True)
    return params


def stage_detector(sc, train_b, held_b, dev_train):
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu.models.detector import ObjectDetector
    from neural_motifs_tpu.training.losses import detector_losses
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer,
                                                        make_train_step)

    det = ObjectDetector(num_classes=sc["nc"], mode="rpntrain",
                         budgets=sc["budgets"], dtype=jnp.bfloat16,
                         obj_dim=sc["model_kw"]["obj_dim"], thresh=0.01,
                         max_per_img=sc["budgets"].objs_per_img)
    feed = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_mask")
    dtb = [{k: b[k] for k in feed} for b in dev_train]
    tx = make_optimizer(sc["det_lr"], l2=1e-4, clip=5.0, adam=True)
    state = create_train_state(det, jax.random.PRNGKey(0), dtb[0], tx)
    warm = trunk_warmup(det, state.params, state.batch_stats, dtb,
                        sc.get("warmup_steps", 400), sc["det_lr"])
    state = state.replace(params=warm, opt_state=tx.init(warm))
    step = make_train_step(detector_losses, lambda b: b, donate=False)
    state, last = train_loop(state, step, dtb, sc["det_steps"],
                             jax.random.PRNGKey(5), "det")

    # detection quality on held-out scenes (self-contained mAP evaluator)
    from neural_motifs_tpu.evaluation.det_map import coco_map
    eval_fn = jax.jit(lambda p, bs, kw: det.apply(
        {"params": p, "batch_stats": bs}, train=False, **kw))
    results, gt_boxes, gt_classes = [], [], []
    img_id = 0
    for b in held_b:
        out = jax.device_get(eval_fn(state.params, state.batch_stats,
                                     {k: jnp.asarray(b[k]) for k in
                                      ("images", "im_hw")}))
        for i in range(b["images"].shape[0]):
            m = b["gt_mask"][i]
            gt_boxes.append(b["gt_boxes"][i][m])
            gt_classes.append(b["gt_classes"][i][m])
            for j in np.where(out.rm_valid[i])[0]:
                cls = int(out.obj_preds[i, j])
                box = out.boxes_all[i, j, cls]
                results.append({"image_id": img_id, "category_id": cls,
                                "bbox": [float(box[0]), float(box[1]),
                                         float(box[2] - box[0] + 1),
                                         float(box[3] - box[1] + 1)],
                                "score": float(out.obj_scores[i, j])})
            img_id += 1
    from neural_motifs_tpu.data.adapters import faux_coco_annotations
    classes = ["__background__"] + [f"c{i}" for i in range(1, sc["nc"])]
    anns = faux_coco_annotations(gt_classes, gt_boxes, classes)
    m50 = coco_map(anns, results)["map_50"]
    print(f"# [det] heldout mAP@0.5 = {m50:.4f}", flush=True)
    return state, {"final_losses": last, "heldout_map50": round(float(m50), 4)}


def build_rel_model(sc, mode, model_name="motifnet"):
    import jax.numpy as jnp
    kw = sc["model_kw"]
    rng = np.random.RandomState(1)
    if model_name == "stanford":
        from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
        return RelModelStanford(num_classes=sc["nc"], num_rels=sc["np_"],
                                mode=mode, budgets=sc["budgets"],
                                dtype=jnp.bfloat16, thresh=0.01,
                                require_overlap_det=False,  # see below
                                obj_dim=kw["obj_dim"])
    from neural_motifs_tpu.models.rel_model import RelModel
    return RelModel(
        num_classes=sc["nc"], num_rels=sc["np_"], mode=mode,
        budgets=sc["budgets"], dtype=jnp.bfloat16, thresh=0.01,
        # the sgdet candidate-pair overlap prior (reference
        # rel_model.py:316,425 require_overlap_det) assumes VG-like data
        # where related objects intersect; the structured predicates
        # (left/right/above/below) are margin-SEPARATED by construction, so
        # the prior would exclude ~90% of GT pairs and cap sgdet recall at
        # the inside/contains share (~6%, measured). The reference exposes
        # the same knob for the same reason.
        require_overlap_det=False,
        order="leftright", use_bias=True, rec_dropout=0.1,
        embed_vecs=rng.randn(sc["nc"], kw["embed_dim"]).astype(np.float32) * 0.1,
        decoder_embed_vecs=rng.randn(sc["nc"] + 1, 100).astype(np.float32) * 0.1,
        freq_table=np.zeros((sc["nc"] ** 2, sc["np_"]), np.float32), **kw)


def stage_rel(sc, mode, det_params, det_stats, dev_train, train_b, held_b,
              model_name="motifnet", init_params=None, init_stats=None,
              steps=None, recipe="cosine"):
    import jax
    import optax
    from neural_motifs_tpu.training.losses import rel_losses
    from neural_motifs_tpu.training.train_state import (create_train_state,
                                                        make_optimizer,
                                                        make_train_step)
    from neural_motifs_tpu.training.checkpoint import optimistic_restore

    model = build_rel_model(sc, mode, model_name)
    n_steps = steps or sc["rel_steps"]
    if recipe == "plateau":
        # the reference recipe verbatim: constant lr + ReduceLROnPlateau on
        # val R@100 with early exit once lr decays below lr/100
        # (train_rels.py:68-69,203-207) — proves the PlateauScheduler /
        # set_lr_scale path trains end-to-end, not just its unit tests
        sched = sc["rel_lr"]
    else:
        # warmup+cosine decay: constant-lr Adam at these scales destabilizes
        # late (loss dips then blows up with grad-norm spikes once the
        # decoder commits sharpen); decaying to ~0 both stabilizes and lets
        # the run actually converge to its overfit floor
        sched = optax.warmup_cosine_decay_schedule(
            0.0, sc["rel_lr"], min(100, n_steps // 4), n_steps,
            end_value=sc["rel_lr"] * 0.02)
    tx = make_optimizer(sched, l2=1e-4, clip=5.0, adam=True,
                        freeze_detector=True)
    state = create_train_state(model, jax.random.PRNGKey(2), dev_train[0], tx)
    params = dict(state.params)
    stats = dict(state.batch_stats) if state.batch_stats else {}
    if init_params is not None:   # sgdet: seed every matching leaf from sgcls
        params = optimistic_restore(params, init_params)
        stats = optimistic_restore(stats, init_stats or {})
    # graft the pretrained detector subtree (the reference loads the
    # vg-faster-rcnn checkpoint here, train_rels.py:75-95)
    params["detector"] = optimistic_restore(params["detector"], det_params,
                                            verbose=False)
    if det_stats:
        stats["detector"] = optimistic_restore(
            stats.get("detector", {}), det_stats, verbose=False)
    state = state.replace(params=params, batch_stats=stats,
                          opt_state=tx.init(params))

    step = make_train_step(rel_losses, lambda b: b, donate=False)
    tag = f"{model_name}/{mode}"
    # short runs leave the momentum-0.999 BNs (pos_bn, union-mask convs)
    # with stale running stats -> eval forward diverges from train; set the
    # running stats to the exact dataset statistics before evaluating
    from neural_motifs_tpu.training.calibrate import calibrate_batch_stats

    def calibrated(st):
        return calibrate_batch_stats(
            model.apply, st.params, st.batch_stats, dev_train,
            rngs=lambda i: {"sample": jax.random.PRNGKey(100 + i),
                            "dropout": jax.random.PRNGKey(200 + i)})

    if recipe == "plateau":
        from neural_motifs_tpu.training.train_state import (PlateauScheduler,
                                                            set_lr_scale)
        plateau = PlateauScheduler(patience=2, cooldown=1)
        chunk = max(1, n_steps // 8)
        base_scale, ejit, last = 1.0, None, None
        for ep in range(12):           # epochs-of-chunks, early exit below
            state, last = train_loop(state, step, dev_train, chunk,
                                     jax.random.fold_in(
                                         jax.random.PRNGKey(9), ep),
                                     f"{tag}/plateau-e{ep}", log_every=chunk)
            r_held, ejit = eval_recall(model, state.params,
                                       calibrated(state), held_b, mode,
                                       ejit)
            scale = plateau.step(r_held[100])
            print(f"# [{tag}] plateau e{ep}: heldout R@100 {r_held[100]} "
                  f"lr-scale {scale}", flush=True)
            if scale != base_scale:
                base_scale = scale
                state = state.replace(
                    opt_state=set_lr_scale(state.opt_state, scale))
            if scale <= 1 / 99.0:      # train_rels.py:203-207 early exit
                print(f"# [{tag}] plateau early exit at epoch {ep}",
                      flush=True)
                break
    else:
        state, last = train_loop(state, step, dev_train,
                                 n_steps, jax.random.PRNGKey(9), tag)
    state = state.replace(batch_stats=calibrated(state))
    r_train, ejit = eval_recall(model, state.params, state.batch_stats,
                                train_b, mode)
    r_held, _ = eval_recall(model, state.params, state.batch_stats,
                            held_b, mode, ejit)
    print(f"# [{tag}] train R@K {r_train} | heldout R@K {r_held}", flush=True)
    return state, {"final_losses": last, "recall_train": r_train,
                   "recall_heldout": r_held}


# --------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", default="full", choices=("full", "mid", "tiny"))
    p.add_argument("--stages", default="det,sgcls,sgdet,stanford")
    p.add_argument("--out", default=str(REPO / "TRAINED_SYNTH.json"))
    p.add_argument("--save-dir", default="/tmp/nm_synth_ckpt")
    p.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"),
                   help="force a jax platform (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; the config knob is authoritative)")
    p.add_argument("--no-assert", action="store_true",
                   help="record results without the learning-bar assertions")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sc = scale_cfg(args.scale)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    train, heldout = make_data(sc)
    t0 = time.time()
    train_b = render_batches(train, sc, sc["budgets"])
    held_b = render_batches(heldout, sc, sc["budgets"])
    print(f"# rendered {len(train_b)}+{len(held_b)} batches "
          f"in {time.time() - t0:.1f}s", flush=True)
    dev_train = [{k: jnp.asarray(v) for k, v in b.items()} for b in train_b]

    # partial re-runs keep the other stages' existing results — but only
    # when the prior artifact was produced at the SAME --scale; merging
    # across scales would mislabel carried-over results (and reloading
    # their checkpoints would crash on param-shape mismatch).
    prior_stages = {}
    if Path(args.out).exists():
        try:
            prior = json.loads(Path(args.out).read_text())
            if prior.get("scale") == args.scale:
                prior_stages = prior.get("stages", {})
            else:
                print(f"# prior artifact scale={prior.get('scale')!r} != "
                      f"--scale {args.scale!r}: not merging its stages",
                      flush=True)
        except Exception:
            pass
    report = {"scale": args.scale, "backend": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "when": time.strftime("%Y-%m-%d %H:%M:%S"),
              "dataset": {"images_train": len(train), "im_size": sc["im"],
                          "num_classes": sc["nc"],
                          "num_predicates": sc["np_"],
                          "predicates": "geometric (left/right/above/below/"
                                        "inside/contains), margin-gated"},
              "stages": prior_stages}

    from neural_motifs_tpu.training import checkpoint as ckpt_lib
    Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    # checkpoints in save_dir are only reusable at the scale they were
    # trained at; a marker file guards against cross-scale reloads even
    # when the JSON artifact is absent
    scale_marker = Path(args.save_dir) / "scale.txt"
    if scale_marker.exists() and scale_marker.read_text().strip() != args.scale:
        print(f"# save_dir checkpoints are scale="
              f"{scale_marker.read_text().strip()!r}: clearing for "
              f"--scale {args.scale!r}", flush=True)
        for stale in Path(args.save_dir).glob("*.mp"):
            stale.unlink()
    scale_marker.write_text(args.scale)

    det_params = det_stats = None
    sgcls_params = sgcls_stats = None
    # stages not re-run this invocation load their saved checkpoints, so a
    # single stage can be iterated on without retraining its predecessors
    if "det" not in stages and Path(f"{args.save_dir}/det.mp").exists():
        pay = ckpt_lib.load_checkpoint(f"{args.save_dir}/det.mp")
        det_params, det_stats = pay["params"], pay["batch_stats"]
        print(f"# loaded det checkpoint from {args.save_dir}/det.mp", flush=True)
    if ("sgcls" not in stages and "sgdet" in stages
            and Path(f"{args.save_dir}/sgcls.mp").exists()):
        pay = ckpt_lib.load_checkpoint(f"{args.save_dir}/sgcls.mp")
        sgcls_params, sgcls_stats = pay["params"], pay["batch_stats"]
        print(f"# loaded sgcls checkpoint from {args.save_dir}/sgcls.mp",
              flush=True)
    stanford_params = stanford_stats = None
    if ("stanford" not in stages and "stanford-sgdet" in stages
            and Path(f"{args.save_dir}/stanford.mp").exists()):
        pay = ckpt_lib.load_checkpoint(f"{args.save_dir}/stanford.mp")
        stanford_params, stanford_stats = pay["params"], pay["batch_stats"]
        print(f"# loaded stanford checkpoint from {args.save_dir}/stanford.mp",
              flush=True)
    for stage in stages:
        print(f"=== stage {stage} ===", flush=True)
        check = (lambda cond, msg: None) if args.no_assert else (
            lambda cond, msg: (_ for _ in ()).throw(AssertionError(msg))
            if not cond else None)
        if stage == "det":
            dstate, rep = stage_detector(sc, train_b, held_b, dev_train)
            det_params, det_stats = dstate.params, dstate.batch_stats
            ckpt_lib.save_checkpoint(f"{args.save_dir}/det.mp", dstate)
            check(rep["heldout_map50"] > 0.5,
                  f"detector failed to learn: mAP@0.5 {rep['heldout_map50']}")
        else:
            assert det_params is not None, f"stage {stage} needs det first"
            mode = "sgdet" if stage.endswith("sgdet") else "sgcls"
            model_name = ("stanford" if stage.startswith("stanford")
                          else "motifnet")
            steps = (sc["sgdet_steps"] if stage.endswith("sgdet") else
                     (sc["stanford_steps"] if stage == "stanford" else None))
            init_p, init_s = {
                "sgdet": (sgcls_params, sgcls_stats),
                "stanford-sgdet": (stanford_params, stanford_stats),
            }.get(stage, (None, None))
            rstate, rep = stage_rel(
                sc, mode, det_params, det_stats, dev_train, train_b, held_b,
                model_name=model_name, init_params=init_p, init_stats=init_s,
                steps=steps,
                recipe="plateau" if stage == "sgcls-plateau" else "cosine")
            if stage == "sgcls":
                sgcls_params, sgcls_stats = rstate.params, rstate.batch_stats
            if stage == "stanford":
                stanford_params = rstate.params
                stanford_stats = rstate.batch_stats
            ckpt_lib.save_checkpoint(f"{args.save_dir}/{stage}.mp", rstate)
            if stage in ("sgcls", "sgcls-plateau"):
                # the plateau recipe EARLY-EXITS once val R@100 stops
                # improving (the reference's semantics) instead of cosine-
                # decaying to the overfit floor, so its train-recall bar is
                # slightly lower (measured 84.4 vs cosine's 85.1 at full
                # scale, with BETTER heldout: 90.6 vs 89.0 R@50)
                bar = 80.0 if stage == "sgcls-plateau" else 85.0
                check(rep["recall_train"][20] >= bar,
                      f"sgcls failed to overfit: train R@20 {rep['recall_train']}")
                check(rep["recall_heldout"][20] >= 30.0,
                      f"sgcls failed to generalize: {rep['recall_heldout']}")
            else:
                check(rep["recall_train"][20] > 0
                      and rep["recall_heldout"][20] > 0,
                      f"{stage} recall is zero: {rep}")
        report["stages"][stage] = rep
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(f"wrote {args.out}", flush=True)

    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
