"""bf16-vs-f32 divergence audit of the parity-critical DISCRETE decision
points (VERDICT r2 #1): the last closable numerical risk on the 0.2-pt R@K
gate while VG data / released checkpoints are absent.

R@K flows through three discrete decisions; a continuous bf16 wobble only
matters if it FLIPS one of them:

  1. per-class NMS keep sets in the sgdet detector
     (ops/nms.py per_class_nms_mask, reference
      /root/reference/lib/object_detector.py:438-463)
  2. decoder label commits (sgcls/sgdet leave-one-out NMS decode,
     models/context.py DecoderRNN, reference
      /root/reference/lib/lstm/decoder_rnn.py:229-247)
  3. triplet-score sort order — specifically the TOP-K SET at K=20/50/100,
     which is exactly what evaluate_recall consumes
     (models/rel_model.py decode, reference /root/reference/lib/surgery.py:21-59)

Protocol: ONE f32 parameter set, full-VG-scale MotifNet; the eval graph is
run with compute dtype bf16 and f32 (two distinct jitted callables — the
pjit cache is keyed per function object; see docs/ROUND2.md gotchas) on the
SAME device and inputs; inputs are synthetic images with VG-like GT stats.
For each mode (sgcls, sgdet) we report per-image flip RATES for each
decision point plus a direct R@K delta computed by running the real
evaluator on both outputs against the synthetic GT.

Writes PRECISION_AUDIT.json (TPU_CHECK-style tracked artifact).

Run: python tools/precision_audit.py [--batch 8] [--n-batches 2]
     [--modes sgcls,sgdet]
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


def build_model(mode: str, dtype, budgets, require_overlap: bool = True):
    import jax.numpy as jnp  # noqa: F401
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.models.rel_model import RelModel

    rng = np.random.RandomState(0)
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    # thresh=0.0: the audited weights carry a random (untrained) detector
    # score head, so a real threshold would keep zero detections and make
    # every sgdet decision metric vacuous; thresh 0 keeps the top-64 rois
    # (near-tied scores = the conservative worst case for NMS stability)
    return RelModel(
        num_classes=nc, num_rels=npred, mode=mode, budgets=budgets,
        dtype=dtype, hidden_dim=512, pooling_dim=4096, obj_dim=4096,
        embed_dim=200, nl_obj=2, nl_edge=4, order="leftright", use_bias=True,
        use_tanh=False, limit_vision=False, thresh=0.0,
        # structured-data audits disable the sgdet candidate-pair overlap
        # prior: the geometric predicates are margin-separated by
        # construction, so the VG-style prior would exclude ~90% of GT
        # pairs and zero the recall legs (same knob + rationale as
        # tools/train_synth.py build_rel_model)
        require_overlap_det=require_overlap,
        embed_vecs=rng.randn(nc, 200).astype(np.float32) * 0.1,
        decoder_embed_vecs=rng.randn(nc + 1, 100).astype(np.float32) * 0.1,
        freq_table=rng.randn(nc * nc, npred).astype(np.float32) * 0.1)


def synth_batches(batch: int, n_batches: int, seed: int = 7):
    """Synthetic eval batches with VG-like GT statistics (VG mean ~11 objs,
    ~6 rels per filtered image; BASELINE.md)."""
    from neural_motifs_tpu import config as C

    rng = np.random.RandomState(seed)
    budgets = C.PadBudgets()
    g, r, im = budgets.max_gt_boxes, budgets.max_gt_rels, C.IM_SCALE
    nc, npred = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
    out = []
    for _ in range(n_batches):
        images = (rng.randn(batch, im, im, 3) * 0.3).astype(np.float32)
        im_hw = np.full((batch, 2), float(im), np.float32)
        gt_boxes = np.zeros((batch, g, 4), np.float32)
        gt_classes = np.zeros((batch, g), np.int32)
        gt_mask = np.zeros((batch, g), bool)
        gt_rels = np.zeros((batch, r, 3), np.int32)
        gt_rel_mask = np.zeros((batch, r), bool)
        for i in range(batch):
            n = rng.randint(6, 20)
            xy = rng.uniform(0, im * 0.6, (n, 2))
            wh = rng.uniform(30, im * 0.35, (n, 2))
            gt_boxes[i, :n] = np.concatenate(
                [xy, np.minimum(xy + wh, im - 1)], 1)
            gt_classes[i, :n] = rng.randint(1, nc, n)
            gt_mask[i, :n] = True
            nr = rng.randint(3, 12)
            for k in range(nr):
                s, o = rng.choice(n, 2, replace=False)
                gt_rels[i, k] = (s, o, rng.randint(1, npred))
            gt_rel_mask[i, :nr] = True
        out.append(dict(images=images, im_hw=im_hw, gt_boxes=gt_boxes,
                        gt_classes=gt_classes, gt_mask=gt_mask,
                        gt_rels=gt_rels, gt_rel_mask=gt_rel_mask))
    return out


def structured_batches(batch: int, n_batches: int, fg_classes: int = 12):
    """LEARNABLE batches at full VG label-space scale (151/51 taxonomy,
    classes keyed to colors, predicates to geometry — data/synthetic.py
    StructuredSyntheticVG). Training on these gives the audited decisions
    real margins AND nonzero absolute recall, so the R@K-delta legs carry
    statistical power (VERDICT r3 Weak #1: on unlearnable data every leg's
    recall was 0.0 and 'delta = 0' was vacuous)."""
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.synthetic import (StructuredSyntheticVG,
                                                  structured_batch_dicts)

    ds = StructuredSyntheticVG(
        num_images=batch * n_batches, mode="train", seed=17,
        num_classes=C.VG_NUM_CLASSES, num_predicates=C.VG_NUM_PREDICATES,
        num_fg_classes=fg_classes)
    budgets = C.PadBudgets()
    out = []
    for s in range(0, batch * n_batches, batch):
        b = structured_batch_dicts(ds, range(s, s + batch), budgets)
        b["images"] = b["images"].astype(np.float32)  # audit jits f32 images
        out.append(b)
    return out


def topk_triplet_set(pred, i: int, k: int):
    """The set evaluate_recall consumes: first-k valid (sub, obj, argmax
    predicate) triplets in sorted order."""
    ri = np.asarray(pred.rel_inds)[i]
    rs = np.asarray(pred.rel_scores)[i]
    rv = np.asarray(pred.rel_valid)[i]
    keep = np.nonzero(rv)[0][:k]
    return {(int(ri[j, 0]), int(ri[j, 1]), int(rs[j, 1:].argmax() + 1))
            for j in keep}


def eval_recall(pred, batches_np, mode: str, data_like):
    """Run the real evaluator on a list of per-batch SGPredictions."""
    from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
    from neural_motifs_tpu.models.rel_model import prediction_to_entries
    from neural_motifs_tpu import config as C

    ev = BasicSceneGraphEvaluator(mode)
    s = C.BOX_SCALE / C.IM_SCALE
    for pred_np, b in zip(pred, batches_np):
        for i, entry in enumerate(prediction_to_entries(pred_np)):
            m, rm = b["gt_mask"][i], b["gt_rel_mask"][i]
            gt = {"gt_classes": b["gt_classes"][i][m],
                  "gt_relations": b["gt_rels"][i][rm],
                  "gt_boxes": b["gt_boxes"][i][m] * s}
            ev.evaluate_scene_graph_entry(gt, entry)
    return {k: float(100 * np.mean(v))
            for k, v in ev.result_dict[mode + "_recall"].items()}


def init_variables(batches):
    """One f32 parameter tree for every audit config: init through the sgdet
    model (its tree is the superset — gtbox modes never touch the RPN head,
    so their own init would lack it; flax apply ignores extra subtrees)."""
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C

    budgets = C.PadBudgets(max_pairs_eval=4096)
    model = build_model("sgdet", jnp.float32, budgets)
    init_kw = {k: jnp.asarray(batches[0][k]) for k in batches[0]}
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    t0 = time.time()
    variables = jax.jit(lambda r: model.init(r, train=True, **init_kw))(rngs)
    print(f"# init {time.time() - t0:.1f}s", flush=True)
    return variables["params"], variables.get("batch_stats", {})


def pretrain_detector(params, batch_stats, batches, steps: int):
    """Detector pretraining (RPN + RoI heads, mode=rpntrain) on the synth
    batches so the sgdet audit's NMS/decode operate on peaked class scores
    instead of a random head's near-uniform ones (which amplify any rounding
    into total rank churn and say nothing about serving risk). The RelModel
    'detector' param subtree IS the standalone ObjectDetector tree, so the
    trained leaves graft straight back."""
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.models.detector import ObjectDetector
    from neural_motifs_tpu.training.losses import detector_losses
    from neural_motifs_tpu.training.train_state import (TrainState,
                                                        make_optimizer,
                                                        make_train_step)

    det = ObjectDetector(num_classes=C.VG_NUM_CLASSES, mode="rpntrain",
                         thresh=0.0, max_per_img=64, dtype=jnp.bfloat16,
                         obj_dim=4096, budgets=C.PadBudgets())
    tx = make_optimizer(5e-3, l2=0.0, clip=5.0)
    dparams = dict(params)["detector"]
    dstats = dict(batch_stats).get("detector", {}) if batch_stats else {}
    # gtbox class-CE trunk warmup first: from a random trunk the joint
    # rpntrain loss has a sticky predict-background minimum (see
    # tools/train_synth.py trunk_warmup) and the class head would stay at
    # chance, zeroing every sgdet recall leg
    feed_keys = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_mask")
    warm_b = [{k: jnp.asarray(b[k]) for k in feed_keys} for b in batches]
    from tools.train_synth import trunk_warmup
    dparams = trunk_warmup(det, dparams, dstats, warm_b,
                           max(200, steps // 2), 1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=dparams,
                       batch_stats=dstats, opt_state=tx.init(dparams),
                       tx=tx, apply_fn=det.apply)
    step = make_train_step(detector_losses, lambda b: b, donate=False)
    feed_keys = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_mask")
    dev_batches = [{k: jnp.asarray(b[k]) for k in feed_keys} for b in batches]
    key = jax.random.PRNGKey(13)
    t0 = time.time()
    for i in range(steps):
        state, m = step(state, dev_batches[i % len(dev_batches)], key)
        if i % 50 == 0 or i == steps - 1:
            print(f"# det pretrain step {i}: total={float(m['total']):.4f}",
                  flush=True)
    print(f"# det pretrain {steps} steps in {time.time() - t0:.1f}s",
          flush=True)
    params = dict(params)
    params["detector"] = state.params
    if jax.tree_util.tree_leaves(state.batch_stats):
        batch_stats = dict(batch_stats)
        batch_stats["detector"] = state.batch_stats
    return params, batch_stats


def pretrain(params, batch_stats, batches, steps: int):
    """Full-scale sgcls training on the synthetic batches so the audited
    decisions carry REAL margins (random weights leave every logit near-tied
    — the worst case, reported by --train-steps 0). bf16 compute, matching
    how the deployed model trains; params stay f32 throughout."""
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.training.losses import rel_losses
    from neural_motifs_tpu.training.train_state import (TrainState,
                                                        make_optimizer,
                                                        make_train_step)

    budgets = C.PadBudgets(max_pairs_eval=4096)
    model = build_model("sgcls", jnp.bfloat16, budgets)
    # warmup+cosine decay: constant-lr Adam destabilizes late once decoder
    # commits sharpen (same failure observed in tools/train_synth.py)
    import optax
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(50, steps // 4), steps, end_value=2e-5)
    tx = make_optimizer(sched, l2=0.0, clip=5.0, fc_lr_factor=None,
                        freeze_detector=True, adam=True)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       tx=tx, apply_fn=model.apply)
    step = make_train_step(rel_losses, lambda b: b, donate=False)
    key = jax.random.PRNGKey(11)
    t0 = time.time()
    dev_batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    for i in range(steps):
        state, m = step(state, dev_batches[i % len(dev_batches)], key)
        if i % 50 == 0 or i == steps - 1:
            print(f"# pretrain step {i}: total={float(m['total']):.4f}",
                  flush=True)
    print(f"# pretrain {steps} steps in {time.time() - t0:.1f}s", flush=True)
    # exact BN recalibration: after a short pretrain the momentum-0.999
    # running stats (pos_bn, union-mask conv BNs) are stale and the eval
    # forward would diverge from the train forward for a reason unrelated
    # to the dtype under audit
    from neural_motifs_tpu.training.calibrate import calibrate_batch_stats
    bstats = calibrate_batch_stats(
        model.apply, state.params, state.batch_stats, dev_batches,
        rngs=lambda i: {"sample": jax.random.PRNGKey(300 + i),
                        "dropout": jax.random.PRNGKey(400 + i)})
    return state.params, bstats


def audit_mode(mode: str, batches, params, batch_stats,
               include_int8: bool = False,
               require_overlap: bool = True,
               chaos_seeds: int = 1) -> dict:
    import os

    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu import config as C

    budgets = C.PadBudgets(max_pairs_eval=4096)   # exact: every pair scored
    m_bf16 = build_model(mode, jnp.bfloat16, budgets, require_overlap)
    m_f32 = build_model(mode, jnp.float32, budgets, require_overlap)

    # gtbox modes consume GT boxes/classes at eval; sgdet consumes only the
    # raw image
    feed_keys = ("images", "im_hw") + (
        ("gt_boxes", "gt_classes", "gt_mask") if mode != "sgdet" else ())

    # two DISTINCT jitted callables (shared-cache poisoning gotcha)
    def fwd_bf16(p, bs, kw):
        return m_bf16.apply({"params": p, "batch_stats": bs}, train=False,
                            rngs={"sample": jax.random.PRNGKey(0)}, **kw)

    def fwd_f32(p, bs, kw):
        return m_f32.apply({"params": p, "batch_stats": bs}, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)}, **kw)

    j_bf16, j_f32 = jax.jit(fwd_bf16), jax.jit(fwd_f32)

    # optional int8 leg: same bf16 model, but the QuantDense towers take the
    # dynamic-int8 matmul path. NM_QUANT is read at TRACE time
    # (ops/quant.py quant_mode), so the env is set around every int8 call —
    # the other callables are separate jit instances traced with it unset.
    def fwd_int8(p, bs, kw):
        return m_bf16.apply({"params": p, "batch_stats": bs}, train=False,
                            rngs={"sample": jax.random.PRNGKey(0)}, **kw)

    j_int8 = jax.jit(fwd_int8)

    def call_int8(p, bs, kw):
        old = os.environ.get("NM_QUANT")
        os.environ["NM_QUANT"] = "int8"
        try:
            return j_int8(p, bs, kw)
        finally:
            if old is None:
                os.environ.pop("NM_QUANT", None)
            else:
                os.environ["NM_QUANT"] = old

    # three legs: bf16, f32, and the CHAOS CONTROL — the same f32 graph fed
    # images perturbed by zero-mean noise at bf16-ulp relative scale (2^-8).
    # If f32-vs-control diverges as much as bf16-vs-f32, the divergence is
    # sensitivity of the pipeline on this input distribution (any epsilon
    # anywhere flips near-tied discrete decisions), NOT a bf16-specific
    # defect a dtype pin could remove.
    prng = np.random.RandomState(99)
    preds = {"bf16": [], "f32": [], "f32_perturbed": []}
    if include_int8:
        preds["int8"] = []
    for bi, b in enumerate(batches):
        kw = {k: jnp.asarray(b[k]) for k in feed_keys}
        kw_p = dict(kw)
        noise = prng.randn(*b["images"].shape).astype(np.float32)
        kw_p["images"] = jnp.asarray(
            b["images"] * (1.0 + (2.0 ** -8) * noise))
        legs = [("bf16", j_bf16, kw), ("f32", j_f32, kw),
                ("f32_perturbed", j_f32, kw_p)]
        if include_int8:
            legs.append(("int8", call_int8, kw))
        for name, fn, k in legs:
            t0 = time.time()
            out = jax.device_get(fn(params, batch_stats, k))
            preds[name].append(out)
            print(f"# [{mode}] batch {bi} {name}: {time.time() - t0:.1f}s",
                  flush=True)

    def divergence(pa, pb_list):
        """Discrete-divergence metrics between two pred lists."""
        n_img = keep_flips = keep_slots = commit_flips = commit_slots = 0
        box_maxdiff = score_maxdiff = 0.0
        topk_jaccard = {20: [], 50: [], 100: []}
        for pb, pf in zip(pa, pb_list):
            bsz = np.asarray(pb.obj_valid).shape[0]
            n_img += bsz
            vb = np.asarray(pb.obj_valid)
            vf = np.asarray(pf.obj_valid)
            keep_flips += int((vb != vf).sum())
            keep_slots += int(vb.size)
            common = vb & vf
            cb = np.asarray(pb.obj_classes)
            cf = np.asarray(pf.obj_classes)
            commit_flips += int(((cb != cf) & common).sum())
            commit_slots += int(common.sum())
            box_maxdiff = max(box_maxdiff, float(np.max(np.abs(
                np.asarray(pb.boxes) - np.asarray(pf.boxes))
                * common[..., None])))
            score_maxdiff = max(score_maxdiff, float(np.max(np.abs(
                np.asarray(pb.obj_scores) - np.asarray(pf.obj_scores))
                * common)))
            for i in range(bsz):
                for k in topk_jaccard:
                    a = topk_triplet_set(pb, i, k)
                    c = topk_triplet_set(pf, i, k)
                    u = len(a | c)
                    topk_jaccard[k].append(len(a & c) / u if u else 1.0)
        return {
            "images": n_img,
            "nms_keep_flip_rate": keep_flips / max(keep_slots, 1),
            "nms_keep_flips": keep_flips,
            "decoder_commit_flip_rate": commit_flips / max(commit_slots, 1),
            "decoder_commit_flips": commit_flips,
            "common_valid_slots": commit_slots,
            "box_max_abs_diff": box_maxdiff,
            "obj_score_max_abs_diff": score_maxdiff,
            "topk_triplet_jaccard_mean": {
                k: float(np.mean(v)) for k, v in topk_jaccard.items()},
            "topk_triplet_jaccard_min": {
                k: float(np.min(v)) for k, v in topk_jaccard.items()},
        }

    recalls = {name: eval_recall(p, batches, mode, None)
               for name, p in preds.items()}
    r_bf16, r_f32 = recalls["bf16"], recalls["f32"]

    # chaos envelope as a DISTRIBUTION: re-run the perturbed-f32 leg with
    # `chaos_seeds` independent noise draws and record each seed's R@K
    # delta vs clean f32. "bf16 is inside the envelope" then means its
    # delta lies within the min..max of f32-vs-itself noise, not within a
    # single lucky draw.
    chaos_deltas = {k: [] for k in r_f32}
    for s in range(chaos_seeds):
        if s == 0 and preds.get("f32_perturbed"):
            r_p = recalls["f32_perturbed"]
        else:
            seed_preds = []
            srng = np.random.RandomState(1000 + s)
            for b in batches:
                kw_s = {k: jnp.asarray(b[k]) for k in feed_keys}
                noise = srng.randn(*b["images"].shape).astype(np.float32)
                kw_s["images"] = jnp.asarray(
                    b["images"] * (1.0 + (2.0 ** -8) * noise))
                seed_preds.append(jax.device_get(
                    j_f32(params, batch_stats, kw_s)))
            r_p = eval_recall(seed_preds, batches, mode, None)
        for k in chaos_deltas:
            chaos_deltas[k].append(round(r_p[k] - r_f32[k], 4))

    out = {
        "mode": mode,
        "bf16_vs_f32": divergence(preds["bf16"], preds["f32"]),
        "chaos_control_f32_vs_f32perturbed": divergence(
            preds["f32"], preds["f32_perturbed"]),
        "recalls": recalls,
        "recall_delta_pts": {k: round(r_bf16[k] - r_f32[k], 4)
                             for k in r_bf16},
        "chaos_recall_delta_pts_per_seed": chaos_deltas,
        "bf16_delta_inside_chaos_envelope": {
            k: bool(min(v) - 0.5 <= round(r_bf16[k] - r_f32[k], 4)
                    <= max(v) + 0.5)
            for k, v in chaos_deltas.items()},
    }
    if include_int8:
        out["int8_vs_bf16"] = divergence(preds["int8"], preds["bf16"])
        out["int8_recall_delta_pts"] = {
            k: round(recalls["int8"][k] - r_bf16[k], 4) for k in r_bf16}
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-batches", type=int, default=2)
    p.add_argument("--det-steps", type=int, default=300,
                   help="detector pretraining steps (RPN + RoI heads) so "
                        "sgdet NMS/decode see peaked scores; 0 = random "
                        "detector (near-tied worst case)")
    p.add_argument("--train-steps", type=int, default=400,
                   help="full-scale sgcls pretraining steps on the synth "
                        "batches so decisions carry real margins; 0 = audit "
                        "raw random weights (near-tied worst case)")
    p.add_argument("--modes", default="sgcls,sgdet")
    p.add_argument("--int8", action="store_true",
                   help="also audit the NM_QUANT=int8 serving path against "
                        "bf16 (same pretrained params, same inputs)")
    p.add_argument("--data", default="structured",
                   choices=("structured", "random"),
                   help="structured = learnable scenes (nonzero recall -> "
                        "powered R@K deltas); random = unlearnable VG-stats "
                        "noise (near-tie worst case for flip rates)")
    p.add_argument("--fg-classes", type=int, default=12,
                   help="structured data: number of distinct color classes")
    p.add_argument("--chaos-seeds", type=int, default=1,
                   help="independent perturbation draws for the chaos "
                        "envelope (per-seed R@K deltas recorded; >1 makes "
                        "'bf16 inside the envelope' a distributional claim)")
    p.add_argument("--out", default=str(REPO / "PRECISION_AUDIT.json"))
    args = p.parse_args(argv)

    import os

    # A pre-exported NM_QUANT would make the bf16/f32/chaos legs trace
    # through the int8 matmul path (quant_mode() is read at trace time) and
    # write a false-clean audit; only the explicit int8 leg may set it.
    os.environ.pop("NM_QUANT", None)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    batches = (structured_batches(args.batch, args.n_batches, args.fg_classes)
               if args.data == "structured"
               else synth_batches(args.batch, args.n_batches))
    params, batch_stats = init_variables(batches)
    if args.det_steps:
        params, batch_stats = pretrain_detector(params, batch_stats, batches,
                                                args.det_steps)
    if args.train_steps:
        params, batch_stats = pretrain(params, batch_stats, batches,
                                       args.train_steps)
    results = []
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        print(f"=== auditing {mode} ===", flush=True)
        results.append(audit_mode(mode, batches, params, batch_stats,
                                  include_int8=args.int8,
                                  require_overlap=args.data != "structured",
                                  chaos_seeds=args.chaos_seeds))
        print(json.dumps(results[-1], indent=1), flush=True)

    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "when": time.strftime("%Y-%m-%d %H:%M:%S"),
        "data": args.data,
        "train_steps": args.train_steps,
        "det_steps": args.det_steps,
        "protocol": "one f32 param set (detector rpntrain-pretrained, then "
                    "sgcls rel-pretrained on the synth batches; 0 steps = "
                    "random weights = conservative near-tie case); eval "
                    "graph run with compute dtype bf16 vs f32 on the same "
                    "device+inputs; discrete flip rates + real-evaluator "
                    "R@K delta",
        "modes": results,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
