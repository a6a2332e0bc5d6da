"""End-to-end smoke tests for the detector and relation models on tiny
shapes (64x64 images, small budgets) — exercises the full padded pipeline:
RPN -> NMS -> sampling -> context LSTMs -> decoder -> union features ->
rel head -> triplet decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.rel_model import RelModel, SGPrediction, RelOutput
from neural_motifs_tpu.models.rel_model_stanford import RelModelStanford
from neural_motifs_tpu.training.losses import rel_losses

TINY = C.PadBudgets(max_gt_boxes=8, max_gt_rels=8, rois_per_img=16,
                    objs_per_img=8, rels_per_img=16, rels_per_img_refine=8,
                    max_pairs_eval=56, rpn_pre_nms_topn_train=64,
                    rpn_post_nms_topn_train=32, rpn_pre_nms_topn_test=64,
                    rpn_post_nms_topn_test=16)

NC, NP = 16, 8
B, IM = 2, 64


def tiny_batch(rng, with_rels=True):
    g, r = TINY.max_gt_boxes, TINY.max_gt_rels
    images = rng.randn(B, IM, IM, 3).astype(np.float32) * 0.1
    im_hw = np.full((B, 2), float(IM), np.float32)
    gt_boxes = np.zeros((B, g, 4), np.float32)
    gt_classes = np.zeros((B, g), np.int32)
    gt_mask = np.zeros((B, g), bool)
    gt_rels = np.zeros((B, r, 3), np.int32)
    gt_rel_mask = np.zeros((B, r), bool)
    for b in range(B):
        n = 5
        xy = rng.uniform(0, IM * 0.5, (n, 2))
        wh = rng.uniform(8, IM * 0.45, (n, 2))
        gt_boxes[b, :n] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        gt_classes[b, :n] = rng.randint(1, NC, n)
        gt_mask[b, :n] = True
        nr = 3
        sub = rng.randint(0, n, nr)
        obj = (sub + rng.randint(1, n, nr)) % n
        gt_rels[b, :nr] = np.stack([sub, obj, rng.randint(1, NP, nr)], 1)
        gt_rel_mask[b, :nr] = True
    return dict(images=jnp.asarray(images), im_hw=jnp.asarray(im_hw),
                gt_boxes=jnp.asarray(gt_boxes), gt_classes=jnp.asarray(gt_classes),
                gt_mask=jnp.asarray(gt_mask), gt_rels=jnp.asarray(gt_rels),
                gt_rel_mask=jnp.asarray(gt_rel_mask))


def make_model(mode, model_cls=RelModel, **kw):
    defaults = dict(num_classes=NC, num_rels=NP, mode=mode, budgets=TINY,
                    dtype=jnp.float32, thresh=0.0)
    if model_cls is RelModel:
        defaults.update(hidden_dim=16, pooling_dim=64, obj_dim=64,
                        embed_dim=8, nl_obj=1, nl_edge=1, use_bias=True,
                        use_tanh=True, limit_vision=False,
                        embed_vecs=np.random.RandomState(0).randn(NC, 8).astype(np.float32),
                        decoder_embed_vecs=np.random.RandomState(1).randn(NC + 1, 100).astype(np.float32),
                        freq_table=np.random.RandomState(2).randn(NC * NC, NP).astype(np.float32))
    else:
        defaults.update(obj_dim=64)
    defaults.update(kw)
    return model_cls(**defaults)


RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_rel_model_gtbox_train(rng, mode):
    model = make_model(mode)
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    out, _ = model.apply(variables, train=True, rngs=RNGS,
                         mutable=["batch_stats"], **batch)
    assert isinstance(out, RelOutput)
    assert out.rel_dists.shape == (B, TINY.rels_per_img, NP)
    assert out.obj_dists.shape == (B, TINY.max_gt_boxes, NC)
    losses = rel_losses(out)
    assert np.isfinite(float(losses["total"]))
    # fg rel labels survived into the sample
    labels = np.asarray(out.rel_labels)
    valid = np.asarray(out.rel_valid)
    assert valid.any()
    assert (labels[valid] > 0).any()


def test_rel_model_predcls_eval(rng):
    model = make_model("predcls")
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    assert isinstance(pred, SGPrediction)
    o = TINY.max_gt_boxes
    assert pred.boxes.shape == (B, o, 4)
    rv = np.asarray(pred.rel_valid)
    ri = np.asarray(pred.rel_inds)
    ov = np.asarray(pred.obj_valid)
    assert rv.any()
    # valid rels connect valid objects, no self-loops
    for b in range(B):
        assert np.all(ov[b][ri[b][rv[b], 0]])
        assert np.all(ov[b][ri[b][rv[b], 1]])
        assert np.all(ri[b][rv[b], 0] != ri[b][rv[b], 1])
    # predcls commits GT classes
    np.testing.assert_array_equal(
        np.asarray(pred.obj_classes)[ov], np.asarray(batch["gt_classes"])[ov])
    # triplet scores are sorted descending among valid
    probs = np.asarray(pred.rel_scores)
    scores = probs[..., 1:].max(-1)
    oscore = np.asarray(pred.obj_scores)
    for b in range(B):
        t = scores[b] * oscore[b][ri[b, :, 0]] * oscore[b][ri[b, :, 1]]
        t = t[rv[b]]
        assert np.all(np.diff(t) <= 1e-5)


def test_rel_model_sgdet_eval(rng):
    model = make_model("sgdet")
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    assert isinstance(pred, SGPrediction)
    assert pred.boxes.shape == (B, TINY.objs_per_img, 4)
    # boxes within image
    bx = np.asarray(pred.boxes)[np.asarray(pred.obj_valid)]
    assert bx.size == 0 or (bx.min() >= 0 and bx.max() <= IM - 1)


def test_rel_model_sgdet_train(rng):
    model = make_model("sgdet")
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    out, _ = model.apply(variables, train=True, rngs=RNGS,
                         mutable=["batch_stats"], **batch)
    assert out.rel_dists.shape == (B, TINY.rels_per_img_refine, NP)
    losses = rel_losses(out)
    assert np.isfinite(float(losses["total"]))


def test_stanford_train_and_eval(rng):
    model = make_model("sgcls", model_cls=RelModelStanford)
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    out, _ = model.apply(variables, train=True, rngs=RNGS,
                         mutable=["batch_stats"], **batch)
    losses = rel_losses(out)
    assert np.isfinite(float(losses["total"]))
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    assert isinstance(pred, SGPrediction)


def test_rel_model_baseline_no_context(rng):
    """nl_obj=0, nl_edge=0: the 'baseline' ablation uses decoder_lin +
    post_emb class-embedding edge reps (rel_model.py:386-388, 259-284)."""
    model = make_model("sgcls", nl_obj=0, nl_edge=0)
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    out, _ = model.apply(variables, train=True, rngs=RNGS,
                         mutable=["batch_stats"], **batch)
    losses = rel_losses(out)
    assert np.isfinite(float(losses["total"]))
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    assert isinstance(pred, SGPrediction)


def test_detector_proposals_mode(rng):
    """'proposals' box source: precomputed proposals -> NMS -> heads."""
    from neural_motifs_tpu.models.detector import ObjectDetector
    import jax.numpy as jnp

    det = ObjectDetector(num_classes=NC, mode="proposals", budgets=TINY,
                         dtype=jnp.float32, thresh=0.0, max_per_img=8)
    batch = tiny_batch(rng)
    P = 32
    props = np.zeros((B, P, 5), np.float32)
    pmask = np.zeros((B, P), bool)
    for b in range(B):
        props[b, :20, 0] = rng.uniform(0.1, 1, 20)
        xy = rng.uniform(0, IM * 0.6, (20, 2))
        wh = rng.uniform(6, IM * 0.4, (20, 2))
        props[b, :20, 1:] = np.concatenate([xy, np.minimum(xy + wh, IM - 1)], 1)
        pmask[b, :20] = True
    variables = det.init(RNGS, images=batch["images"], im_hw=batch["im_hw"],
                         proposals=jnp.asarray(props),
                         proposal_mask=jnp.asarray(pmask), train=False)
    out = det.apply(variables, images=batch["images"], im_hw=batch["im_hw"],
                    proposals=jnp.asarray(props),
                    proposal_mask=jnp.asarray(pmask), train=False)
    assert out.rm_boxes.shape == (B, 8, 4)
    assert out.boxes_all.shape == (B, 8, NC, 4)


def test_resnet_backbone_path(rng):
    """Deprecated ResNet-101-C4 alternative backbone (use_resnet)."""
    model = make_model("sgcls", use_resnet=True, obj_dim=2048,
                       pooling_dim=2048)
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    out, _ = model.apply(variables, train=True, rngs=RNGS,
                         mutable=["batch_stats"], **batch)
    losses = rel_losses(out)
    assert np.isfinite(float(losses["total"]))


def test_predcls_end_to_end_recall_with_stuffed_bias(rng):
    """Full-system integration: make the predicate deterministic in the GT
    (p = f(cls_s, cls_o)) and stuff the frequency-bias table to dominate the
    rel logits. The decoded SGPrediction fed through prediction_to_entries
    and the evaluator must then score ~perfect predcls R@100 — exercising
    pair enumeration, bias lookup, triplet sort, entry conversion, and the
    evaluator end to end."""
    from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator
    from neural_motifs_tpu.models.rel_model import prediction_to_entries

    # deterministic predicate from the class pair
    def pred_of(cs, co):
        return (cs + co) % (NP - 1) + 1

    table = np.full((NC * NC, NP), -20.0, np.float32)
    for cs in range(NC):
        for co in range(NC):
            table[cs * NC + co, pred_of(cs, co)] = 20.0

    model = make_model("predcls", freq_table=table, use_tanh=True)
    batch = tiny_batch(rng)
    # rewrite GT predicates to follow the rule
    gt_rels = np.asarray(batch["gt_rels"]).copy()
    gt_classes = np.asarray(batch["gt_classes"])
    for b in range(B):
        for k in range(gt_rels.shape[1]):
            s, o, _ = gt_rels[b, k]
            gt_rels[b, k, 2] = pred_of(gt_classes[b, s], gt_classes[b, o])
    batch["gt_rels"] = jnp.asarray(gt_rels)

    variables = model.init(RNGS, train=True, **batch)
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    entries = prediction_to_entries(jax.device_get(pred))

    ev = BasicSceneGraphEvaluator("predcls")
    gt_mask = np.asarray(batch["gt_mask"])
    rel_mask = np.asarray(batch["gt_rel_mask"])
    for b in range(B):
        n = int(gt_mask[b].sum())
        gt = {"gt_classes": gt_classes[b, :n],
              "gt_boxes": np.asarray(batch["gt_boxes"])[b, :n] * C.BOX_SCALE / C.IM_SCALE,
              "gt_relations": gt_rels[b][rel_mask[b]]}
        ev.evaluate_scene_graph_entry(gt, entries[b])
    r100 = ev.mean_recall(100)
    assert r100 > 0.99, f"stuffed-bias predcls R@100 = {r100}"


def test_union_chunk_scan_matches_direct(rng):
    """Multi-chunk eval routes the pair tower through nn.scan (one tower in
    the HLO, VERDICT r2 #3); its outputs must be bitwise-equal to the
    single-chunk direct path for every mode field the decode emits."""
    model_big = make_model("sgcls", union_chunk=512)    # 56 pairs, 1 chunk
    model_scan = make_model("sgcls", union_chunk=16)    # 4 chunks via scan
    batch = tiny_batch(rng)
    variables = model_big.init(RNGS, train=True, **batch)
    kw = dict(train=False, rngs={"sample": jax.random.PRNGKey(0)})
    p_big = model_big.apply(variables, **kw, **batch)
    p_scan = model_scan.apply(variables, **kw, **batch)
    np.testing.assert_array_equal(np.asarray(p_big.obj_classes),
                                  np.asarray(p_scan.obj_classes))
    np.testing.assert_array_equal(np.asarray(p_big.num_valid_pairs),
                                  np.asarray(p_scan.num_valid_pairs))
    np.testing.assert_allclose(np.asarray(p_big.obj_scores),
                               np.asarray(p_scan.obj_scores), rtol=1e-5)
    # rel comparisons keyed by pair: XLA fuses the two shapes differently
    # (~1e-7 float jitter), which can permute near-tied triplet sort order
    for b in range(B):
        def pairmap(p):
            ri = np.asarray(p.rel_inds)[b]
            rs = np.asarray(p.rel_scores)[b]
            rv = np.asarray(p.rel_valid)[b]
            return {(int(s), int(o)): rs[k]
                    for k, (s, o) in enumerate(ri) if rv[k]}
        m_big, m_scan = pairmap(p_big), pairmap(p_scan)
        assert set(m_big) == set(m_scan)
        for so in m_big:
            np.testing.assert_allclose(m_big[so], m_scan[so],
                                       rtol=1e-4, atol=1e-6, err_msg=f"{so}")

    # stanford takes the same helper
    st_batch = tiny_batch(rng)
    st = make_model("sgcls", model_cls=RelModelStanford)
    st_vars = st.init(RNGS, train=True, **st_batch)
    q = st.apply(st_vars, **kw, **st_batch)
    assert isinstance(q, SGPrediction)


def test_eval_pair_compaction_exact_when_budget_suffices(rng):
    """max_pairs_eval < all-pairs: the compacted pair set must contain
    exactly the valid pairs (order-insensitive) when #valid <= budget."""
    import dataclasses
    budgets = dataclasses.replace(TINY, max_pairs_eval=30)
    model = make_model("predcls", budgets=budgets)
    batch = tiny_batch(rng)  # 5 valid objects -> 20 valid pairs <= 30
    variables = model.init(RNGS, train=True, **batch)
    pred = model.apply(variables, train=False, rngs=RNGS, **batch)
    rv = np.asarray(pred.rel_valid)
    ri = np.asarray(pred.rel_inds)
    gm = np.asarray(batch["gt_mask"])
    for b in range(B):
        n = int(gm[b].sum())
        got = {(int(s), int(o)) for (s, o) in ri[b][rv[b]]}
        exp = {(i, j) for i in range(n) for j in range(n) if i != j}
        assert got == exp


def test_stanford_pair_compaction_matches_exact(rng):
    """Stanford message passing over the compacted pair set must equal the
    full-pair run when every valid pair fits the budget (invalid pairs are
    gate-masked, so dropping them only shrinks the scatter-add)."""
    import dataclasses
    batch = tiny_batch(rng)  # 5 valid objects -> 20 valid pairs
    full = make_model("sgcls", model_cls=RelModelStanford,
                      budgets=dataclasses.replace(TINY, max_pairs_eval=56))
    comp = make_model("sgcls", model_cls=RelModelStanford,
                      budgets=dataclasses.replace(TINY, max_pairs_eval=24))
    variables = full.init(RNGS, train=True, **batch)
    kw = dict(train=False, rngs={"sample": jax.random.PRNGKey(0)})
    p_full = full.apply(variables, **kw, **batch)
    p_comp = comp.apply(variables, **kw, **batch)
    np.testing.assert_array_equal(np.asarray(p_full.obj_classes),
                                  np.asarray(p_comp.obj_classes))
    for b in range(B):
        def pairmap(p):
            ri = np.asarray(p.rel_inds)[b]
            rs = np.asarray(p.rel_scores)[b]
            rv = np.asarray(p.rel_valid)[b]
            return {(int(s), int(o)): rs[k]
                    for k, (s, o) in enumerate(ri) if rv[k]}
        m_full, m_comp = pairmap(p_full), pairmap(p_comp)
        assert set(m_full) == set(m_comp) and m_full, "pair sets differ"
        for so in m_full:
            np.testing.assert_allclose(m_full[so], m_comp[so],
                                       rtol=1e-4, atol=1e-6, err_msg=f"{so}")


@pytest.mark.fast
def test_stanford_frozen_detector_gradient_boundary(rng):
    """Stanford counterpart of the MotifNet grad-parity boundary check
    (train_rels.py:51-52): one value_and_grad step must put EXACTLY zero
    gradient into the detector subtree and nonzero gradient into the
    message-passing leaves (the MotifNet side is oracle-checked in
    test_grad_parity.py; Stanford's forward has its own e2e parity, this
    pins its training boundary)."""
    from flax.traverse_util import flatten_dict

    model = make_model("sgcls", model_cls=RelModelStanford)
    batch = tiny_batch(rng)
    variables = model.init(RNGS, train=True, **batch)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": bstats},
                             train=True, rngs=RNGS,
                             mutable=["batch_stats"], **batch)
        return rel_losses(out)["total"]

    grads = jax.grad(loss_fn)(params)
    flat = flatten_dict(grads, sep="/")
    det = [k for k in flat if k.startswith("detector/")]
    assert det, "no detector leaves"
    for k in det:
        assert np.all(np.asarray(flat[k]) == 0.0), f"grad leaked into {k}"
    live = [k for k in flat if not k.startswith("detector/")]
    nonzero = [k for k in live if np.abs(np.asarray(flat[k])).max() > 0]
    # the GRU + message-passing + output heads must all carry gradient
    assert len(nonzero) >= len(live) * 0.6, \
        f"too few live grads: {len(nonzero)}/{len(live)}"
