"""Forward parity against the reference semantics (VERDICT r1 item 1).

Fabricates reference-layout state dicts (torch [out,in] linears, flat-packed
LSTM vectors, BN running stats), pushes them through the real importer
(training/checkpoint.py) into our padded flax modules, and compares against
the independent numpy transcription in tests/torch_reference.py on the same
inputs. Any deviation in layout transforms, gate math, ordering, teacher
forcing, BN handling, or the edge heads fails these tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_motifs_tpu.models.context import DecoderRNN, LinearizedContext
from neural_motifs_tpu.training.checkpoint import import_reference_rel_model

from tests import torch_reference as ref

NC = 12
OBJ_DIM = 48
EMBED_DIM = 16
HID = 24
NL_OBJ = 2
NL_EDGE = 2
O_PAD = 8


def lstm_flat_sizes(d_in, h, layers):
    n = 0
    for l in range(layers):
        di = d_in if l == 0 else h
        n += di * 6 * h + h * 5 * h
    return n, layers * 5 * h


def fabricate_ctx_sd(rng, *, pass_dec=False, pass_edge=False):
    """Reference-layout state dict for the context + rel heads at small
    dims (same key names as a vgrel checkpoint)."""
    sd = {}

    def lin(name, o, i):
        sd[f"{name}.weight"] = (rng.randn(o, i) * 0.3).astype(np.float32)
        sd[f"{name}.bias"] = (rng.randn(o) * 0.1).astype(np.float32)

    sd["context.obj_embed.weight"] = rng.randn(NC, EMBED_DIM).astype(np.float32)
    sd["context.obj_embed2.weight"] = rng.randn(NC, EMBED_DIM).astype(np.float32)
    sd["context.pos_embed.0.weight"] = (1 + 0.2 * rng.randn(4)).astype(np.float32)
    sd["context.pos_embed.0.bias"] = (0.1 * rng.randn(4)).astype(np.float32)
    sd["context.pos_embed.0.running_mean"] = (rng.randn(4) * 80).astype(np.float32)
    sd["context.pos_embed.0.running_var"] = (np.abs(rng.randn(4)) * 40 + 1).astype(np.float32)
    lin("context.pos_embed.1", 128, 4)

    d_in_obj = OBJ_DIM + EMBED_DIM + 128
    nw, nb = lstm_flat_sizes(d_in_obj, HID, NL_OBJ)
    sd["context.obj_ctx_rnn.weight"] = (rng.randn(nw) * 0.2).astype(np.float32)
    sd["context.obj_ctx_rnn.bias"] = (rng.randn(nb) * 0.1).astype(np.float32)

    dec_in = HID + ((OBJ_DIM + EMBED_DIM) if pass_dec else 0)
    sd["context.decoder_rnn.obj_embed.weight"] = rng.randn(NC + 1, 100).astype(np.float32)
    lin("context.decoder_rnn.input_linearity", 6 * HID, dec_in + 100)
    lin("context.decoder_rnn.state_linearity", 5 * HID, HID)
    lin("context.decoder_rnn.out", NC, HID)

    e_in = EMBED_DIM + HID + (OBJ_DIM if pass_edge else 0)
    nw, nb = lstm_flat_sizes(e_in, HID, NL_EDGE)
    sd["context.edge_ctx_rnn.weight"] = (rng.randn(nw) * 0.2).astype(np.float32)
    sd["context.edge_ctx_rnn.bias"] = (rng.randn(nb) * 0.1).astype(np.float32)
    return sd


def make_inputs(rng, b=2, valid_counts=(5, 3)):
    obj_fmaps = (rng.randn(b, O_PAD, OBJ_DIM) * 0.5).astype(np.float32)
    obj_logits = (rng.randn(b, O_PAD, NC) * 2.0).astype(np.float32)
    xy = rng.uniform(0, 150, (b, O_PAD, 2))
    wh = rng.uniform(10, 80, (b, O_PAD, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    valid = np.zeros((b, O_PAD), bool)
    labels = np.zeros((b, O_PAD), np.int32)
    for i, n in enumerate(valid_counts):
        valid[i, :n] = True
        labels[i, :n] = rng.randint(0, NC, n)  # 0 = bg rows exercise TF fallback
    return obj_fmaps, obj_logits, boxes, valid, labels


def build_ctx(order):
    r = np.random.RandomState(7)
    return LinearizedContext(
        num_classes=NC,
        embed_vecs=r.randn(NC, EMBED_DIM).astype(np.float32),
        decoder_embed_vecs=r.randn(NC + 1, 100).astype(np.float32),
        mode="sgcls", embed_dim=EMBED_DIM, hidden_dim=HID, obj_dim=OBJ_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, dropout_rate=0.0, order=order,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)


def import_ctx_params(sd):
    p, stats = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ_DIM, embed_dim=EMBED_DIM,
        nl_obj=NL_OBJ, nl_edge=NL_EDGE, pooling_dim=64,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False)
    params = jax.tree_util.tree_map(jnp.asarray, p["context"])
    batch_stats = jax.tree_util.tree_map(jnp.asarray, stats["context"])
    return params, batch_stats


@pytest.mark.parametrize("order", ["leftright", "confidence", "size"])
def test_context_sgcls_eval_parity(rng, order):
    sd = fabricate_ctx_sd(rng)
    obj_fmaps, obj_logits, boxes, valid, _ = make_inputs(rng)
    params, batch_stats = import_ctx_params(sd)

    model = build_ctx(order)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(obj_fmaps), jnp.asarray(obj_logits),
                      jnp.asarray(boxes), jnp.asarray(valid), train=False)

    for i in range(valid.shape[0]):
        n = int(valid[i].sum())
        exp_dists, exp_preds, exp_edge = ref.np_context_sgcls(
            sd, obj_fmaps[i, :n], obj_logits[i, :n], boxes[i, :n], None,
            order=order, nl_obj=NL_OBJ, nl_edge=NL_EDGE, hidden_dim=HID,
            obj_dim=OBJ_DIM, embed_dim=EMBED_DIM)
        np.testing.assert_allclose(np.asarray(out.obj_dists)[i, :n],
                                   exp_dists, rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(out.obj_preds)[i, :n],
                                      exp_preds)
        np.testing.assert_allclose(np.asarray(out.edge_ctx)[i, :n],
                                   exp_edge, rtol=2e-4, atol=2e-4)


def test_decoder_teacher_forcing_parity(rng):
    """Train-mode decoder: GT labels committed, bg rows replaced by the
    non-bg argmax (decoder_rnn.py:206-212). dropout=0 so outputs are
    deterministic."""
    sd = fabricate_ctx_sd(rng)
    t_len = 6
    x = (rng.randn(1, t_len, HID) * 0.5).astype(np.float32)
    labels = np.array([[3, 0, 7, 0, 1, 5]], np.int32)
    mask = np.ones((1, t_len), bool)

    dec = DecoderRNN(num_classes=NC, inputs_dim=HID, hidden_dim=HID,
                     embed_vecs=sd["context.decoder_rnn.obj_embed.weight"],
                     dropout=0.0)
    _, ctx_stats = import_ctx_params(sd)
    params, _ = import_ctx_params(sd)
    dparams = params["decoder_rnn"]
    logits, commits = dec.apply({"params": dparams}, jnp.asarray(x),
                                jnp.asarray(mask), labels=jnp.asarray(labels),
                                train=True)

    exp_logits, exp_commits = ref.np_decoder(sd, x[0], labels=labels[0],
                                             training=True)
    np.testing.assert_allclose(np.asarray(logits)[0], exp_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(commits)[0], exp_commits)


def test_pos_embed_eval_uses_running_stats(rng):
    """The imported running stats must drive eval normalization
    (rel_model.py:103-108; VERDICT r1 missing #2)."""
    sd = fabricate_ctx_sd(rng)
    obj_fmaps, obj_logits, boxes, valid, _ = make_inputs(rng)
    params, batch_stats = import_ctx_params(sd)
    model = build_ctx("leftright")

    out1 = model.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(obj_fmaps), jnp.asarray(obj_logits),
                       jnp.asarray(boxes), jnp.asarray(valid), train=False)
    # zeroed running stats must change the output — proves they are used
    zs = jax.tree_util.tree_map(jnp.zeros_like, batch_stats)
    zs = {"pos_bn": {"mean": zs["pos_bn"]["mean"],
                     "var": jnp.ones_like(batch_stats["pos_bn"]["var"])}}
    out2 = model.apply({"params": params, "batch_stats": zs},
                       jnp.asarray(obj_fmaps), jnp.asarray(obj_logits),
                       jnp.asarray(boxes), jnp.asarray(valid), train=False)
    assert not np.allclose(np.asarray(out1.obj_dists)[valid],
                           np.asarray(out2.obj_dists)[valid])
