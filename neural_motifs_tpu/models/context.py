"""LinearizedContext — the "motifs" core — plus the decoder RNN, in padded
[B, O, ...] layout.

Reference: lib/rel_model.py:66-296 (LinearizedContext), lib/lstm/decoder_rnn.py
(DecoderRNN). The reference linearizes RoIs across images into one packed
sequence with a global sort hack (_sort_by_score, rel_model.py:31-61); here
each image is simply a row of a [B, O] grid, and "linearization" is a
per-image argsort — no PackedSequence, no cross-image coupling.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.ops.boxes import center_size, nms_overlaps
from neural_motifs_tpu.ops.highway_lstm import (alternating_highway_lstm,
                                                block_orthogonal)
from neural_motifs_tpu.utils.misc import to_onehot

Array = jax.Array

NEG = -1e9


def _ortho_init(block: tuple[int, int]):
    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(block_orthogonal(key, shape, block))
    return init


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of a padded [..., F] tensor.

    Matches torch.nn.BatchNorm1d semantics (the reference pos_embed BN,
    rel_model.py:103-108): training normalizes with the batch statistics of
    the (valid) rows and updates running stats with the UNBIASED variance;
    eval normalizes with the running stats. The reference has no padding, so
    "valid rows" there is all rows — here padded rows must not pollute the
    batch statistics.

    momentum is in the flax convention: new = momentum * old + (1-m) * batch
    (i.e. flax_momentum = 1 - torch_momentum).
    """

    momentum: float = 0.999
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask.reshape(-1).astype(jnp.float32)
            xf = x.reshape(-1, feat).astype(jnp.float32)
            n = jnp.maximum(w.sum(), 1.0)
            mean = (xf * w[:, None]).sum(0) / n
            var = (w[:, None] * jnp.square(xf - mean)).sum(0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class AlternatingHighwayLSTM(nn.Module):
    """linen wrapper over ops.highway_lstm with the reference's init
    (block-orthogonal weights, forget bias 1; alternating_highway_lstm.py:
    233-257)."""

    input_size: int     # informational; layer-0 width is taken from x
    hidden_size: int
    num_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        params = []
        h = self.hidden_size
        for layer in range(self.num_layers):
            d_in = x.shape[-1] if layer == 0 else h

            def bias_init(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[h:2 * h].set(1.0)

            params.append({
                "w_i": self.param(f"l{layer}_w_i", _ortho_init((d_in, h)),
                                  (d_in, 6 * h)),
                "w_h": self.param(f"l{layer}_w_h", _ortho_init((h, h)), (h, 5 * h)),
                "bias": self.param(f"l{layer}_bias", bias_init, (5 * h,)),
            })
        rng = None
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")
        return alternating_highway_lstm(params, x, lengths, dropout_p=self.dropout,
                                        train=train, rng=rng)


class DecoderRNN(nn.Module):
    """Sequential object-label decoder (decoder_rnn.py:40-251): a single
    highway-LSTM cell over the linearized RoI sequence, feeding back the
    embedding of the previous committed label. Train = teacher forcing with
    GT labels (bg rows replaced by the argmax prediction); eval = greedy
    argmax over non-bg, optionally followed by the global leave-one-out NMS
    decode (decoder_rnn.py:229-247).
    """

    num_classes: int
    inputs_dim: int
    hidden_dim: int
    embed_vecs: Any                # np [NC+1, 100]: row 0 = 'start' token
    dropout: float = 0.2
    nms_thresh: float = 0.3

    @nn.compact
    def __call__(self, x, mask, labels=None, boxes_for_nms=None,
                 train: bool = False):
        """x: [B, T, D] (already sorted); mask: [B, T]; labels: [B, T] (GT,
        0 = bg); boxes_for_nms: [B, T, NC, 4] per-class boxes.

        Returns (logits [B, T, NC], commitments [B, T] int32).
        """
        b, t, _ = x.shape
        h = self.hidden_dim
        embed_dim = int(np.asarray(self.embed_vecs).shape[1])
        embed = self.param("obj_embed", lambda k, s: jnp.asarray(self.embed_vecs),
                           (self.num_classes + 1, embed_dim))
        # width comes from the actual input (the reference's declared
        # decoder_inputs_dim, rel_model.py:117-119, under-counts the 128-d
        # position embedding when pass_in_obj_feats_to_decoder is set — a
        # latent upstream bug; canonical configs use False)
        input_size = x.shape[-1] + embed_dim

        w_i = self.param("input_w", _ortho_init((input_size, h)),
                         (input_size, 6 * h))
        b_i = self.param("input_b", nn.initializers.zeros, (6 * h,))
        w_h = self.param("state_w", _ortho_init((h, h)), (h, 5 * h))

        def state_bias_init(key, shape, dtype=jnp.float32):
            v = jnp.zeros(shape, dtype)
            return v.at[h:2 * h].set(1.0)   # forget bias 1 (decoder_rnn.py:94)

        b_h = self.param("state_b", state_bias_init, (5 * h,))
        out_w = self.param("out_w", nn.initializers.xavier_uniform(),
                           (h, self.num_classes))
        out_b = self.param("out_b", nn.initializers.zeros, (self.num_classes,))

        dropout_mask = None
        if train and self.dropout > 0:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.dropout, (b, h))
            dropout_mask = keep.astype(x.dtype) / (1.0 - self.dropout)

        dx = x.shape[-1]
        w_i_x, w_i_e = w_i[:dx], w_i[dx:]
        # hoist the input projection out of the scan ([B,T,Dx] @ [Dx,6H])
        pre_all = x @ w_i_x + b_i

        def cell(pre_t, prev_e, prev_h, prev_c):
            """decoder_rnn.py:96-131 — note the decoder's highway gate takes
            BOTH input and state projections (slot 4), and the highway input
            is the input-only slot 5."""
            pi = pre_t + prev_e @ w_i_e
            ps = prev_h @ w_h + b_h
            in_g = jax.nn.sigmoid(pi[:, 0 * h:1 * h] + ps[:, 0 * h:1 * h])
            fg_g = jax.nn.sigmoid(pi[:, 1 * h:2 * h] + ps[:, 1 * h:2 * h])
            act = jnp.tanh(pi[:, 2 * h:3 * h] + ps[:, 2 * h:3 * h])
            out_g = jax.nn.sigmoid(pi[:, 3 * h:4 * h] + ps[:, 3 * h:4 * h])
            r_g = jax.nn.sigmoid(pi[:, 4 * h:5 * h] + ps[:, 4 * h:5 * h])
            lin = pi[:, 5 * h:6 * h]
            c = in_g * act + fg_g * prev_c
            out = out_g * jnp.tanh(c)
            out = r_g * out + (1.0 - r_g) * lin
            if dropout_mask is not None:
                out = out * dropout_mask
            return out, c

        h0 = jnp.zeros((b, h), x.dtype)
        c0 = jnp.zeros((b, h), x.dtype)
        e0 = jnp.broadcast_to(embed[0], (b, embed_dim)).astype(x.dtype)

        lbl_seq = (jnp.swapaxes(labels, 0, 1) if labels is not None
                   else jnp.zeros((t, b), jnp.int32))

        def step(carry, inp):
            prev_h, prev_c, prev_e = carry
            pre_t, m_t, label_t = inp
            new_h, new_c = cell(pre_t, prev_e, prev_h, prev_c)
            logits = new_h @ out_w + out_b
            nonbg = jnp.argmax(logits[:, 1:], axis=1) + 1
            if train and labels is not None:
                commit = jnp.where(label_t > 0, label_t, nonbg)
            else:
                commit = nonbg
            new_e = embed[commit + 1].astype(x.dtype)
            m = m_t[:, None]
            prev_h = jnp.where(m, new_h, prev_h)
            prev_c = jnp.where(m, new_c, prev_c)
            prev_e = jnp.where(m, new_e, prev_e)
            return (prev_h, prev_c, prev_e), (logits, commit)

        xs = (jnp.swapaxes(pre_all, 0, 1), jnp.swapaxes(mask, 0, 1), lbl_seq)
        _, (logits, commits) = jax.lax.scan(step, (h0, c0, e0), xs)
        logits = jnp.swapaxes(logits, 0, 1)          # [B, T, NC]
        commits = jnp.swapaxes(commits, 0, 1).astype(jnp.int32)

        if boxes_for_nms is not None and not train:
            commits = self._nms_decode(logits, mask, boxes_for_nms)
        return logits, commits

    def _nms_decode(self, logits, mask, boxes_for_nms):
        """Global leave-one-out NMS decode (decoder_rnn.py:229-247): pick the
        global (box, class) argmax, commit it, zero the same class on
        overlapping boxes, never revisit the chosen box."""
        b, t, nc = logits.shape
        probs = jax.nn.softmax(logits, axis=-1)
        probs = probs.at[..., 0].set(0.0)
        probs = jnp.where(mask[..., None], probs, -1.0)
        is_over = nms_overlaps(boxes_for_nms) >= self.nms_thresh  # [B, T, T, NC]

        n_valid = mask.sum(axis=1)

        def body(i, state):
            probs, commits = state
            flat = probs.reshape(b, -1)
            best = jnp.argmax(flat, axis=1)
            box_i = best // nc
            cls_i = (best % nc).astype(jnp.int32)
            # the padded fori_loop runs T times but the reference loop runs
            # exactly N=#valid times (decoder_rnn.py:241). Iterations past N
            # must be no-ops: the suppression step can resurrect entries of
            # already-committed boxes back to 0.0, and an extra iteration
            # would re-pick one and overwrite its commit (and once all
            # entries hit -1 the argmax degenerates to flat index 0).
            live = i < n_valid
            cls_i = jnp.where(live, cls_i,
                              jax.vmap(lambda c, bi: c[bi])(commits, box_i))
            commits = jax.vmap(lambda c, bi, ci: c.at[bi].set(ci))(commits, box_i, cls_i)
            # zero same-class probs of boxes overlapping the chosen one
            over = jax.vmap(lambda o, bi, ci: o[bi, :, ci])(is_over, box_i, cls_i)
            probs = jax.vmap(
                lambda p, ov, ci: p.at[:, ci].set(jnp.where(ov, 0.0, p[:, ci]))
            )(probs, over, cls_i)
            probs = jax.vmap(lambda p, bi: p.at[bi].set(-1.0))(probs, box_i)
            return probs, commits

        commits0 = jnp.zeros((b, t), jnp.int32)
        _, commits = jax.lax.fori_loop(0, t, body, (probs, commits0))
        return jnp.where(mask, commits, 0)


def sort_by_order(order: str, obj_dists: Array, boxes: Array, valid: Array,
                  rng: Optional[jax.Array]) -> tuple[Array, Array, Array]:
    """Per-image linearization permutation (rel_model.py:139-161): returns
    (perm [B, O], inv_perm [B, O], lengths [B]). Valid rows first, ordered by
    descending score; padded rows go last."""
    b, o = valid.shape
    cs = center_size(boxes)
    if order == "size":
        sizes = cs[..., 2] * cs[..., 3]
        scores = sizes / (jnp.max(sizes, axis=1, keepdims=True) + 1.0)
    elif order == "confidence":
        scores = jnp.max(jax.nn.softmax(obj_dists, axis=-1)[..., 1:], axis=-1)
    elif order == "random":
        assert rng is not None
        scores = jax.random.uniform(rng, (b, o))
    elif order == "leftright":
        centers = cs[..., 0]
        scores = centers / (jnp.max(centers, axis=1, keepdims=True) + 1.0)
    else:
        raise ValueError(order)

    key = jnp.where(valid, scores, NEG)
    perm = jnp.argsort(-key, axis=1)
    inv_perm = jnp.argsort(perm, axis=1)
    lengths = valid.sum(axis=1)
    return perm.astype(jnp.int32), inv_perm.astype(jnp.int32), lengths


def permute(x: Array, perm: Array) -> Array:
    """Gather rows of [B, O, ...] by per-image permutation [B, O]."""
    return jnp.take_along_axis(x, perm.reshape(perm.shape + (1,) * (x.ndim - 2)),
                               axis=1)


class ContextOutput(NamedTuple):
    obj_dists: Array   # [B, O, NC] refined logits
    obj_preds: Array   # [B, O] committed classes
    edge_ctx: Optional[Array]  # [B, O, H]


class LinearizedContext(nn.Module):
    """Object context LSTM -> decoder -> edge context LSTM
    (rel_model.py:66-296)."""

    num_classes: int
    embed_vecs: Any            # [NC, embed_dim] GloVe init
    decoder_embed_vecs: Any    # [NC+1, 100]
    mode: str = "sgdet"
    embed_dim: int = 200
    hidden_dim: int = 256
    obj_dim: int = 4096
    nl_obj: int = 2
    nl_edge: int = 2
    dropout_rate: float = 0.2
    order: str = "confidence"
    pass_in_obj_feats_to_decoder: bool = True
    pass_in_obj_feats_to_edge: bool = True
    sgdet_baseline_nms: float = 0.3

    def setup(self):
        self.obj_embed = self.param("obj_embed",
                                    lambda k, s: jnp.asarray(self.embed_vecs),
                                    (self.num_classes, self.embed_dim))
        self.obj_embed2 = self.param("obj_embed2",
                                     lambda k, s: jnp.asarray(self.embed_vecs),
                                     (self.num_classes, self.embed_dim))
        # position embed: BN(4) + Linear(4, 128) + ReLU + Dropout(0.1)
        # (rel_model.py:103-108; torch momentum 0.01/10 -> flax 1-0.001)
        self.pos_bn = MaskedBatchNorm(momentum=1.0 - C.BATCHNORM_MOMENTUM / 10.0)
        self.pos_fc = nn.Dense(128)
        self.pos_drop = nn.Dropout(0.1)
        if self.nl_obj > 0:
            self.obj_ctx_rnn = AlternatingHighwayLSTM(
                input_size=self.obj_dim + self.embed_dim + 128,
                hidden_size=self.hidden_dim, num_layers=self.nl_obj,
                dropout=self.dropout_rate)
            dec_dim = self.hidden_dim
            if self.pass_in_obj_feats_to_decoder:
                dec_dim += self.obj_dim + self.embed_dim
            self.decoder_rnn = DecoderRNN(
                num_classes=self.num_classes, inputs_dim=dec_dim,
                hidden_dim=self.hidden_dim,
                embed_vecs=self.decoder_embed_vecs,
                dropout=self.dropout_rate)
        else:
            self.decoder_lin = nn.Dense(self.num_classes)
        if self.nl_edge > 0:
            in_dim = self.embed_dim
            if self.nl_obj > 0:
                in_dim += self.hidden_dim
            if self.pass_in_obj_feats_to_edge:
                in_dim += self.obj_dim
            self.edge_ctx_rnn = AlternatingHighwayLSTM(
                input_size=in_dim, hidden_size=self.hidden_dim,
                num_layers=self.nl_edge, dropout=self.dropout_rate)

    def __call__(self, obj_fmaps, obj_logits, boxes, valid, obj_labels=None,
                 boxes_per_cls=None, train: bool = False) -> ContextOutput:
        """obj_fmaps [B,O,obj_dim]; obj_logits [B,O,NC] (detached upstream);
        boxes [B,O,4]; valid [B,O]; obj_labels [B,O] (train / predcls)."""
        soft = jax.nn.softmax(obj_logits, axis=-1)
        obj_embedded = soft @ self.obj_embed                    # [B, O, E]
        pos = self.pos_drop(
            nn.relu(self.pos_fc(self.pos_bn(center_size(boxes), valid,
                                            use_running_average=not train))),
            deterministic=not train)
        obj_pre_rep = jnp.concatenate([obj_fmaps, obj_embedded, pos], -1)

        rng = self.make_rng("sample") if self.order == "random" else None

        if self.nl_obj > 0:
            obj_dists2, obj_preds, obj_ctx = self._obj_ctx(
                obj_pre_rep, obj_logits, boxes, valid, obj_labels,
                boxes_per_cls, train)
        else:
            # no-context ("baseline") ablation (rel_model.py:259-284)
            if self.mode == "predcls":
                obj_dists2 = to_onehot(obj_labels, self.num_classes)
            else:
                obj_dists2 = self.decoder_lin(obj_pre_rep)
            if self.mode == "sgdet" and not train and boxes_per_cls is not None:
                from neural_motifs_tpu.ops.nms import per_class_nms_mask
                probs = jax.nn.softmax(obj_dists2, axis=-1)
                keep = jax.vmap(lambda bc, p, v: per_class_nms_mask(
                    bc, p, v, self.sgdet_baseline_nms, 0.0))(
                        boxes_per_cls, probs, valid)
                masked = probs * keep
                obj_preds = jnp.argmax(masked[..., 1:], axis=-1) + 1
            elif obj_labels is not None:
                obj_preds = obj_labels
            else:
                obj_preds = jnp.argmax(obj_dists2[..., 1:], axis=-1) + 1
            obj_ctx = obj_pre_rep

        edge_ctx = None
        if self.nl_edge > 0:
            edge_inp = (jnp.concatenate([obj_fmaps, obj_ctx], -1)
                        if self.pass_in_obj_feats_to_edge else obj_ctx)
            edge_ctx = self._edge_ctx(
                edge_inp, jax.lax.stop_gradient(obj_dists2), obj_preds,
                boxes, valid, train, rng)
        return ContextOutput(obj_dists2, obj_preds.astype(jnp.int32), edge_ctx)

    def _obj_ctx(self, obj_feats, obj_logits, boxes, valid, obj_labels,
                 boxes_per_cls, train):
        """rel_model.py:197-234."""
        rng = self.make_rng("sample") if self.order == "random" else None
        perm, inv_perm, lengths = sort_by_order(self.order, obj_logits, boxes,
                                                valid, rng)
        inp = permute(obj_feats, perm)
        mask_sorted = jnp.take_along_axis(valid, perm, axis=1)
        enc = self.obj_ctx_rnn(inp, lengths, train=train)

        if self.mode != "predcls":
            dec_inp = (jnp.concatenate([inp, enc], -1)
                       if self.pass_in_obj_feats_to_decoder else enc)
            labels_sorted = (jnp.take_along_axis(obj_labels, perm, axis=1)
                             if obj_labels is not None else None)
            bpc_sorted = (permute(boxes_per_cls, perm)
                          if boxes_per_cls is not None else None)
            dists, preds = self.decoder_rnn(dec_inp, mask_sorted,
                                            labels=labels_sorted,
                                            boxes_for_nms=bpc_sorted,
                                            train=train)
            dists = permute(dists, inv_perm)
            preds = jnp.take_along_axis(preds, inv_perm, axis=1)
        else:
            assert obj_labels is not None
            preds = obj_labels
            dists = to_onehot(preds, self.num_classes)
        enc = permute(enc, inv_perm)
        return dists, preds, enc

    def _edge_ctx(self, obj_feats, obj_dists, obj_preds, boxes, valid, train,
                  rng):
        """rel_model.py:171-195: hard class embedding + ctx through the edge
        LSTM, sorted by the confidence of the committed class."""
        embed2 = self.obj_embed2[obj_preds]
        inp = jnp.concatenate([embed2, obj_feats], -1)
        probs = jax.nn.softmax(obj_dists, axis=-1)
        conf = jnp.take_along_axis(probs, obj_preds[..., None], axis=-1)[..., 0]
        if self.order == "confidence":
            key = jnp.where(valid, conf, NEG)
            perm = jnp.argsort(-key, axis=1).astype(jnp.int32)
            inv_perm = jnp.argsort(perm, axis=1).astype(jnp.int32)
            lengths = valid.sum(axis=1)
        else:
            perm, inv_perm, lengths = sort_by_order(self.order, obj_dists,
                                                    boxes, valid, rng)
        out = self.edge_ctx_rnn(permute(inp, perm), lengths, train=train)
        return permute(out, inv_perm)
