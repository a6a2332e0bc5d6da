"""Torch/numpy transcription of the reference MotifNet forward pass, used
as the oracle for forward-parity tests (VERDICT r1 item 1).

This is NOT a copy of the reference code: it is an independent
re-implementation, written from reading the reference sources, operating on
plain per-image numpy arrays (no PackedSequence, no CUDA). Each function
cites the reference file:lines whose semantics it transcribes. Weights come
in REFERENCE (torch) layout — e.g. Linear weights are [out, in], the LSTM
stack is the flat packed vector — so running the same state_dict through
this oracle and through neural_motifs_tpu's importer+model checks both the
layout transforms and the math.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_linear(x, w, b=None):
    """torch nn.Linear: w is [out, in]."""
    y = x @ w.T
    return y + b if b is not None else y


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_center_size(boxes):
    """lib/fpn/box_utils.py:59-66 (+1 width convention)."""
    wh = boxes[..., 2:] - boxes[..., :2] + 1.0
    return np.concatenate([boxes[..., :2] + 0.5 * wh, wh], -1)


def np_batchnorm_eval(x, weight, bias, running_mean, running_var, eps=1e-5):
    """torch BatchNorm eval-mode normalization."""
    return (x - running_mean) / np.sqrt(running_var + eps) * weight + bias


def np_pos_embed(boxes, sd, prefix="context.pos_embed", eps=1e-5):
    """Reference pos_embed at eval: BN1d(4) -> Linear(4,128) -> ReLU
    (Dropout inactive at eval). lib/rel_model.py:103-108, input
    center_size(box_priors) per rel_model.py:247."""
    x = np_center_size(boxes)
    x = np_batchnorm_eval(x, sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"],
                          sd[f"{prefix}.0.running_mean"],
                          sd[f"{prefix}.0.running_var"], eps)
    x = np_linear(x, sd[f"{prefix}.1.weight"], sd[f"{prefix}.1.bias"])
    return np.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# Highway LSTM (the CUDA AlternatingHighwayLSTM)
# ---------------------------------------------------------------------------

def split_flat_lstm(flat_w, flat_b, input_size, hidden_size, num_layers):
    """Unpack the flat packed weight/bias vectors exactly as the CUDA kernel
    addresses them (highway_lstm_kernel.cu:428-434 weightStart arithmetic;
    alternating_highway_lstm.py:234-257 packing): per layer an input
    projection [d_in, 6H] then a recurrent projection [H, 5H]; bias [5H]."""
    h = hidden_size
    layers = []
    w_ofs = b_ofs = 0
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else h
        w_i = flat_w[w_ofs:w_ofs + d_in * 6 * h].reshape(d_in, 6 * h)
        w_ofs += d_in * 6 * h
        w_h = flat_w[w_ofs:w_ofs + h * 5 * h].reshape(h, 5 * h)
        w_ofs += h * 5 * h
        b = flat_b[b_ofs:b_ofs + 5 * h]
        b_ofs += 5 * h
        layers.append((w_i, w_h, b))
    assert w_ofs == flat_w.size and b_ofs == flat_b.size
    return layers


def highway_cell(x_t, h, c, w_i, w_h, b):
    """Fused highway-LSTM cell (elementWise_fp, highway_lstm_kernel.cu:
    108-160): gate order (in, forget, act, out, r, lin); lin has no
    recurrent path or bias. x_t [H?], h/c [hid]. Weights in x@W layout
    (confirmed against the cuBLAS call at highway_lstm_kernel.cu:441-449)."""
    hid = h.shape[-1]
    gi = x_t @ w_i
    gh = h @ w_h
    g = gi[:5 * hid] + gh + b
    in_g = sigmoid(g[0 * hid:1 * hid])
    fg_g = sigmoid(g[1 * hid:2 * hid])
    act = np.tanh(g[2 * hid:3 * hid])
    out_g = sigmoid(g[3 * hid:4 * hid])
    r_g = sigmoid(g[4 * hid:5 * hid])
    lin = gi[5 * hid:6 * hid]
    c_new = fg_g * c + in_g * act
    h_new = r_g * (out_g * np.tanh(c_new)) + (1.0 - r_g) * lin
    return h_new, c_new


def np_alternating_highway_lstm(flat_w, flat_b, x, input_size, hidden_size,
                                num_layers):
    """One image's sequence [T, D] through the stacked LSTM; layer l runs
    forward if l is even else backward (highway_lstm_kernel.cu:393-407).
    Eval mode (dropout off). PackedSequence batching across images is a pure
    batching device — per-image math is an independent scan."""
    layers = split_flat_lstm(flat_w, flat_b, input_size, hidden_size,
                             num_layers)
    out = np.asarray(x, np.float64)
    for li, (w_i, w_h, b) in enumerate(layers):
        w_i, w_h, b = w_i.astype(np.float64), w_h.astype(np.float64), b.astype(np.float64)
        t_order = range(out.shape[0]) if li % 2 == 0 else range(out.shape[0] - 1, -1, -1)
        h = np.zeros(hidden_size)
        c = np.zeros(hidden_size)
        ys = np.zeros((out.shape[0], hidden_size))
        for t in t_order:
            h, c = highway_cell(out[t], h, c, w_i, w_h, b)
            ys[t] = h
        out = ys
    return out


# ---------------------------------------------------------------------------
# Decoder RNN
# ---------------------------------------------------------------------------

def np_decoder(sd, x, labels=None, training=False, prefix="context.decoder_rnn"):
    """One image's sorted sequence [T, D] through the DecoderRNN
    (decoder_rnn.py:96-227): highway cell from input_linearity [6H, D+100] /
    state_linearity [5H, H]; feeds back obj_embed[commit + 1]; train =
    teacher forcing with GT labels (bg rows replaced by non-bg argmax,
    decoder_rnn.py:206-212); eval = greedy non-bg argmax (:215-227).
    Returns (logits [T, NC], commits [T])."""
    w_in = sd[f"{prefix}.input_linearity.weight"].astype(np.float64)
    b_in = sd[f"{prefix}.input_linearity.bias"].astype(np.float64)
    w_st = sd[f"{prefix}.state_linearity.weight"].astype(np.float64)
    b_st = sd[f"{prefix}.state_linearity.bias"].astype(np.float64)
    w_out = sd[f"{prefix}.out.weight"].astype(np.float64)
    b_out = sd[f"{prefix}.out.bias"].astype(np.float64)
    embed = sd[f"{prefix}.obj_embed.weight"].astype(np.float64)

    hid = w_st.shape[1]
    t_len = x.shape[0]
    nc = w_out.shape[0]
    h = np.zeros(hid)
    c = np.zeros(hid)
    prev_e = embed[0]
    logits = np.zeros((t_len, nc))
    commits = np.zeros(t_len, np.int64)
    for t in range(t_len):
        inp = np.concatenate([x[t], prev_e])
        pi = w_in @ inp + b_in
        ps = w_st @ h + b_st
        in_g = sigmoid(pi[0 * hid:1 * hid] + ps[0 * hid:1 * hid])
        fg_g = sigmoid(pi[1 * hid:2 * hid] + ps[1 * hid:2 * hid])
        act = np.tanh(pi[2 * hid:3 * hid] + ps[2 * hid:3 * hid])
        out_g = sigmoid(pi[3 * hid:4 * hid] + ps[3 * hid:4 * hid])
        r_g = sigmoid(pi[4 * hid:5 * hid] + ps[4 * hid:5 * hid])
        lin = pi[5 * hid:6 * hid]
        c = in_g * act + fg_g * c
        h = out_g * np.tanh(c)
        h = r_g * h + (1.0 - r_g) * lin
        pred = w_out @ h + b_out
        logits[t] = pred
        nonbg = int(np.argmax(pred[1:])) + 1
        if training and labels is not None:
            commit = int(labels[t]) if labels[t] > 0 else nonbg
        else:
            commit = nonbg
        commits[t] = commit
        prev_e = embed[commit + 1]
    return logits, commits


# ---------------------------------------------------------------------------
# LinearizedContext (per-image, eval mode)
# ---------------------------------------------------------------------------

def np_sort_order(order, obj_logits, boxes):
    """Within-image linearization score (rel_model.py:139-161), descending
    (_sort_by_score sorts descending, rel_model.py:55). Returns perm."""
    cs = np_center_size(boxes)
    if order == "size":
        sizes = cs[:, 2] * cs[:, 3]
        scores = sizes / (sizes.max() + 1)
    elif order == "confidence":
        scores = np_softmax(obj_logits, -1)[:, 1:].max(-1)
    elif order == "leftright":
        centers = cs[:, 0]
        scores = centers / (centers.max() + 1)
    else:
        raise ValueError(order)
    # stable descending sort (torch.sort descending)
    return np.argsort(-scores, kind="stable")


def np_context_sgcls(sd, obj_fmaps, obj_logits, boxes, labels, *, order,
                     nl_obj, nl_edge, hidden_dim, obj_dim, embed_dim,
                     pass_in_obj_feats_to_decoder=False,
                     pass_in_obj_feats_to_edge=False, training=False):
    """One image's LinearizedContext forward, eval/train(no dropout), sgcls
    (rel_model.py:236-296 + obj_ctx :200-234 + edge_ctx :171-195).

    Returns (obj_dists2 [N, NC], obj_preds [N], edge_ctx [N, H])."""
    soft = np_softmax(obj_logits, -1)
    obj_embed = soft @ sd["context.obj_embed.weight"]
    pos = np_pos_embed(boxes, sd)
    obj_pre_rep = np.concatenate([obj_fmaps, obj_embed, pos], -1)

    # obj ctx (rel_model.py:200-216)
    perm = np_sort_order(order, obj_logits, boxes)
    inv_perm = np.argsort(perm)
    inp = obj_pre_rep[perm]
    enc = np_alternating_highway_lstm(
        sd["context.obj_ctx_rnn.weight"], sd["context.obj_ctx_rnn.bias"],
        inp, obj_dim + embed_dim + 128, hidden_dim, nl_obj)

    dec_inp = (np.concatenate([inp, enc], -1)
               if pass_in_obj_feats_to_decoder else enc)
    logits_s, commits_s = np_decoder(
        sd, dec_inp, labels=labels[perm] if labels is not None else None,
        training=training)
    obj_dists2 = logits_s[inv_perm]
    obj_preds = commits_s[inv_perm]
    obj_ctx = enc[inv_perm]

    # edge ctx (rel_model.py:171-195): input cat(embed2[preds], feats);
    # sort by confidence of the committed class when order == 'confidence',
    # else by the box-based order.
    edge_ctx = None
    if nl_edge > 0:
        embed2 = sd["context.obj_embed2.weight"][obj_preds]
        feats = (np.concatenate([obj_fmaps, obj_ctx], -1)
                 if pass_in_obj_feats_to_edge else obj_ctx)
        inp_feats = np.concatenate([embed2, feats], -1)
        if order == "confidence":
            conf = np_softmax(obj_dists2, -1)[np.arange(len(obj_preds)), obj_preds]
            perm_e = np.argsort(-conf, kind="stable")
        else:
            perm_e = np_sort_order(order, obj_dists2, boxes)
        inv_e = np.argsort(perm_e)
        e_in = embed_dim + (hidden_dim if nl_obj > 0 else 0) + \
            (obj_dim if pass_in_obj_feats_to_edge else 0)
        edge_reps = np_alternating_highway_lstm(
            sd["context.edge_ctx_rnn.weight"], sd["context.edge_ctx_rnn.bias"],
            inp_feats[perm_e], e_in, hidden_dim, nl_edge)
        edge_ctx = edge_reps[inv_e]
    return obj_dists2, obj_preds, edge_ctx


# ---------------------------------------------------------------------------
# Relation head (rel_model.py:500-547)
# ---------------------------------------------------------------------------

def np_rel_head(sd, edge_ctx, obj_preds, pairs, vr, *, pooling_dim,
                num_classes, use_vision=True, limit_vision=False,
                use_tanh=False, use_bias=True):
    """edge_ctx [N, H]; pairs [P, 2] (sub, obj); vr [P, pooling_dim] union
    visual features. Returns rel_dists [P, NP]."""
    edge_rep = np_linear(edge_ctx, sd["post_lstm.weight"], sd["post_lstm.bias"])
    edge_rep = edge_rep.reshape(-1, 2, pooling_dim)
    subj_rep = edge_rep[:, 0]
    obj_rep = edge_rep[:, 1]
    prod_rep = subj_rep[pairs[:, 0]] * obj_rep[pairs[:, 1]]
    if use_vision:
        if limit_vision:
            prod_rep = np.concatenate(
                [prod_rep[:, :2048] * vr[:, :2048], prod_rep[:, 2048:]], 1)
        else:
            prod_rep = prod_rep * vr
    if use_tanh:
        prod_rep = np.tanh(prod_rep)
    rel_dists = np_linear(prod_rep, sd["rel_compress.weight"],
                          sd["rel_compress.bias"])
    if use_bias:
        idx = obj_preds[pairs[:, 0]] * num_classes + obj_preds[pairs[:, 1]]
        rel_dists = rel_dists + sd["freq_bias.obj_baseline.weight"][idx]
    return rel_dists


def np_gru_cell(x, h, w_ih, w_hh, b_ih, b_hh):
    """torch nn.GRUCell math: gate rows chunked (r, z, n); the candidate
    applies r INSIDE the recurrent projection:
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))."""
    hid = h.shape[-1]
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    r = sigmoid(gi[..., :hid] + gh[..., :hid])
    z = sigmoid(gi[..., hid:2 * hid] + gh[..., hid:2 * hid])
    n = np.tanh(gi[..., 2 * hid:] + r * gh[..., 2 * hid:])
    return (1.0 - z) * n + z * h


def np_stanford_message_pass(sd, rel_rep, obj_rep, rel_inds, n_iter=3):
    """Stanford iterative message passing (rel_model_stanford.py:60-107):
    GRU-init both factor sets from zero hidden state, then n_iter rounds of
    (a) sigmoid-gated sub/obj->edge aggregation updating the edge GRU and
    (b) incidence-matrix (here scatter-add) edge->node aggregation updating
    the node GRU. NOTE the reference computes pre_out/pre_in from the
    PRE-update edge factor (edge_factor[i], :100-104). Returns
    (obj_dists [N, NC], rel_dists [P, NP])."""
    eg = tuple(np.asarray(sd[f"edge_gru.{k}"], np.float64)
               for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"))
    ng = tuple(np.asarray(sd[f"node_gru.{k}"], np.float64)
               for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"))
    size = eg[1].shape[1]
    gate = {nm: (sd[f"{nm}.0.weight"].astype(np.float64),
                 sd[f"{nm}.0.bias"].astype(np.float64))
            for nm in ("sub_vert_w_fc", "obj_vert_w_fc", "out_edge_w_fc",
                       "in_edge_w_fc")}

    vert = np_gru_cell(np.asarray(obj_rep, np.float64),
                       np.zeros((len(obj_rep), size)), *ng)
    edge = np_gru_cell(np.asarray(rel_rep, np.float64),
                       np.zeros((len(rel_rep), size)), *eg)
    for _ in range(n_iter):
        sub_vert = vert[rel_inds[:, 0]]
        obj_vert = vert[rel_inds[:, 1]]
        w_sub = sigmoid(np_linear(np.concatenate([sub_vert, edge], 1),
                                  *gate["sub_vert_w_fc"]))
        w_obj = sigmoid(np_linear(np.concatenate([obj_vert, edge], 1),
                                  *gate["obj_vert_w_fc"]))
        new_edge = np_gru_cell(w_sub * sub_vert + w_obj * obj_vert, edge, *eg)
        pre_out = sigmoid(np_linear(np.concatenate([sub_vert, edge], 1),
                                    *gate["out_edge_w_fc"])) * edge
        pre_in = sigmoid(np_linear(np.concatenate([obj_vert, edge], 1),
                                   *gate["in_edge_w_fc"])) * edge
        vert_ctx = np.zeros_like(vert)
        np.add.at(vert_ctx, rel_inds[:, 0], pre_out)
        np.add.at(vert_ctx, rel_inds[:, 1], pre_in)
        vert = np_gru_cell(vert_ctx, vert, *ng)
        edge = new_edge
    obj_dists = np_linear(vert, sd["obj_fc.weight"], sd["obj_fc.bias"])
    rel_dists = np_linear(edge, sd["rel_fc.weight"], sd["rel_fc.bias"])
    return obj_dists, rel_dists


def np_union_tower(sd, x_flat, pooling_dim=4096):
    """Union fc tower (rel_model.py:367-373 / load_vgg deletions,
    object_detector.py:623-633): Linear -> ReLU -> [Dropout] -> Linear.
    x_flat is already flattened in torch (C, H, W) order."""
    x = np_linear(x_flat, sd["roi_fmap.1.0.weight"], sd["roi_fmap.1.0.bias"])
    x = np.maximum(x, 0.0)
    x = np_linear(x, sd["roi_fmap.1.3.weight"], sd["roi_fmap.1.3.bias"])
    return x


def np_obj_tower(sd, x_flat):
    """RoI obj tower = vgg classifier minus final fc (object_detector.py:
    631-633 defaults): Linear -> ReLU -> Dropout -> Linear -> ReLU ->
    Dropout; eval mode so dropout is identity."""
    x = np_linear(x_flat, sd["roi_fmap_obj.0.weight"], sd["roi_fmap_obj.0.bias"])
    x = np.maximum(x, 0.0)
    x = np_linear(x, sd["roi_fmap_obj.3.weight"], sd["roi_fmap_obj.3.bias"])
    return np.maximum(x, 0.0)
