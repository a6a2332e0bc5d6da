"""Differentiable torch twin of the MotifNet TRAINING step, used as the
autograd oracle for gradient-parity tests (VERDICT r4 item 1).

Where tests/torch_reference.py transcribes the reference FORWARD in numpy,
this module builds the same math as a torch float64 autograd graph so one
train step's loss AND per-parameter gradients can be checked against the
jax side. Reference semantics transcribed here:

  * losses: object-class CE + predicate CE, each a plain mean over the
    concatenated batch (models/train_rels.py:140-153)
  * frozen-detector boundary: detector params get requires_grad=False,
    the feature map enters the rel model as a constant
    (models/train_rels.py:51-52, lib/rel_model.py:491 fmap.detach())
  * train-mode BatchNorm: normalize with biased batch stats, update
    running stats with the UNBIASED variance at torch momentum
    (pos_embed BN momentum 0.001, rel_model.py:103-108; union conv BNs
    momentum 0.01, get_union_boxes.py:31-39)
  * decoder teacher forcing: commit = GT label if > 0 else argmax non-bg
    (lib/lstm/decoder_rnn.py:206-212)

Weights come in REFERENCE (torch) state-dict layout; gradients go back out
in the same layout, so mapping them through the real checkpoint importer
(training/checkpoint.py, a purely linear remapping: transposes, reshapes,
flat-vector splits) yields jax-layout gradients for leaf-wise comparison.

Dropout is identity on both sides (masks are RNG-coupled and cannot match
across frameworks); everything else runs exactly the reference train-mode
semantics.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

F64 = torch.float64


def make_params(sd: dict, frozen_prefix: str = "detector.") -> dict:
    """Reference state dict -> dict of float64 torch tensors; rel-model
    params require grad, the detector subtree and BN buffers do not."""
    params = {}
    for k, v in sd.items():
        t = torch.tensor(np.asarray(v), dtype=F64)
        is_buffer = k.endswith(("running_mean", "running_var"))
        t.requires_grad_(not k.startswith(frozen_prefix) and not is_buffer)
        params[k] = t
    return params


def t_linear(p: dict, name: str, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def t_obj_tower(p: dict, x):
    """roi_fmap_obj: Linear-ReLU-[Dropout]-Linear-ReLU-[Dropout]
    (object_detector.py:631-633 defaults); dropout identity."""
    x = torch.relu(t_linear(p, "roi_fmap_obj.0", x))
    return torch.relu(t_linear(p, "roi_fmap_obj.3", x))


def t_union_tower(p: dict, x):
    """roi_fmap.1: Linear-ReLU-[Dropout]-Linear (rel_model.py:367-373)."""
    x = torch.relu(t_linear(p, "roi_fmap.1.0", x))
    return t_linear(p, "roi_fmap.1.3", x)


def t_batchnorm_train(x, weight, bias, running_mean, running_var,
                      momentum: float, eps: float = 1e-5):
    """torch BN train mode over [N, F] rows (the rows are the concatenated
    VALID entries of the batch): normalize with the biased batch variance,
    update running stats with the unbiased one. Returns (y, new_mean,
    new_var) with the stats detached (torch tracks them as buffers)."""
    n = x.shape[0]
    mean = x.mean(0)
    var = ((x - mean) ** 2).mean(0)
    unbiased = var * n / max(n - 1, 1)
    y = (x - mean) / torch.sqrt(var + eps) * weight + bias
    new_mean = (1.0 - momentum) * running_mean + momentum * mean.detach()
    new_var = (1.0 - momentum) * running_var + momentum * unbiased.detach()
    return y, new_mean, new_var


def t_center_size(boxes):
    """box_utils.py:59-66 (+1 width convention)."""
    wh = boxes[..., 2:] - boxes[..., :2] + 1.0
    return torch.cat([boxes[..., :2] + 0.5 * wh, wh], -1)


def t_alternating_highway_lstm(flat_w, flat_b, x, input_size: int,
                               hidden_size: int, num_layers: int):
    """One image's [T, D] sequence through the stacked alternating LSTM
    (gate math from highway_lstm_kernel.cu:108-160; flat packed layout from
    alternating_highway_lstm.py:234-257). Slicing the flat parameter keeps
    autograd flowing back to the flat vector, exactly as the reference's
    hand-written backward accumulates into it."""
    h = hidden_size
    out = x
    w_ofs = b_ofs = 0
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else h
        w_i = flat_w[w_ofs:w_ofs + d_in * 6 * h].reshape(d_in, 6 * h)
        w_ofs += d_in * 6 * h
        w_h = flat_w[w_ofs:w_ofs + h * 5 * h].reshape(h, 5 * h)
        w_ofs += h * 5 * h
        b = flat_b[b_ofs:b_ofs + 5 * h]
        b_ofs += 5 * h
        t_len = out.shape[0]
        order = range(t_len) if layer % 2 == 0 else range(t_len - 1, -1, -1)
        hh = torch.zeros(h, dtype=F64)
        cc = torch.zeros(h, dtype=F64)
        ys: list = [None] * t_len
        for t in order:
            gi = out[t] @ w_i
            gh = hh @ w_h
            g = gi[:5 * h] + gh + b
            in_g = torch.sigmoid(g[0 * h:1 * h])
            fg_g = torch.sigmoid(g[1 * h:2 * h])
            act = torch.tanh(g[2 * h:3 * h])
            out_g = torch.sigmoid(g[3 * h:4 * h])
            r_g = torch.sigmoid(g[4 * h:5 * h])
            lin = gi[5 * h:6 * h]
            cc = fg_g * cc + in_g * act
            hh = r_g * (out_g * torch.tanh(cc)) + (1.0 - r_g) * lin
            ys[t] = hh
        out = torch.stack(ys)
    return out


def t_decoder_train(p: dict, x, labels, prefix: str = "context.decoder_rnn"):
    """Teacher-forced decoder over one image's sorted [T, D] sequence
    (decoder_rnn.py:96-131 cell, :206-212 training commits). Returns
    (logits [T, NC], commits [T] LongTensor)."""
    w_in = p[f"{prefix}.input_linearity.weight"]
    b_in = p[f"{prefix}.input_linearity.bias"]
    w_st = p[f"{prefix}.state_linearity.weight"]
    b_st = p[f"{prefix}.state_linearity.bias"]
    w_out = p[f"{prefix}.out.weight"]
    b_out = p[f"{prefix}.out.bias"]
    embed = p[f"{prefix}.obj_embed.weight"]

    hid = w_st.shape[1]
    t_len = x.shape[0]
    h = torch.zeros(hid, dtype=F64)
    c = torch.zeros(hid, dtype=F64)
    prev_e = embed[0]
    logits: list = []
    commits: list = []
    for t in range(t_len):
        inp = torch.cat([x[t], prev_e])
        pi = w_in @ inp + b_in
        ps = w_st @ h + b_st
        in_g = torch.sigmoid(pi[0 * hid:1 * hid] + ps[0 * hid:1 * hid])
        fg_g = torch.sigmoid(pi[1 * hid:2 * hid] + ps[1 * hid:2 * hid])
        act = torch.tanh(pi[2 * hid:3 * hid] + ps[2 * hid:3 * hid])
        out_g = torch.sigmoid(pi[3 * hid:4 * hid] + ps[3 * hid:4 * hid])
        r_g = torch.sigmoid(pi[4 * hid:5 * hid] + ps[4 * hid:5 * hid])
        lin = pi[5 * hid:6 * hid]
        c = in_g * act + fg_g * c
        h_t = out_g * torch.tanh(c)
        h = r_g * h_t + (1.0 - r_g) * lin
        pred = w_out @ h + b_out
        logits.append(pred)
        nonbg = int(torch.argmax(pred[1:]).item()) + 1
        commit = int(labels[t]) if int(labels[t]) > 0 else nonbg
        commits.append(commit)
        prev_e = embed[commit + 1]
    return torch.stack(logits), torch.tensor(commits, dtype=torch.long)


def t_sort_order(order: str, boxes):
    """Within-image linearization perm, descending (rel_model.py:139-161).
    Only the box-based orders are needed for training parity."""
    cs = t_center_size(boxes)
    if order == "leftright":
        scores = cs[:, 0] / (cs[:, 0].max() + 1)
    elif order == "size":
        sizes = cs[:, 2] * cs[:, 3]
        scores = sizes / (sizes.max() + 1)
    else:
        raise ValueError(order)
    return torch.argsort(-scores, stable=True)


def t_union_conv_train(p: dict, masks):
    """Union-mask conv net in TRAIN mode (get_union_boxes.py:31-39):
    conv7x7/2 -> ReLU -> BN(train) -> maxpool3/2 -> conv3x3 -> ReLU ->
    BN(train). masks [P, 2, 27, 27] over the concatenated VALID pairs of
    the batch. Returns (out [P, C, 7, 7], {stat_key: updated_value})."""
    stats = {}
    x = F.conv2d(masks, p["union_boxes.conv.0.weight"],
                 p["union_boxes.conv.0.bias"], stride=2, padding=3)
    x = torch.relu(x)

    def bn2d(x, idx, momentum):
        n, c, hh, ww = x.shape
        flat = x.permute(0, 2, 3, 1).reshape(-1, c)
        y, m, v = t_batchnorm_train(
            flat, p[f"union_boxes.conv.{idx}.weight"],
            p[f"union_boxes.conv.{idx}.bias"],
            p[f"union_boxes.conv.{idx}.running_mean"],
            p[f"union_boxes.conv.{idx}.running_var"], momentum)
        stats[f"union_boxes.conv.{idx}.running_mean"] = m
        stats[f"union_boxes.conv.{idx}.running_var"] = v
        return y.reshape(n, hh, ww, c).permute(0, 3, 1, 2)

    x = bn2d(x, 2, momentum=0.01)          # BATCHNORM_MOMENTUM (config.py:57)
    x = F.max_pool2d(x, 3, 2, padding=1)
    x = F.conv2d(x, p["union_boxes.conv.4.weight"],
                 p["union_boxes.conv.4.bias"], padding=1)
    x = torch.relu(x)
    x = bn2d(x, 6, momentum=0.01)
    return x, stats


def oracle_train_step(sd: dict, *, boxes: list,
                      det_logits: list, obj_labels: list, pairs: list,
                      upool: list, obj_pool: list, order: str,
                      nl_obj: int, nl_edge: int, hidden_dim: int,
                      obj_dim: int, embed_dim: int, pooling_dim: int,
                      num_classes: int, union_masks: list,
                      use_tanh: bool = False, limit_vision: bool = False):
    """One full reference train step (sgcls or sgdet semantics — the caller
    supplies the detector-side constants, which are frozen either way).

    Per-image inputs (lists of numpy arrays over the batch):
      boxes [N_i, 4], det_logits [N_i, NC] (frozen score_fc logits),
      obj_labels [N_i] (GT classes / IoU-assigned, 0 = bg in sgdet),
      pairs [P_i, 3] (sub, obj, predicate-label) VALID sampled pairs,
      upool [P_i, 512, 7, 7] union RoI pools (constant: detached fmap),
      obj_pool [N_i, 25088] object RoI pools flattened torch-order
      (constant), union_masks [P_i, 2, 27, 27] rasterized pair masks
      (constant: GT/detected boxes).

    Returns dict with losses, per-parameter grads (reference layout, zeros
    for no-grad leaves) and the updated BN running stats.
    """
    p = make_params(sd)
    b = len(boxes)

    # ---- position embed: BN over the batch concat (rel_model.py:103-108,
    # applied to all images' rois at once), momentum 0.01/10
    all_boxes = torch.cat([torch.tensor(bx, dtype=F64) for bx in boxes])
    cs = t_center_size(all_boxes)
    pos_bn, pm, pv = t_batchnorm_train(
        cs, p["context.pos_embed.0.weight"], p["context.pos_embed.0.bias"],
        p["context.pos_embed.0.running_mean"],
        p["context.pos_embed.0.running_var"], momentum=0.001)
    new_stats = {"context.pos_embed.0.running_mean": pm,
                 "context.pos_embed.0.running_var": pv}
    pos_all = torch.relu(t_linear(p, "context.pos_embed.1", pos_bn))

    # ---- per-image context -> decoder logits + edge ctx
    dec_logits: list = []
    edge_ctxs: list = []
    commits_all: list = []
    ofs = 0
    for i in range(b):
        n = boxes[i].shape[0]
        logits_c = torch.tensor(det_logits[i], dtype=F64)     # frozen
        soft = torch.softmax(logits_c, -1)
        obj_embed = soft @ p["context.obj_embed.weight"]
        obj_fmap = t_obj_tower(p, torch.tensor(obj_pool[i], dtype=F64))
        pre_rep = torch.cat([obj_fmap, obj_embed, pos_all[ofs:ofs + n]], -1)
        ofs += n

        bx = torch.tensor(boxes[i], dtype=F64)
        perm = t_sort_order(order, bx)
        inv_perm = torch.argsort(perm)
        inp = pre_rep[perm]
        enc = t_alternating_highway_lstm(
            p["context.obj_ctx_rnn.weight"], p["context.obj_ctx_rnn.bias"],
            inp, obj_dim + embed_dim + 128, hidden_dim, nl_obj)
        labels_i = torch.tensor(obj_labels[i], dtype=torch.long)
        logits_s, commits_s = t_decoder_train(p, enc, labels_i[perm])
        dec_logits.append(logits_s[inv_perm])
        commits = commits_s[inv_perm]
        commits_all.append(commits)

        # edge ctx (rel_model.py:171-195): embed2[commit] cat obj_ctx,
        # re-sorted by the box order (leftright/size paths)
        embed2 = p["context.obj_embed2.weight"][commits]
        e_inp = torch.cat([embed2, enc[inv_perm]], -1)
        perm_e = t_sort_order(order, bx)
        inv_e = torch.argsort(perm_e)
        e_out = t_alternating_highway_lstm(
            p["context.edge_ctx_rnn.weight"], p["context.edge_ctx_rnn.bias"],
            e_inp[perm_e], embed_dim + hidden_dim, hidden_dim, nl_edge)
        edge_ctxs.append(e_out[inv_e])

    # ---- union visual features over concatenated valid pairs
    all_masks = torch.tensor(np.concatenate(union_masks), dtype=F64)
    uconv, u_stats = t_union_conv_train(p, all_masks)
    new_stats.update(u_stats)
    all_upool = torch.tensor(np.concatenate(upool), dtype=F64)
    u = (all_upool + uconv).reshape(all_upool.shape[0], -1)
    vr_all = t_union_tower(p, u)

    # ---- rel head per image (rel_model.py:500-547)
    rel_logits: list = []
    rel_labels: list = []
    ofs = 0
    for i in range(b):
        pr = torch.tensor(pairs[i][:, :2], dtype=torch.long)
        n_p = pr.shape[0]
        edge_rep = t_linear(p, "post_lstm", edge_ctxs[i]).reshape(
            -1, 2, pooling_dim)
        prod = edge_rep[:, 0][pr[:, 0]] * edge_rep[:, 1][pr[:, 1]]
        vr = vr_all[ofs:ofs + n_p]
        ofs += n_p
        if limit_vision:
            prod = torch.cat([prod[:, :2048] * vr[:, :2048], prod[:, 2048:]], 1)
        else:
            prod = prod * vr
        if use_tanh:
            prod = torch.tanh(prod)
        rd = t_linear(p, "rel_compress", prod)
        idx = commits_all[i][pr[:, 0]] * num_classes + commits_all[i][pr[:, 1]]
        rd = rd + p["freq_bias.obj_baseline.weight"][idx]
        rel_logits.append(rd)
        rel_labels.append(torch.tensor(pairs[i][:, 2], dtype=torch.long))

    # ---- losses (train_rels.py:140-153): plain means over the batch concat
    class_loss = F.cross_entropy(torch.cat(dec_logits),
                                 torch.cat([torch.tensor(l, dtype=torch.long)
                                            for l in obj_labels]))
    rel_loss = F.cross_entropy(torch.cat(rel_logits), torch.cat(rel_labels))
    total = class_loss + rel_loss
    total.backward()

    grads = {}
    for k, v in p.items():
        if v.grad is not None:
            grads[k] = v.grad.numpy()
        else:
            grads[k] = np.zeros(v.shape, np.float64)
    return {
        "class_loss": float(class_loss.detach()),
        "rel_loss": float(rel_loss.detach()),
        "total": float(total.detach()), "grads": grads,
        "new_stats": {k: v.detach().numpy() for k, v in new_stats.items()},
    }
