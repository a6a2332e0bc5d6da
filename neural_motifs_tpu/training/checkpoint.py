"""Checkpointing: msgpack save/load, optimistic partial restore, and the
PyTorch-checkpoint importer for parity against the released reference
weights.

Replaces the reference's torch.save-per-epoch + filename-sniffing weight
surgery (models/train_rels.py:75-95, lib/pytorch_misc.py:14-33) with an
explicit param-tree remapper:

  * save/load: flax msgpack of {params, batch_stats, step}
  * optimistic_restore: copy leaves whose path+shape match, report the rest
  * import_torchvision_vgg16 / import_reference_checkpoint: convert torch
    tensors (OIHW conv, [out,in] linear, CHW-flatten fc0) into our
    NHWC/HWIO pytree
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, state, extra: dict | None = None,
                    with_opt: bool = True, sched=None):
    """Save params + batch_stats + (by default) the FULL optimizer state and
    plateau-scheduler state, so training resumes exactly where it stopped —
    the reference never checkpoints optimizer state (train_rels.py:200
    comments it out) and cannot resume mid-schedule."""
    payload = {
        "step": int(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    if with_opt and getattr(state, "opt_state", None) is not None:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(state.opt_state))
    if sched is not None:
        payload["sched"] = sched.state_dict()
    if extra:
        payload.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_train_state(payload: dict, state, sched=None):
    """Exact-resume: restore params/batch_stats/step and — when present —
    the optimizer state (momentum + injected lr scale) and scheduler. The
    current state's opt_state acts as the structure template."""
    import jax.numpy as jnp

    new = state.replace(
        params=optimistic_restore(state.params, payload["params"]),
        batch_stats=optimistic_restore(state.batch_stats,
                                       payload.get("batch_stats") or {}),
        step=jnp.asarray(payload.get("step", 0), jnp.int32))
    if payload.get("opt_state") is not None:
        new = new.replace(opt_state=serialization.from_state_dict(
            state.opt_state, payload["opt_state"]))
    if sched is not None and payload.get("sched") is not None:
        sched.load_state_dict(payload["sched"])
    return new


def restore_rel_variables(cfg, params, batch_stats):
    """Shared `-ckpt` restore for the rel-model entry points (eval_rels,
    tools/predict): a reference vgrel `.tar/.pth/.pt` goes through the torch
    importer, anything else through the native msgpack loader; both merge
    via optimistic_restore. Returns (params, batch_stats)."""
    if not cfg.ckpt:
        return params, batch_stats
    if cfg.ckpt.endswith((".tar", ".pth", ".pt")):
        loaded, loaded_stats = import_reference_rel_model(
            cfg.ckpt, hidden_dim=cfg.hidden_dim, obj_dim=cfg.obj_dim,
            embed_dim=cfg.embed_dim, nl_obj=cfg.nl_obj, nl_edge=cfg.nl_edge,
            pooling_dim=cfg.pooling_dim,
            pass_in_obj_feats_to_decoder=cfg.pass_in_obj_feats_to_decoder,
            pass_in_obj_feats_to_edge=cfg.pass_in_obj_feats_to_edge)
        batch_stats = optimistic_restore(batch_stats, loaded_stats)
    else:
        payload = load_checkpoint(cfg.ckpt)
        loaded = payload["params"]
        if payload.get("batch_stats"):
            batch_stats = optimistic_restore(batch_stats,
                                             payload["batch_stats"])
    params = optimistic_restore(params, loaded)
    return params, batch_stats


def optimistic_restore(params: Any, loaded: Any, verbose: bool = True) -> Any:
    """Copy name+shape-matching leaves from `loaded` into `params`
    (semantics of reference optimistic_restore, pytorch_misc.py:14-33)."""
    flat_p = flatten_dict(jax.device_get(params), sep="/")
    flat_l = flatten_dict(loaded, sep="/")
    out = {}
    n_copied = 0
    for k, v in flat_p.items():
        if k in flat_l and tuple(np.shape(flat_l[k])) == tuple(np.shape(v)):
            out[k] = jnp.asarray(flat_l[k])
            n_copied += 1
        else:
            out[k] = v
            if verbose and k in flat_l:
                print(f"optimistic_restore: shape mismatch at {k}: "
                      f"{np.shape(flat_l[k])} vs {np.shape(v)}")
            elif verbose:
                print(f"optimistic_restore: missing {k}")
    if verbose:
        extra = set(flat_l) - set(flat_p)
        for k in sorted(extra):
            print(f"optimistic_restore: unused checkpoint key {k}")
        print(f"optimistic_restore: copied {n_copied}/{len(flat_p)} leaves")
    return unflatten_dict(out, sep="/")


# ---------------------------------------------------------------------------
# Torch importers
# ---------------------------------------------------------------------------

def _conv_t(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin_t(w) -> np.ndarray:
    """torch linear [out, in] -> flax [in, out]."""
    return np.transpose(np.asarray(w), (1, 0))


def _fc0_t(w, channels: int = 512, pool: int = 7) -> np.ndarray:
    """First fc after RoI pooling: torch flattens (C, H, W); we flatten
    (H, W, C). Reorder the input dim accordingly."""
    w = np.asarray(w)                              # [out, C*H*W]
    out = w.shape[0]
    w = w.reshape(out, channels, pool, pool)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out, pool * pool * channels)
    return np.transpose(w, (1, 0))


# torchvision vgg16 'features' conv indices in order
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def import_torchvision_vgg16(state_dict: dict) -> tuple[dict, dict]:
    """torchvision vgg16 state_dict -> (features_params, classifier_params)
    for VGG16Features / VGGRoIHead."""
    feats = {}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        feats[f"Conv_{i}"] = {
            "kernel": _conv_t(state_dict[f"features.{idx}.weight"]),
            "bias": np.asarray(state_dict[f"features.{idx}.bias"]),
        }
    cls = {
        "fc0": {"kernel": _fc0_t(state_dict["classifier.0.weight"]),
                "bias": np.asarray(state_dict["classifier.0.bias"])},
        "fc1": {"kernel": _lin_t(state_dict["classifier.3.weight"]),
                "bias": np.asarray(state_dict["classifier.3.bias"])},
    }
    return feats, cls


_RESNET101_BLOCKS = {"layer1": 3, "layer2": 4, "layer3": 23, "layer4": 3}


def _bn_import(sd, prefix):
    p = {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])}
    s = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])}
    return p, s


def import_torchvision_resnet101(state_dict: dict) -> tuple[dict, dict, dict, dict]:
    """torchvision resnet101 state_dict -> flax trees for the C4 trunk
    (models/resnet.py ResNet101C4) and the layer4 RoI head (ResNetRoIHead).

    Returns (trunk_params, trunk_stats, head_params, head_stats). The
    reference's deprecated ResNet path (lib/resnet.py, lib/object_detector.
    py:84-100) loads torchvision weights the same way (resnet101
    pretrained=True with layer4 split off)."""
    def layer_tree(layer):
        params: dict = {}
        stats: dict = {}
        for b in range(_RESNET101_BLOCKS[layer]):
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv_t(
                    state_dict[f"{layer}.{b}.conv{ci}.weight"])}
                bnp, bns = _bn_import(state_dict, f"{layer}.{b}.bn{ci}")
                bp[f"bn{ci}"] = bnp
                bs[f"bn{ci}"] = bns
            if b == 0:
                bp["down_conv"] = {"kernel": _conv_t(
                    state_dict[f"{layer}.0.downsample.0.weight"])}
                bnp, bns = _bn_import(state_dict, f"{layer}.0.downsample.1")
                bp["down_bn"] = bnp
                bs["down_bn"] = bns
            params[f"block{b}"] = bp
            stats[f"block{b}"] = bs
        return params, stats

    trunk_p: dict = {"conv1": {"kernel": _conv_t(state_dict["conv1.weight"])}}
    trunk_s: dict = {}
    bnp, bns = _bn_import(state_dict, "bn1")
    trunk_p["bn1"] = bnp
    trunk_s["bn1"] = bns
    for layer in ("layer1", "layer2", "layer3"):
        lp, ls = layer_tree(layer)
        trunk_p[layer] = lp
        trunk_s[layer] = ls
    hp, hs = layer_tree("layer4")
    return trunk_p, trunk_s, {"layer4": hp}, {"layer4": hs}


def _torch_load(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def import_reference_detector(path_or_sd) -> dict:
    """Reference vg-faster-rcnn checkpoint -> ObjectDetector param subtree.

    Maps (object_detector.py naming):
      features.N.*      -> features/Conv_i
      roi_fmap.{0,3}.*  -> roi_head/fc{0,1}
      score_fc / bbox_fc
      rpn_head.conv.{0,2}.* -> rpn_head/Conv_{0,1}
    """
    sd = _torch_load(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    det = {"features": {}, "roi_head": {}, "rpn_head": {}}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        det["features"][f"Conv_{i}"] = {
            "kernel": _conv_t(sd[f"features.{idx}.weight"]),
            "bias": np.asarray(sd[f"features.{idx}.bias"])}
    det["roi_head"] = {
        "fc0": {"kernel": _fc0_t(sd["roi_fmap.0.weight"]),
                "bias": np.asarray(sd["roi_fmap.0.bias"])},
        "fc1": {"kernel": _lin_t(sd["roi_fmap.3.weight"]),
                "bias": np.asarray(sd["roi_fmap.3.bias"])},
    }
    det["score_fc"] = {"kernel": _lin_t(sd["score_fc.weight"]),
                       "bias": np.asarray(sd["score_fc.bias"])}
    det["bbox_fc"] = {"kernel": _lin_t(sd["bbox_fc.weight"]),
                      "bias": np.asarray(sd["bbox_fc.bias"])}
    det["rpn_head"] = {
        "Conv_0": {"kernel": _conv_t(sd["rpn_head.conv.0.weight"]),
                   "bias": np.asarray(sd["rpn_head.conv.0.bias"])},
        "Conv_1": {"kernel": _conv_t(sd["rpn_head.conv.2.weight"]),
                   "bias": np.asarray(sd["rpn_head.conv.2.bias"])},
    }
    return det


def _split_lstm_flat(flat_w: np.ndarray, flat_b: np.ndarray, input_size: int,
                     hidden_size: int, num_layers: int) -> list[dict]:
    """Unpack the reference AlternatingHighwayLSTM flat weight vector
    (alternating_highway_lstm.py:218-257 layout: per layer, input weights
    [d_in, 6H] then recurrent [H, 5H]; bias [5H] per layer)."""
    out = []
    h = hidden_size
    wi_ofs = 0
    b_ofs = 0
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else h
        n_wi = d_in * 6 * h
        w_i = flat_w[wi_ofs:wi_ofs + n_wi].reshape(d_in, 6 * h)
        wi_ofs += n_wi
        n_wh = h * 5 * h
        w_h = flat_w[wi_ofs:wi_ofs + n_wh].reshape(h, 5 * h)
        wi_ofs += n_wh
        bias = flat_b[b_ofs:b_ofs + 5 * h]
        b_ofs += 5 * h
        out.append({f"l{layer}_w_i": w_i, f"l{layer}_w_h": w_h,
                    f"l{layer}_bias": bias})
    return out


def _gru_import(sd: dict, prefix: str) -> dict:
    """torch nn.GRUCell -> flax nn.GRUCell param tree.

    torch packs weight_ih/weight_hh as [3H, *] with gate rows (r, z, n) and
    carries TWO bias vectors; flax splits per-gate Dense layers where the
    recurrent r/z projections have no bias (they are summed with the input
    projection, so b_hr/b_hz fold into ir/iz) and hn keeps its own bias
    (torch applies r INSIDE: n = tanh(W_in x + b_in + r*(W_hn h + b_hn)),
    exactly flax's form)."""
    w_ih = np.asarray(sd[f"{prefix}.weight_ih"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh"])
    b_ih = np.asarray(sd[f"{prefix}.bias_ih"])
    b_hh = np.asarray(sd[f"{prefix}.bias_hh"])
    h = w_hh.shape[1]
    return {
        "ir": {"kernel": w_ih[:h].T, "bias": b_ih[:h] + b_hh[:h]},
        "iz": {"kernel": w_ih[h:2 * h].T,
               "bias": b_ih[h:2 * h] + b_hh[h:2 * h]},
        "in": {"kernel": w_ih[2 * h:].T, "bias": b_ih[2 * h:]},
        "hr": {"kernel": w_hh[:h].T},
        "hz": {"kernel": w_hh[h:2 * h].T},
        "hn": {"kernel": w_hh[2 * h:].T, "bias": b_hh[2 * h:]},
    }


def import_reference_rel_model(path_or_sd, *, hidden_dim: int, obj_dim: int,
                               embed_dim: int, nl_obj: int, nl_edge: int,
                               pooling_dim: int,
                               pass_in_obj_feats_to_decoder: bool = True,
                               pass_in_obj_feats_to_edge: bool = True
                               ) -> tuple[dict, dict]:
    """Reference vgrel checkpoint -> (params, batch_stats) subtrees (best
    effort; unknown keys are reported by optimistic_restore at merge time).

    batch_stats carries the BatchNorm running mean/var of the position embed
    (rel_model.py:103-108) and the union-mask conv net
    (get_union_boxes.py:31-39) — dropping these freezes the BNs at (0, 1)
    and garbles any imported reference checkpoint."""
    sd = _torch_load(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    p: dict = {}
    stats: dict = {}

    # detector subtree
    det_sd = {k[len("detector."):]: v for k, v in sd.items()
              if k.startswith("detector.")}
    if det_sd:
        p["detector"] = import_reference_detector(det_sd)

    # rel-model towers
    if "roi_fmap.1.0.weight" in sd:
        p["roi_fmap"] = {
            "fc0": {"kernel": _fc0_t(sd["roi_fmap.1.0.weight"]),
                    "bias": np.asarray(sd["roi_fmap.1.0.bias"])},
            "fc1": {"kernel": _lin_t(sd["roi_fmap.1.3.weight"]),
                    "bias": np.asarray(sd["roi_fmap.1.3.bias"])},
        }
    if "roi_fmap_obj.0.weight" in sd:
        p["roi_fmap_obj"] = {
            "fc0": {"kernel": _fc0_t(sd["roi_fmap_obj.0.weight"]),
                    "bias": np.asarray(sd["roi_fmap_obj.0.bias"])},
            "fc1": {"kernel": _lin_t(sd["roi_fmap_obj.3.weight"]),
                    "bias": np.asarray(sd["roi_fmap_obj.3.bias"])},
        }

    ctx: dict = {}
    if "context.obj_embed.weight" in sd:
        ctx["obj_embed"] = np.asarray(sd["context.obj_embed.weight"])
        ctx["obj_embed2"] = np.asarray(sd["context.obj_embed2.weight"])
        ctx["pos_bn"] = {"scale": np.asarray(sd["context.pos_embed.0.weight"]),
                         "bias": np.asarray(sd["context.pos_embed.0.bias"])}
        ctx["pos_fc"] = {"kernel": _lin_t(sd["context.pos_embed.1.weight"]),
                         "bias": np.asarray(sd["context.pos_embed.1.bias"])}
        if "context.pos_embed.0.running_mean" in sd:
            stats["context"] = {"pos_bn": {
                "mean": np.asarray(sd["context.pos_embed.0.running_mean"]),
                "var": np.asarray(sd["context.pos_embed.0.running_var"])}}
    if nl_obj > 0 and "context.obj_ctx_rnn.weight" in sd:
        layers = _split_lstm_flat(np.asarray(sd["context.obj_ctx_rnn.weight"]),
                                  np.asarray(sd["context.obj_ctx_rnn.bias"]),
                                  obj_dim + embed_dim + 128, hidden_dim, nl_obj)
        ctx["obj_ctx_rnn"] = {k: v for d in layers for k, v in d.items()}
        dec_in = hidden_dim + ((obj_dim + embed_dim)
                               if pass_in_obj_feats_to_decoder else 0)
        ctx["decoder_rnn"] = {
            "obj_embed": np.asarray(sd["context.decoder_rnn.obj_embed.weight"]),
            "input_w": _lin_t(sd["context.decoder_rnn.input_linearity.weight"]),
            "input_b": np.asarray(sd["context.decoder_rnn.input_linearity.bias"]),
            "state_w": _lin_t(sd["context.decoder_rnn.state_linearity.weight"]),
            "state_b": np.asarray(sd["context.decoder_rnn.state_linearity.bias"]),
            "out_w": _lin_t(sd["context.decoder_rnn.out.weight"]),
            "out_b": np.asarray(sd["context.decoder_rnn.out.bias"]),
        }
    if nl_edge > 0 and "context.edge_ctx_rnn.weight" in sd:
        e_in = embed_dim + (hidden_dim if nl_obj > 0 else 0) + \
            (obj_dim if pass_in_obj_feats_to_edge else 0)
        layers = _split_lstm_flat(np.asarray(sd["context.edge_ctx_rnn.weight"]),
                                  np.asarray(sd["context.edge_ctx_rnn.bias"]),
                                  e_in, hidden_dim, nl_edge)
        ctx["edge_ctx_rnn"] = {k: v for d in layers for k, v in d.items()}
    if ctx:
        p["context"] = ctx

    # Stanford message-passing head (rel_model_stanford.py:41-58): unary
    # projections, the two GRU cells, four sigmoid gate fcs and the heads.
    # The gate fcs are Sequential(Linear, Sigmoid) in torch -> key ".0".
    if "edge_gru.weight_ih" in sd:
        p["edge_gru"] = _gru_import(sd, "edge_gru")
        p["node_gru"] = _gru_import(sd, "node_gru")
        for nm in ("obj_unary", "edge_unary", "obj_fc", "rel_fc"):
            p[nm] = {"kernel": _lin_t(sd[f"{nm}.weight"]),
                     "bias": np.asarray(sd[f"{nm}.bias"])}
        for nm in ("sub_vert_w_fc", "obj_vert_w_fc", "out_edge_w_fc",
                   "in_edge_w_fc"):
            p[nm] = {"kernel": _lin_t(sd[f"{nm}.0.weight"]),
                     "bias": np.asarray(sd[f"{nm}.0.bias"])}

    if "post_lstm.weight" in sd:
        p["post_lstm"] = {"kernel": _lin_t(sd["post_lstm.weight"]),
                          "bias": np.asarray(sd["post_lstm.bias"])}
    if "rel_compress.weight" in sd:
        p["rel_compress"] = {"kernel": _lin_t(sd["rel_compress.weight"]),
                             "bias": np.asarray(sd["rel_compress.bias"])}
    if "freq_bias.obj_baseline.weight" in sd:
        p["freq_bias"] = np.asarray(sd["freq_bias.obj_baseline.weight"])

    # union conv net (get_union_boxes.py:31-39): conv7x7, BN, conv3x3, BN
    if "union_boxes.conv.0.weight" in sd:
        p["union_boxes"] = {
            "Conv_0": {"kernel": _conv_t(sd["union_boxes.conv.0.weight"]),
                       "bias": np.asarray(sd["union_boxes.conv.0.bias"])},
            "BatchNorm_0": {"scale": np.asarray(sd["union_boxes.conv.2.weight"]),
                            "bias": np.asarray(sd["union_boxes.conv.2.bias"])},
            "Conv_1": {"kernel": _conv_t(sd["union_boxes.conv.4.weight"]),
                       "bias": np.asarray(sd["union_boxes.conv.4.bias"])},
            "BatchNorm_1": {"scale": np.asarray(sd["union_boxes.conv.6.weight"]),
                            "bias": np.asarray(sd["union_boxes.conv.6.bias"])},
        }
        if "union_boxes.conv.2.running_mean" in sd:
            stats["union_boxes"] = {
                "BatchNorm_0": {
                    "mean": np.asarray(sd["union_boxes.conv.2.running_mean"]),
                    "var": np.asarray(sd["union_boxes.conv.2.running_var"])},
                "BatchNorm_1": {
                    "mean": np.asarray(sd["union_boxes.conv.6.running_mean"]),
                    "var": np.asarray(sd["union_boxes.conv.6.running_var"])},
            }
    return p, stats


def stage_transfer_fc(rel_params: dict, det_sd: dict) -> dict:
    """The detector->rel 'weight surgery' (train_rels.py:87-95): copy the
    detector's RoI fc weights into both rel-model VGG towers."""
    fc = {
        "fc0": {"kernel": _fc0_t(det_sd["roi_fmap.0.weight"]),
                "bias": np.asarray(det_sd["roi_fmap.0.bias"])},
        "fc1": {"kernel": _lin_t(det_sd["roi_fmap.3.weight"]),
                "bias": np.asarray(det_sd["roi_fmap.3.bias"])},
    }
    out = dict(rel_params)
    out["roi_fmap"] = {**rel_params.get("roi_fmap", {}), **fc}
    out["roi_fmap_obj"] = {**rel_params.get("roi_fmap_obj", {}), **fc}
    return out
