"""Reference-checkpoint import completeness: fabricate a torch state dict
with the reference model's exact key names/shapes (canonical MotifNet
topology: hidden 512, nl_obj 2, nl_edge 4, pooling 4096) and check it maps
onto our full param tree (shapes obtained via jax.eval_shape — no FLOPs)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from neural_motifs_tpu import config as C
from neural_motifs_tpu.models.rel_model import RelModel
from neural_motifs_tpu.training.checkpoint import (import_reference_rel_model,
                                                   optimistic_restore,
                                                   stage_transfer_fc)

HID, OBJ, EMB, POOL = 512, 4096, 200, 4096
NC, NP = C.VG_NUM_CLASSES, C.VG_NUM_PREDICATES
_VGG_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_SHAPES = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
               (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]


def fabricate_reference_sd(rng):
    sd = {}
    # float32 Generator: legacy RandomState.randn on the 25088x4096 towers
    # costs ~2 min of float64 sampling on a 1-core host
    gen = np.random.default_rng(int(rng.randint(1 << 31)))

    def _rn(*shape):
        return gen.standard_normal(shape, dtype=np.float32)
    rng = type("R", (), {"randn": staticmethod(_rn)})()

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    for idx, (o, i) in zip(_VGG_IDX, _VGG_SHAPES):
        conv(f"detector.features.{idx}", o, i, 3)
    lin("detector.roi_fmap.0", 4096, 25088)
    lin("detector.roi_fmap.3", 4096, 4096)
    lin("detector.score_fc", NC, 4096)
    lin("detector.bbox_fc", NC * 4, 4096)
    conv("detector.rpn_head.conv.0", 512, 512, 3)
    conv("detector.rpn_head.conv.2", 20 * 6, 512, 1)

    lin("roi_fmap.1.0", 4096, 25088)
    lin("roi_fmap.1.3", 4096, 4096)
    lin("roi_fmap_obj.0", 4096, 25088)
    lin("roi_fmap_obj.3", 4096, 4096)

    sd["context.obj_embed.weight"] = rng.randn(NC, EMB).astype(np.float32)
    sd["context.obj_embed2.weight"] = rng.randn(NC, EMB).astype(np.float32)
    sd["context.pos_embed.0.weight"] = rng.randn(4).astype(np.float32)
    sd["context.pos_embed.0.bias"] = rng.randn(4).astype(np.float32)
    sd["context.pos_embed.0.running_mean"] = rng.randn(4).astype(np.float32) * 100
    sd["context.pos_embed.0.running_var"] = np.abs(rng.randn(4)).astype(np.float32) * 50
    lin("context.pos_embed.1", 128, 4)

    def lstm_flat(name, d_in, layers):
        n = 0
        for l in range(layers):
            di = d_in if l == 0 else HID
            n += di * 6 * HID + HID * 5 * HID
        sd[f"{name}.weight"] = rng.randn(n).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(layers * 5 * HID).astype(np.float32)

    lstm_flat("context.obj_ctx_rnn", OBJ + EMB + 128, 2)
    lstm_flat("context.edge_ctx_rnn", EMB + HID, 4)
    sd["context.decoder_rnn.obj_embed.weight"] = rng.randn(NC + 1, 100).astype(np.float32)
    lin("context.decoder_rnn.input_linearity", 6 * HID, HID + 100)
    lin("context.decoder_rnn.state_linearity", 5 * HID, HID)
    lin("context.decoder_rnn.out", NC, HID)

    conv("union_boxes.conv.0", 256, 2, 7)
    sd["union_boxes.conv.2.weight"] = rng.randn(256).astype(np.float32)
    sd["union_boxes.conv.2.bias"] = rng.randn(256).astype(np.float32)
    sd["union_boxes.conv.2.running_mean"] = rng.randn(256).astype(np.float32)
    sd["union_boxes.conv.2.running_var"] = np.abs(rng.randn(256)).astype(np.float32)
    conv("union_boxes.conv.4", 512, 256, 3)
    sd["union_boxes.conv.6.weight"] = rng.randn(512).astype(np.float32)
    sd["union_boxes.conv.6.bias"] = rng.randn(512).astype(np.float32)
    sd["union_boxes.conv.6.running_mean"] = rng.randn(512).astype(np.float32)
    sd["union_boxes.conv.6.running_var"] = np.abs(rng.randn(512)).astype(np.float32)

    lin("post_lstm", POOL * 2, HID)
    lin("rel_compress", NP, POOL)
    sd["freq_bias.obj_baseline.weight"] = rng.randn(NC * NC, NP).astype(np.float32)
    return sd


def canonical_model():
    r = np.random.RandomState(0)
    return RelModel(
        num_classes=NC, num_rels=NP, mode="sgdet", hidden_dim=HID,
        pooling_dim=POOL, obj_dim=OBJ, embed_dim=EMB, nl_obj=2, nl_edge=4,
        order="leftright", use_bias=True, use_tanh=False, limit_vision=False,
        pass_in_obj_feats_to_decoder=False, pass_in_obj_feats_to_edge=False,
        dtype=jnp.float32,
        embed_vecs=r.randn(NC, EMB).astype(np.float32),
        decoder_embed_vecs=r.randn(NC + 1, 100).astype(np.float32),
        freq_table=r.randn(NC * NC, NP).astype(np.float32))


def test_reference_import_covers_param_tree(rng):
    model = canonical_model()
    b, g, r_ = 1, 8, 8
    kw = dict(images=jnp.zeros((b, 64, 64, 3)), im_hw=jnp.full((b, 2), 64.0),
              gt_boxes=jnp.zeros((b, g, 4)), gt_classes=jnp.zeros((b, g), jnp.int32),
              gt_mask=jnp.zeros((b, g), bool),
              gt_rels=jnp.zeros((b, r_, 3), jnp.int32),
              gt_rel_mask=jnp.zeros((b, r_), bool))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(lambda: model.init(rngs, train=True, **kw))
    param_shapes = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), shapes["params"])
    stat_shapes = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), shapes["batch_stats"])

    sd = fabricate_reference_sd(rng)
    imported, imported_stats = import_reference_rel_model(
        sd, hidden_dim=HID, obj_dim=OBJ, embed_dim=EMB, nl_obj=2, nl_edge=4,
        pooling_dim=POOL, pass_in_obj_feats_to_decoder=False,
        pass_in_obj_feats_to_edge=False)
    merged = optimistic_restore(param_shapes, imported, verbose=False)

    # BN running stats must land on batch_stats leaves (VERDICT r1 #2: the
    # trained pos_bn running mean/var are far from init and parity dies
    # without them)
    flat_stats_tgt = flatten_dict(stat_shapes, sep="/")
    flat_stats_got = flatten_dict(imported_stats, sep="/")
    for key in ("context/pos_bn/mean", "context/pos_bn/var",
                "union_boxes/BatchNorm_0/mean", "union_boxes/BatchNorm_0/var",
                "union_boxes/BatchNorm_1/mean", "union_boxes/BatchNorm_1/var"):
        assert key in flat_stats_got, f"missing imported stat {key}"
        assert key in flat_stats_tgt, f"model has no batch_stats leaf {key}"
        assert (tuple(np.shape(flat_stats_got[key]))
                == tuple(flat_stats_tgt[key].shape))
    np.testing.assert_array_equal(flat_stats_got["context/pos_bn/mean"],
                                  sd["context.pos_embed.0.running_mean"])

    flat_target = flatten_dict(param_shapes, sep="/")
    flat_import = flatten_dict(imported, sep="/")
    # every imported leaf must land on a shape-matching target leaf
    unmatched = [k for k, v in flat_import.items()
                 if k not in flat_target or
                 tuple(np.shape(v)) != tuple(flat_target[k].shape)]
    assert unmatched == [], f"importer produced unmapped keys: {unmatched}"
    # coverage: the big submodules are fully mapped
    for prefix in ("detector/", "roi_fmap/", "roi_fmap_obj/", "context/",
                   "union_boxes/", "post_lstm/", "rel_compress/"):
        tgt = [k for k in flat_target if k.startswith(prefix)]
        got = [k for k in tgt if k in flat_import]
        missing = set(tgt) - set(got)
        # pos_bn running stats live in batch_stats, not params; everything
        # else under these prefixes must be imported
        assert not missing, f"{prefix}: missing {sorted(missing)}"
    covered = sum(1 for k in flat_target if k in flat_import)
    assert covered / len(flat_target) > 0.95


def test_stage_transfer_fc(rng):
    sd = {"roi_fmap.0.weight": rng.randn(4096, 25088).astype(np.float32),
          "roi_fmap.0.bias": rng.randn(4096).astype(np.float32),
          "roi_fmap.3.weight": rng.randn(4096, 4096).astype(np.float32),
          "roi_fmap.3.bias": rng.randn(4096).astype(np.float32)}
    out = stage_transfer_fc({}, sd)
    assert out["roi_fmap"]["fc0"]["kernel"].shape == (25088, 4096)
    np.testing.assert_array_equal(out["roi_fmap"]["fc1"]["kernel"],
                                  out["roi_fmap_obj"]["fc1"]["kernel"])
