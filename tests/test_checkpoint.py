"""Checkpointing: save/load round-trip, optimistic restore semantics, and
torch-checkpoint import transposes (using fabricated torch state dicts)."""

import numpy as np
import pytest

from neural_motifs_tpu.training import checkpoint as ck


def test_optimistic_restore_merges_matching():
    params = {"a": {"w": np.zeros((3, 4)), "b": np.zeros(4)},
              "c": {"w": np.zeros((2, 2))}}
    loaded = {"a": {"w": np.ones((3, 4)), "b": np.ones(5)},  # b mismatched
              "d": {"x": np.ones(1)}}                        # extra
    out = ck.optimistic_restore(params, loaded, verbose=False)
    assert np.all(np.asarray(out["a"]["w"]) == 1)
    assert np.all(np.asarray(out["a"]["b"]) == 0)
    assert np.all(np.asarray(out["c"]["w"]) == 0)


def test_conv_and_linear_transposes():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)  # OIHW
    hwio = ck._conv_t(w)
    assert hwio.shape == (5, 7, 3, 2)
    assert hwio[1, 2, 0, 1] == w[1, 0, 1, 2]
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert ck._lin_t(lin).shape == (3, 2)


def test_fc0_flatten_order():
    """torch fc0 consumes (C, H, W) flat; ours consumes (H, W, C) flat. A
    feature that lives at (c, h, w) must map through both identically."""
    c, p = 3, 2
    out_dim = 4
    rng = np.random.RandomState(0)
    w_torch = rng.randn(out_dim, c * p * p).astype(np.float32)
    feat = rng.randn(c, p, p).astype(np.float32)   # torch CHW layout
    torch_out = w_torch @ feat.reshape(-1)

    ours_w = ck._fc0_t(w_torch, channels=c, pool=p)     # [p*p*c, out]
    feat_hwc = np.transpose(feat, (1, 2, 0)).reshape(-1)
    ours_out = feat_hwc @ ours_w
    np.testing.assert_allclose(ours_out, torch_out, rtol=1e-5)


def test_import_torchvision_vgg16_shapes():
    sd = {}
    idx = ck._VGG16_CONV_IDX
    shapes = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
              (256, 256), (512, 256), (512, 512), (512, 512), (512, 512),
              (512, 512), (512, 512)]
    for i, (o, ic) in zip(idx, shapes):
        sd[f"features.{i}.weight"] = np.zeros((o, ic, 3, 3), np.float32)
        sd[f"features.{i}.bias"] = np.zeros(o, np.float32)
    sd["classifier.0.weight"] = np.zeros((4096, 25088), np.float32)
    sd["classifier.0.bias"] = np.zeros(4096, np.float32)
    sd["classifier.3.weight"] = np.zeros((4096, 4096), np.float32)
    sd["classifier.3.bias"] = np.zeros(4096, np.float32)
    feats, cls = ck.import_torchvision_vgg16(sd)
    assert feats["Conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert feats["Conv_12"]["kernel"].shape == (3, 3, 512, 512)
    assert cls["fc0"]["kernel"].shape == (25088, 4096)


def test_lstm_flat_split_roundtrip():
    h, d_in, layers = 4, 6, 2
    rng = np.random.RandomState(1)
    sizes = []
    flat = []
    for l in range(layers):
        di = d_in if l == 0 else h
        wi = rng.randn(di, 6 * h).astype(np.float32)
        wh = rng.randn(h, 5 * h).astype(np.float32)
        flat += [wi.ravel(), wh.ravel()]
        sizes.append((wi, wh))
    flat_w = np.concatenate(flat)
    flat_b = rng.randn(layers * 5 * h).astype(np.float32)
    out = ck._split_lstm_flat(flat_w, flat_b, d_in, h, layers)
    for l in range(layers):
        np.testing.assert_array_equal(out[l][f"l{l}_w_i"], sizes[l][0])
        np.testing.assert_array_equal(out[l][f"l{l}_w_h"], sizes[l][1])
        np.testing.assert_array_equal(out[l][f"l{l}_bias"],
                                      flat_b[l * 5 * h:(l + 1) * 5 * h])


def test_save_load_roundtrip(tmp_path):
    from flax import struct

    class S(struct.PyTreeNode):
        step: int
        params: dict
        batch_stats: dict

    state = S(step=3, params={"w": np.arange(6.0).reshape(2, 3)},
              batch_stats={"m": np.ones(2)})
    path = str(tmp_path / "ck.mp")
    ck.save_checkpoint(path, state)
    loaded = ck.load_checkpoint(path)
    assert loaded["step"] == 3
    np.testing.assert_array_equal(loaded["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
