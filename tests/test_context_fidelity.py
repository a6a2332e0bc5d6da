"""Fidelity regression tests for the round-1 findings:

* DecoderRNN._nms_decode must not clobber commits once all valid boxes are
  consumed (the padded fori_loop runs T times but the reference loop,
  decoder_rnn.py:241, runs exactly N=#valid times).
* The leave-one-out NMS decode must match a numpy transcription of
  reference decoder_rnn.py:229-247.
* MaskedBatchNorm must match torch.nn.BatchNorm1d on the valid rows
  (training batch stats, running-stat updates with unbiased variance, eval
  running-average normalization) — the reference pos_embed BN
  (rel_model.py:103-108).
* set_lr_scale must lower the effective lr while PRESERVING SGD momentum
  (torch ReduceLROnPlateau semantics; reference models/train_rels.py:68).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_motifs_tpu.models.context import DecoderRNN, MaskedBatchNorm
from neural_motifs_tpu.ops.boxes import nms_overlaps
from neural_motifs_tpu.training.train_state import make_optimizer, set_lr_scale


def _decoder(nc):
    return DecoderRNN(num_classes=nc, inputs_dim=8, hidden_dim=8,
                      embed_vecs=np.zeros((nc + 1, 4), np.float32))


def _np_loo_nms_decode(probs, is_overlap):
    """Numpy transcription of the reference global leave-one-out NMS decode
    (decoder_rnn.py:229-247): N iterations; each picks the global (box,
    class) argmax, zeroes the same class on overlapping boxes, and marks the
    chosen box -1 so it is never revisited."""
    p = probs.copy()
    p[:, 0] = 0.0
    out = np.zeros(p.shape[0], np.int64)
    for _ in range(p.shape[0]):
        box_ind, cls_ind = np.unravel_index(p.argmax(), p.shape)
        out[int(box_ind)] = int(cls_ind)
        p[is_overlap[box_ind, :, cls_ind], cls_ind] = 0.0
        p[box_ind] = -1.0
    return out


def _random_nms_case(rng, n_valid, t, nc):
    logits = rng.randn(1, t, nc).astype(np.float32)
    mask = np.zeros((1, t), bool)
    mask[0, :n_valid] = True
    # per-class boxes with deliberate heavy overlap so suppression fires
    base = rng.uniform(0, 80, (t, 1, 2)).astype(np.float32)
    wh = rng.uniform(20, 60, (t, 1, 2)).astype(np.float32)
    jitter = rng.uniform(-4, 4, (t, nc, 4)).astype(np.float32)
    boxes = np.concatenate([base, base + wh], -1) + jitter
    boxes = np.abs(boxes)
    boxes[..., 2:] = boxes[..., :2] + np.abs(boxes[..., 2:] - boxes[..., :2]) + 1
    return logits, mask, boxes[None]


def test_nms_decode_exhaustion_guard():
    """ADVICE r1 (high): with n_valid < T the top-confidence box used to be
    overwritten with class 0 once the loop exhausted all valid boxes."""
    nc, t, n_valid = 5, 8, 3
    rng = np.random.RandomState(1)
    logits = np.full((1, t, nc), -5.0, np.float32)
    # box 0 should be committed to class 3 with very high confidence
    logits[0, 0, 3] = 10.0
    logits[0, 1, 2] = 5.0
    logits[0, 2, 1] = 4.0
    mask = np.zeros((1, t), bool)
    mask[0, :n_valid] = True
    # boxes far apart: no suppression
    boxes = np.zeros((1, t, nc, 4), np.float32)
    for i in range(t):
        boxes[0, i, :, 0] = i * 200.0
        boxes[0, i, :, 1] = 0.0
        boxes[0, i, :, 2] = i * 200.0 + 50.0
        boxes[0, i, :, 3] = 50.0
    dec = _decoder(nc)
    commits = np.asarray(dec._nms_decode(jnp.asarray(logits), jnp.asarray(mask),
                                         jnp.asarray(boxes)))
    assert commits[0, 0] == 3, f"commits[0] clobbered: {commits[0]}"
    assert commits[0, 1] == 2
    assert commits[0, 2] == 1
    assert np.all(commits[0, n_valid:] == 0)


@pytest.mark.parametrize("n_valid,t", [(6, 6), (5, 9), (1, 4), (10, 16)])
def test_nms_decode_matches_reference_oracle(rng, n_valid, t):
    nc = 7
    logits, mask, boxes = _random_nms_case(rng, n_valid, t, nc)
    dec = _decoder(nc)
    commits = np.asarray(dec._nms_decode(jnp.asarray(logits), jnp.asarray(mask),
                                         jnp.asarray(boxes)))
    # oracle operates on the valid sub-problem (the reference never pads)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[0, :n_valid]), -1))
    iov = np.asarray(nms_overlaps(jnp.asarray(boxes[:, :n_valid]))[0]) >= 0.3
    expect = _np_loo_nms_decode(probs, iov)
    np.testing.assert_array_equal(commits[0, :n_valid], expect)
    np.testing.assert_array_equal(commits[0, n_valid:], 0)


def test_masked_batchnorm_matches_torch(rng):
    import torch

    feat, n_valid, t, b = 4, 11, 8, 2
    x = (rng.randn(b, t, feat) * 30 + 100).astype(np.float32)
    mask = np.zeros((b, t), bool)
    mask.reshape(-1)[:n_valid] = True

    tbn = torch.nn.BatchNorm1d(feat, momentum=0.001)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.randn(feat), dtype=torch.float32))
        tbn.bias.copy_(torch.tensor(rng.randn(feat), dtype=torch.float32))

    mbn = MaskedBatchNorm(momentum=1.0 - 0.001)
    variables = mbn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(mask), use_running_average=False)
    params = {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
    }
    stats = variables["batch_stats"]

    # two training steps (running stats accumulate)
    for step in range(2):
        xs = x + step * 3.0
        tbn.train()
        t_out = tbn(torch.tensor(xs.reshape(-1, feat)[mask.reshape(-1)])).detach().numpy()
        j_out, mut = mbn.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(xs), jnp.asarray(mask),
                               use_running_average=False,
                               mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(j_out).reshape(-1, feat)[mask.reshape(-1)], t_out,
            rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval: running-average normalization
    tbn.eval()
    t_out = tbn(torch.tensor(x.reshape(-1, feat)[mask.reshape(-1)])).detach().numpy()
    j_out = mbn.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                      jnp.asarray(mask), use_running_average=True)
    np.testing.assert_allclose(
        np.asarray(j_out).reshape(-1, feat)[mask.reshape(-1)], t_out,
        rtol=1e-4, atol=1e-4)


def test_union_mask_bn_ignores_padded_pairs(rng):
    """The union-mask conv BNs (reference get_union_boxes.py:31-39 sees only
    real pairs) must not let padded/invalid pairs move the training batch
    statistics: swapping garbage content in the invalid pair slots must leave
    updated running stats (and valid-pair outputs) bitwise unchanged."""
    from neural_motifs_tpu.models.rel_model import UnionBoxesAndFeats

    b, o, p, hw, cf = 1, 4, 6, 16, 16   # cf == conv dim (pools + mask-conv sum)
    fmap = jnp.asarray(rng.randn(b, hw, hw, cf).astype(np.float32))
    boxes = np.zeros((b, o, 4), np.float32)
    for i in range(o):
        boxes[0, i] = [10 * i, 5 * i, 10 * i + 40, 5 * i + 30]
    boxes = jnp.asarray(boxes)
    sub = np.array([[0, 1, 2, 0, 0, 0]], np.int32)
    obj = np.array([[1, 2, 3, 0, 0, 0]], np.int32)
    valid = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0]], bool))

    # variant: same valid pairs, different garbage in the padded slots
    sub2 = sub.copy()
    obj2 = obj.copy()
    sub2[0, 3:] = [3, 2, 1]
    obj2[0, 3:] = [0, 0, 3]

    mod = UnionBoxesAndFeats(pooling_size=7, dim=16, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), fmap, boxes,
                         jnp.asarray(sub), jnp.asarray(obj), valid, train=False)

    def run(s, ob):
        out, mut = mod.apply(variables, fmap, boxes, jnp.asarray(s),
                             jnp.asarray(ob), valid, train=True,
                             mutable=["batch_stats"])
        return np.asarray(out), jax.device_get(mut["batch_stats"])

    out1, stats1 = run(sub, obj)
    out2, stats2 = run(sub2, obj2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, stats1, stats2)
    np.testing.assert_array_equal(out1[:, :3], out2[:, :3])
    # and the stats must have actually moved off the init values
    init_stats = jax.device_get(variables["batch_stats"])
    moved = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b2: bool(np.any(a != b2)), stats1, init_stats))
    assert any(moved)


def test_set_lr_scale_preserves_momentum(rng):
    """After an lr drop, the next update must equal lr*scale*(m*mu + g) with
    the momentum buffer m carried over — NOT reset to zero."""
    lr, mu = 0.1, 0.9
    params = {"w": jnp.asarray(rng.randn(3).astype(np.float32))}
    tx = make_optimizer(lr, l2=0.0, clip=1e9, momentum=mu)
    opt_state = tx.init(params)

    g1 = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    g2 = {"w": jnp.asarray([0.3, 0.1, -0.4])}

    up1, opt_state = tx.update(g1, opt_state, params)
    opt_state = set_lr_scale(opt_state, 0.1)
    up2, opt_state = tx.update(g2, opt_state, params)

    # torch SGD momentum: buf = mu*buf + g; update = -lr*buf (lr now scaled)
    buf = np.asarray(g1["w"])
    buf = mu * buf + np.asarray(g2["w"])
    np.testing.assert_allclose(np.asarray(up2["w"]), -lr * 0.1 * buf,
                               rtol=1e-5, atol=1e-7)
