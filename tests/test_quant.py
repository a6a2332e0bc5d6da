"""Int8 serving path (ops/quant.py): QuantDense must be a bitwise drop-in
for nn.Dense when off, match checkpoints leaf-for-leaf, and bound the
quantization error when on."""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_motifs_tpu.ops.quant import QuantDense, int8_matmul


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_quant_dense_off_is_bitwise_nn_dense(rng, monkeypatch):
    monkeypatch.delenv("NM_QUANT", raising=False)
    x = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    ref = nn.Dense(32, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    qd = QuantDense(32, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    vref = ref.init(jax.random.PRNGKey(3), x)
    vq = qd.init(jax.random.PRNGKey(3), x)
    # identical parameter trees (names, shapes, values) -> checkpoints and
    # the torch importer are untouched by the swap
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), vref, vq)
    np.testing.assert_array_equal(np.asarray(ref.apply(vref, x)),
                                  np.asarray(qd.apply(vq, x)))
    # training mode never quantizes, even with the env set
    monkeypatch.setenv("NM_QUANT", "int8")
    np.testing.assert_array_equal(np.asarray(ref.apply(vref, x)),
                                  np.asarray(qd.apply(vq, x, train=True)))


def test_int8_matmul_error_bound(rng):
    x = rng.randn(16, 256).astype(np.float32)
    w = (rng.randn(256, 128) * rng.uniform(0.1, 3.0, (1, 128))).astype(
        np.float32)  # per-channel spread exercises the per-col scales
    exact = x @ w
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02, f"int8 rms error {rel:.4f}"
    # well below the bf16 matmul error of the same product would NOT hold
    # (bf16 has ~2^-8 relative precision too); the point is it's bounded
    assert np.isfinite(got).all()


def test_int8_matmul_batched_rows(rng):
    """Leading batch dims and per-row scales: a row 1000x larger than the
    others must not destroy the small rows' precision."""
    x = rng.randn(2, 7, 64).astype(np.float32)
    x[0, 0] *= 1000.0
    w = rng.randn(64, 32).astype(np.float32)
    exact = x @ w
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    rel = (np.linalg.norm((got - exact).reshape(-1, 32), axis=-1)
           / np.maximum(np.linalg.norm(exact.reshape(-1, 32), axis=-1), 1e-9))
    assert rel.max() < 0.03, rel.max()


def test_union_tower_int8_close_to_float(rng, monkeypatch):
    from neural_motifs_tpu.models.rel_model import UnionVGGHead

    head = UnionVGGHead(pooling_dim=64, fc_dim=64, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(6, 7, 7, 8).astype(np.float32))
    monkeypatch.delenv("NM_QUANT", raising=False)
    v = head.init(jax.random.PRNGKey(0), x)
    f32 = np.asarray(head.apply(v, x))
    monkeypatch.setenv("NM_QUANT", "int8")
    q = np.asarray(head.apply(v, x))
    rel = np.linalg.norm(q - f32) / np.linalg.norm(f32)
    assert rel < 0.05, rel
    # and the top scoring unit per row mostly agrees
    agree = (q.argmax(-1) == f32.argmax(-1)).mean()
    assert agree >= 0.8, agree
