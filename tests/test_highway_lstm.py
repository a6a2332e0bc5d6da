"""Highway LSTM: scan implementation vs a step-by-step numpy oracle of the
CUDA cell math (highway_lstm_kernel.cu:108-160); masking/alternation
invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_motifs_tpu.ops.highway_lstm import (alternating_highway_lstm,
                                                highway_lstm_cell,
                                                init_highway_lstm_params)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_cell(x, h, c, w_i, w_h, b):
    hsz = h.shape[-1]
    gi = x @ w_i
    gh = h @ w_h
    g = [gi[:, k * hsz:(k + 1) * hsz] + gh[:, k * hsz:(k + 1) * hsz] + b[k * hsz:(k + 1) * hsz]
         for k in range(5)]
    lin = gi[:, 5 * hsz:]
    c_new = sigmoid(g[1]) * c + sigmoid(g[0]) * np.tanh(g[2])
    h_new = sigmoid(g[4]) * (sigmoid(g[3]) * np.tanh(c_new)) + (1 - sigmoid(g[4])) * lin
    return h_new, c_new


def test_cell_matches_oracle(rng):
    b, d, h = 3, 10, 8
    x = rng.randn(b, d).astype(np.float32)
    hh = rng.randn(b, h).astype(np.float32)
    cc = rng.randn(b, h).astype(np.float32)
    w_i = rng.randn(d, 6 * h).astype(np.float32) * 0.1
    w_h = rng.randn(h, 5 * h).astype(np.float32) * 0.1
    bias = rng.randn(5 * h).astype(np.float32) * 0.1
    got_h, got_c = highway_lstm_cell(jnp.asarray(x), jnp.asarray(hh), jnp.asarray(cc),
                                     jnp.asarray(w_i), jnp.asarray(w_h),
                                     jnp.asarray(bias), None)
    exp_h, exp_c = np_cell(x, hh, cc, w_i, w_h, bias)
    np.testing.assert_allclose(np.asarray(got_h), exp_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), exp_c, rtol=1e-4, atol=1e-5)


def test_single_layer_forward_scan(rng):
    b, t, d, h = 2, 5, 6, 4
    params = init_highway_lstm_params(jax.random.PRNGKey(0), d, h, 1)
    x = rng.randn(b, t, d).astype(np.float32)
    lengths = np.array([5, 3])
    out = np.asarray(alternating_highway_lstm(params, jnp.asarray(x),
                                              jnp.asarray(lengths)))
    # padded steps are zero
    assert np.all(out[1, 3:] == 0)
    # manual unroll oracle for row 0
    w_i = np.asarray(params[0]["w_i"])
    w_h = np.asarray(params[0]["w_h"])
    bias = np.asarray(params[0]["bias"])
    hh = np.zeros((1, h), np.float32)
    cc = np.zeros((1, h), np.float32)
    for step in range(t):
        hh, cc = np_cell(x[0:1, step], hh, cc, w_i, w_h, bias)
        np.testing.assert_allclose(out[0, step], hh[0], rtol=1e-3, atol=1e-4)


def test_alternating_direction(rng):
    # With 2 layers, the second runs backward: the output at position 0 must
    # depend on the input at the last valid position.
    b, t, d, h = 1, 6, 4, 4
    params = init_highway_lstm_params(jax.random.PRNGKey(1), d, h, 2)
    x = rng.randn(b, t, d).astype(np.float32)
    lengths = jnp.array([6])
    out1 = np.asarray(alternating_highway_lstm(params, jnp.asarray(x), lengths))
    x2 = x.copy()
    x2[0, -1] += 1.0  # perturb last step
    out2 = np.asarray(alternating_highway_lstm(params, jnp.asarray(x2), lengths))
    assert np.abs(out1[0, 0] - out2[0, 0]).max() > 1e-6


def test_length_mask_isolation(rng):
    # Outputs for a short sequence must not change when padding garbage changes.
    b, t, d, h = 1, 5, 4, 4
    params = init_highway_lstm_params(jax.random.PRNGKey(2), d, h, 2)
    x = rng.randn(b, t, d).astype(np.float32)
    lengths = jnp.array([3])
    xa = x.copy()
    xb = x.copy()
    xb[0, 3:] = 99.0
    oa = np.asarray(alternating_highway_lstm(params, jnp.asarray(xa), lengths))
    ob = np.asarray(alternating_highway_lstm(params, jnp.asarray(xb), lengths))
    np.testing.assert_allclose(oa[0, :3], ob[0, :3], rtol=1e-5, atol=1e-6)


def test_grad_flows(rng):
    b, t, d, h = 2, 4, 4, 4
    params = init_highway_lstm_params(jax.random.PRNGKey(3), d, h, 2)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lengths = jnp.array([4, 2])

    def loss(p):
        return alternating_highway_lstm(p, x, lengths).sum()

    g = jax.grad(loss)(params)
    total = sum(np.abs(np.asarray(v)).sum() for layer in g for v in layer.values())
    assert np.isfinite(total) and total > 0
