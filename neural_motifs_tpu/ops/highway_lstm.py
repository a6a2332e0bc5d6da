"""Alternating-direction highway LSTM as a lax.scan — replaces the 900-line
CUDA extension (reference lib/lstm/highway_lstm_cuda/) with ~150 lines whose
backward pass comes from autodiff.

Cell semantics match the fused CUDA kernel exactly (gate layout from
highway_lstm_kernel.cu:108-160):

    gates_i = x  @ W_i          # [*, 6H]  (in, forget, act, out, r, lin)
    gates_h = h  @ W_h          # [*, 5H]  (no recurrent path for lin)
    g_k     = gates_i[k] + gates_h[k] + b[k]   for k < 5;  g_5 = gates_i[5]
    c'      = sigmoid(g_1) * c + sigmoid(g_0) * tanh(g_2)
    h'      = (sigmoid(g_4) * sigmoid(g_3) * tanh(c')
               + (1 - sigmoid(g_4)) * g_5) * dropout_mask

Layer l runs forward over the sequence if l is even, backward if odd
(alternating directions, highway_lstm_kernel.cu:393-407). Variable lengths —
handled in CUDA by shrinking the active minibatch per timestep — become a
per-step mask on a fixed [B, T, D] layout: masked steps carry (h, c)
through unchanged and emit zeros, which reproduces the PackedSequence
zero-padding of the reference output.

Variational (per-sequence) recurrent dropout uses one mask per layer per
batch row, as in alternating_highway_lstm.py:283-289.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


def block_orthogonal(key: jax.Array, shape: tuple[int, int],
                     block: tuple[int, int], gain: float = 1.0) -> jax.Array:
    """Init a [n, m] matrix in (block[0] x block[1]) orthogonal blocks
    (semantics of alternating_highway_lstm.py:12-59). Pure jnp so it can run
    inside traced flax init functions."""
    n, m = shape
    bn, bm = block
    assert n % bn == 0 and m % bm == 0
    nb, mb = n // bn, m // bm
    keys = jax.random.split(key, nb * mb)

    def semi_orthogonal(k):
        # economic QR of a Gaussian (sign-corrected): [bn, bm] with
        # orthonormal columns/rows — avoids the max(bn,bm)^2 full square
        big, small = max(bn, bm), min(bn, bm)
        a = jax.random.normal(k, (big, small))
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        return q if bn >= bm else q.T

    qs = jax.vmap(semi_orthogonal)(keys).reshape(nb, mb, bn, bm)
    out = jnp.transpose(qs, (0, 2, 1, 3)).reshape(n, m)
    return (gain * out).astype(jnp.float32)


def init_highway_lstm_params(key: jax.Array, input_size: int, hidden_size: int,
                             num_layers: int) -> list[dict[str, Any]]:
    """Per-layer params: w_i [D_in, 6H], w_h [H, 5H], bias [5H] with forget
    bias = 1 (alternating_highway_lstm.py:233-257)."""
    params = []
    h = hidden_size
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else hidden_size
        key, k1, k2 = jax.random.split(key, 3)
        w_i = block_orthogonal(k1, (d_in, 6 * h), (d_in, h))
        w_h = block_orthogonal(k2, (h, 5 * h), (h, h))
        bias = jnp.zeros((5 * h,), jnp.float32).at[h:2 * h].set(1.0)
        params.append({"w_i": w_i, "w_h": w_h, "bias": bias})
    return params


def highway_lstm_gates(gi: Array, h: Array, c: Array, w_h: Array,
                       bias: Array, dropout_mask: Array | None):
    """Fused cell step from a PRE-PROJECTED input. gi = x_t @ w_i [B, 6H]
    (the input GEMM is hoisted out of the scan — one [B, T, D] @ [D, 6H]
    matmul per layer instead of T small ones), h/c: [B, H]."""
    hsz = h.shape[-1]
    gh = h @ w_h                                     # [B, 5H]
    g = gi[:, :5 * hsz] + gh + bias
    in_g = jax.nn.sigmoid(g[:, 0 * hsz:1 * hsz])
    fg_g = jax.nn.sigmoid(g[:, 1 * hsz:2 * hsz])
    act = jnp.tanh(g[:, 2 * hsz:3 * hsz])
    out_g = jax.nn.sigmoid(g[:, 3 * hsz:4 * hsz])
    r_g = jax.nn.sigmoid(g[:, 4 * hsz:5 * hsz])
    lin = gi[:, 5 * hsz:6 * hsz]
    c_new = fg_g * c + in_g * act
    h_new = r_g * (out_g * jnp.tanh(c_new)) + (1.0 - r_g) * lin
    if dropout_mask is not None:
        h_new = h_new * dropout_mask
    return h_new, c_new


def highway_lstm_cell(x_t: Array, h: Array, c: Array, w_i: Array, w_h: Array,
                      bias: Array, dropout_mask: Array | None):
    """One fused cell step. x_t: [B, D_in], h/c: [B, H]."""
    return highway_lstm_gates(x_t @ w_i, h, c, w_h, bias, dropout_mask)


def _run_layer(x: Array, mask: Array, layer_params, dropout_mask, reverse: bool) -> Array:
    """x: [B, T, D]; mask: [B, T] (1 = real step). Returns [B, T, H] with
    zeros at padded steps."""
    if reverse:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)
    b = x.shape[0]
    hsz = layer_params["w_h"].shape[0]
    h0 = jnp.zeros((b, hsz), x.dtype)
    c0 = jnp.zeros((b, hsz), x.dtype)

    # hoist the input projection: one [B, T, D] @ [D, 6H] GEMM
    gi_all = x @ layer_params["w_i"]

    def step(carry, inp):
        h, c = carry
        gi_t, m_t = inp
        h_new, c_new = highway_lstm_gates(gi_t, h, c, layer_params["w_h"],
                                          layer_params["bias"], dropout_mask)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h_new * m

    xs = (jnp.swapaxes(gi_all, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, ys = lax.scan(step, (h0, c0), xs)
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys


def alternating_highway_lstm(params: list, x: Array, lengths: Array, *,
                             dropout_p: float = 0.0, train: bool = False,
                             rng: jax.Array | None = None) -> Array:
    """Stacked alternating-direction highway LSTM.

    x: [B, T, D_in]; lengths: [B] int. Returns [B, T, H] (last layer
    hidden states, zero past each sequence's length).
    """
    t = x.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
    out = x
    for layer, p in enumerate(params):
        dm = None
        if train and dropout_p > 0.0:
            assert rng is not None, "training with dropout needs an rng"
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_p,
                                        (x.shape[0], p["w_h"].shape[0]))
            dm = keep.astype(x.dtype) / (1.0 - dropout_p)
        out = _run_layer(out, mask, p, dm, reverse=(layer % 2 == 1))
    return out
