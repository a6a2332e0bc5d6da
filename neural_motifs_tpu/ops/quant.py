"""Int8 dynamic-quantization serving path for the big fc towers.

The v5e MXU has twice the int8 throughput of bf16 (394 vs 197 TOPS), and
the SGDet eval step is dominated by the dense towers (the union fc tower
alone is ~7.7 TFLOP per batch-8 step — docs/ROUND2.md roofline). This
module provides a drop-in `QuantDense` whose parameter tree is IDENTICAL
to `nn.Dense` (`kernel` [in, out] f32, `bias` [out]) so checkpoints and
the torch importer are untouched; quantization is dynamic and in-graph:

  * weights: per-output-channel absmax -> int8 (re-derived each call from
    the f32 params; 16M elementwise ops on a 4096x4096 layer — noise next
    to the 137 GFLOP matmul it feeds, and it keeps the checkpoint format
    and training path byte-identical)
  * activations: per-row absmax -> int8 (dynamic, no calibration data)
  * accumulation: int32 via lax.dot_general(preferred_element_type)

Opt-in serving knob: NM_QUANT=int8 (off = exact bf16/f32 path, bitwise
unchanged). Quantization NEVER applies in training mode — gradients flow
through the float path only. Not used by the parity runbook. The reference
has no quantized path; this is a TPU-serving extension.

STATUS: RETIRED as a serving knob (round 5; was EXPERIMENTAL in round 4).
Measured round 3/4: perf-NEUTRAL at the tuned serving config (1.01-1.02x —
pair compaction already removed the fc-tower bottleneck, docs/ROUND3.md),
and on the trained synthetic model it costs ~1.4-1.9 R@K points in sgdet
while being exactly R@K-neutral in sgcls (PRECISION_AUDIT.json,
int8_recall_delta_pts) — the weight scales are ALREADY per-output-channel,
so the accuracy loss is in the dynamic per-row activation absmax and is
not recoverable by weight-side calibration. All cost, no win: removed
from README's serving-knob list; the code + tests stay as research
material for exact-mode eval (-max_pairs_eval 4096) or other
tower-dominated configs where the 2x int8 MXU rate could matter.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def quant_mode() -> str:
    """'' (off) or 'int8' — read per call so tests can monkeypatch env."""
    return os.environ.get("NM_QUANT", "")


def int8_matmul(x: Array, kernel: Array) -> Array:
    """x [..., K] @ kernel [K, N] with dynamic int8 quantization.

    Per-row activation scales, per-column weight scales, int32
    accumulation. Returns f32 [..., N].
    """
    x32 = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-10)
    xq = jnp.round(x32 / xs).clip(-127, 127).astype(jnp.int8)

    w32 = kernel.astype(jnp.float32)
    ws = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.round(w32 / ws).clip(-127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


class QuantDense(nn.Module):
    """nn.Dense with an opt-in int8 eval path (NM_QUANT=int8).

    Parameter names, shapes, dtypes and initializers match nn.Dense
    exactly, so swapping `nn.Dense(...)` for `QuantDense(...)` changes
    nothing about checkpoints, importers, or from-scratch init. With the
    env off, or in training mode, the math is nn.Dense's own (delegated),
    bitwise identical.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        if quant_mode() == "int8" and not train:
            y = int8_matmul(x, kernel)
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
