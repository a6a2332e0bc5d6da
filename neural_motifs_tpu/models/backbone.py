"""VGG16 backbone + RoI fc head (flax linen, NHWC, bf16-friendly).

The reference uses torchvision's VGG16 with the last maxpool removed
(stride-16, 512-channel conv5 output) and the two 4096-d fc layers as the
RoI head (lib/object_detector.py:78-82, 623-633). Here both are linen
modules; pretrained torchvision weights are imported by
training/checkpoint.py (with the OIHW->HWIO and CHW->HWC flatten-order
transposes).

Convs run in `dtype` (bfloat16 by default on TPU) with float32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16 conv plan; 'M' = 2x2 maxpool. Final maxpool removed.
VGG16_CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                       512, 512, 512, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """Images [B, H, W, 3] -> stride-16 feature map [B, H/16, W/16, 512]."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32)(x)
                x = nn.relu(x)
        return x


class VGGRoIHead(nn.Module):
    """The VGG classifier tower minus the final class layer: flatten ->
    4096 -> relu -> dropout -> 4096 -> relu -> dropout.

    Input [..., P, P, C]; flattened in (h, w, c) order — the torch importer
    compensates for torch's (c, h, w) order.
    """

    dtype: Any = jnp.bfloat16
    dropout_rate: float = 0.5
    use_dropout: bool = True
    fc_dim: int = 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        from neural_motifs_tpu.ops.quant import QuantDense

        x = x.reshape(x.shape[:-3] + (-1,)).astype(self.dtype)
        x = QuantDense(self.fc_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="fc0")(x, train=train)
        x = nn.relu(x)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = QuantDense(self.fc_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="fc1")(x, train=train)
        x = nn.relu(x)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
