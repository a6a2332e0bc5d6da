"""ResNet-101 backbone (the reference's deprecated alternative to VGG16,
lib/resnet.py + the use_resnet branches of lib/object_detector.py:84-100).

C4 trunk (layer3 output, 1024 channels, stride 16) feeds the detector; the
RoI head is layer4 run at stride 1 ("HACK" in resnet.py:62) followed by
average pooling. BatchNorm uses frozen running statistics (the standard
detection fine-tuning recipe; the reference's momentum 0.01 barely moves
them either).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    relu_end: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=True,
                                    name="down_bn")(residual)
        y = y + residual
        if self.relu_end:
            y = nn.relu(y)
        return y


class ResNetLayer(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    relu_end_last: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, stride=self.stride, downsample=True,
                       dtype=self.dtype, name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes,
                           relu_end=(self.relu_end_last or i < self.blocks - 1),
                           dtype=self.dtype, name=f"block{i}")(x)
        return x


class ResNet101C4(nn.Module):
    """Images [B, H, W, 3] -> C4 feature map [B, H/16, W/16, 1024]."""

    dtype: Any = jnp.bfloat16
    layers: Sequence[int] = (3, 4, 23)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetLayer(64, self.layers[0], stride=1, dtype=self.dtype,
                        name="layer1")(x)
        x = ResNetLayer(128, self.layers[1], stride=2, dtype=self.dtype,
                        name="layer2")(x)
        x = ResNetLayer(256, self.layers[2], stride=2, dtype=self.dtype,
                        name="layer3")(x)
        return x


class ResNetRoIHead(nn.Module):
    """layer4 at stride 1 over pooled 7x7 RoI features, then global average
    pool -> 2048-d (lib/rel_model.py:361-365 / object_detector.py:91-98)."""

    dtype: Any = jnp.bfloat16
    blocks: int = 3
    relu_end: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [..., 7, 7, 1024] -> [..., 2048]."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        x = ResNetLayer(512, self.blocks, stride=1,
                        relu_end_last=self.relu_end, dtype=self.dtype,
                        name="layer4")(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.reshape(lead + (2048,)).astype(jnp.float32)
