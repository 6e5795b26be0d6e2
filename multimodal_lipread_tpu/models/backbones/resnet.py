"""ResNet-18/34/50 backbones (torchvision-compatible topology) in Flax, NHWC.

Used by nearly every reference pipeline as the frame/spectrogram encoder
(reference: audio/models/resnet_model.py:13, video/models/resnet_lstm.py:79-86,
audio_cues/models/early_fusion_resnet.py, ...). Weight layout is kept
convertible 1:1 from torchvision state dicts
(see multimodal_lipread_tpu.utils.torch_import).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.features * self.expansion
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = _BN(self.dtype, name="bn3")(y, train)
        if self.strides != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(y + identity)


_CONFIGS = {
    18: (BasicBlock, (2, 2, 2, 2), 512),
    34: (BasicBlock, (3, 4, 6, 3), 512),
    50: (Bottleneck, (3, 4, 6, 3), 2048),
}


class ResNet(nn.Module):
    """ResNet backbone. Input NHWC; returns pooled (B, D) features by default."""

    version: int = 18
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return _CONFIGS[self.version][2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, pool: bool = True):
        block_cls, stage_sizes, _ = _CONFIGS[self.version]
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _BN(self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, feats) in enumerate(zip(stage_sizes, (64, 128, 256, 512))):
            for b in range(n_blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(feats, strides=strides, dtype=self.dtype, name=f"layer{stage + 1}_{b}")(x, train)
        if pool:
            x = jnp.mean(x, axis=(1, 2))
        return x
