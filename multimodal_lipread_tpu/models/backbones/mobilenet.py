"""MobileNetV2 and MobileNetV3-small backbones (torchvision topology) in Flax.

MobileNetV2 'features' (1280-d) backs the video/cue fusion encoders
(reference: video/models/mobilenet_lstm.py:21-72,
audio_cues/models/early_fusion_mobile.py:6-69); MobileNetV3-small (576-d)
backs the AV fusion video encoders (reference: audio_video/models/early_fusion.py:14-117).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _hardsigmoid(x):
    return _relu6(x + 3.0) / 6.0


def _hardswish(x):
    return x * _hardsigmoid(x)


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    act: str = "relu6"  # relu6 | hardswish | none
    bn_eps: float = 1e-5  # torchvision: 1e-5 for V2, 1e-3 for V3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.strides, padding=pad,
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.bn_eps,
                         dtype=self.dtype, name="bn")(x)
        if self.act == "relu6":
            x = _relu6(x)
        elif self.act == "hardswish":
            x = _hardswish(x)
        elif self.act == "relu":
            x = nn.relu(x)
        return x


class InvertedResidualV2(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = _ConvBNAct(hidden, kernel=1, dtype=self.dtype, name="expand")(y, train)
        y = _ConvBNAct(hidden, kernel=3, strides=self.strides, groups=hidden,
                       dtype=self.dtype, name="depthwise")(y, train)
        y = _ConvBNAct(self.features, kernel=1, act="none", dtype=self.dtype, name="project")(y, train)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """MobileNetV2 features → pooled (B, 1280) by default."""

    dtype: Any = jnp.float32
    feature_dim: int = 1280

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, pool: bool = True):
        settings = [
            # t, c, n, s
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        x = _ConvBNAct(32, kernel=3, strides=2, dtype=self.dtype, name="stem")(x, train)
        idx = 0
        for t, c, n, s in settings:
            for i in range(n):
                x = InvertedResidualV2(c, strides=s if i == 0 else 1, expand_ratio=t,
                                       dtype=self.dtype, name=f"block{idx}")(x, train)
                idx += 1
        x = _ConvBNAct(1280, kernel=1, dtype=self.dtype, name="head")(x, train)
        if pool:
            x = jnp.mean(x, axis=(1, 2))
        return x


class _SqueezeExcite(nn.Module):
    squeeze_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * _hardsigmoid(s)


class InvertedResidualV3(nn.Module):
    kernel: int
    expanded: int
    features: int
    use_se: bool
    act: str  # 'relu' | 'hardswish'
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        if self.expanded != in_ch:
            y = _ConvBNAct(self.expanded, kernel=1, act=self.act, bn_eps=1e-3,
                           dtype=self.dtype, name="expand")(y, train)
        y = _ConvBNAct(self.expanded, kernel=self.kernel, strides=self.strides,
                       groups=self.expanded, act=self.act, bn_eps=1e-3,
                       dtype=self.dtype, name="depthwise")(y, train)
        if self.use_se:
            y = _SqueezeExcite(_make_divisible(self.expanded // 4), dtype=self.dtype, name="se")(y)
        y = _ConvBNAct(self.features, kernel=1, act="none", bn_eps=1e-3,
                       dtype=self.dtype, name="project")(y, train)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV3Small(nn.Module):
    """MobileNetV3-small features → pooled (B, 576) by default."""

    dtype: Any = jnp.float32
    feature_dim: int = 576

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, pool: bool = True):
        settings = [
            # kernel, expanded, out, use_se, act, stride
            (3, 16, 16, True, "relu", 2),
            (3, 72, 24, False, "relu", 2),
            (3, 88, 24, False, "relu", 1),
            (5, 96, 40, True, "hardswish", 2),
            (5, 240, 40, True, "hardswish", 1),
            (5, 240, 40, True, "hardswish", 1),
            (5, 120, 48, True, "hardswish", 1),
            (5, 144, 48, True, "hardswish", 1),
            (5, 288, 96, True, "hardswish", 2),
            (5, 576, 96, True, "hardswish", 1),
            (5, 576, 96, True, "hardswish", 1),
        ]
        x = _ConvBNAct(16, kernel=3, strides=2, act="hardswish", bn_eps=1e-3,
                       dtype=self.dtype, name="stem")(x, train)
        for i, (k, e, c, se, act, s) in enumerate(settings):
            x = InvertedResidualV3(k, e, c, se, act, s, dtype=self.dtype, name=f"block{i}")(x, train)
        x = _ConvBNAct(576, kernel=1, act="hardswish", bn_eps=1e-3,
                       dtype=self.dtype, name="head")(x, train)
        if pool:
            x = jnp.mean(x, axis=(1, 2))
        return x
