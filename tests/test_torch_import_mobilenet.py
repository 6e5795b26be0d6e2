"""Numeric parity for MobileNetV2 / V3-small weight converters.

torchvision is not installed; these tests rebuild its exact module tree
(state_dict naming included) in plain torch, convert random weights, and
compare forward passes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from multimodal_lipread_tpu.models.backbones import MobileNetV2, MobileNetV3Small  # noqa: E402
from multimodal_lipread_tpu.utils.torch_import import (  # noqa: E402
    convert_mobilenet_v2,
    convert_mobilenet_v3_small,
)


def _cbn(c_in, c_out, k=3, s=1, groups=1, act="relu6", eps=1e-5):
    pad = (k - 1) // 2
    layers = [tnn.Conv2d(c_in, c_out, k, s, pad, groups=groups, bias=False),
              tnn.BatchNorm2d(c_out, eps=eps)]
    if act == "relu6":
        layers.append(tnn.ReLU6(inplace=True))
    elif act == "hardswish":
        layers.append(tnn.Hardswish(inplace=True))
    elif act == "relu":
        layers.append(tnn.ReLU(inplace=True))
    return tnn.Sequential(*layers)


class _TorchInvertedResidualV2(tnn.Module):
    def __init__(self, c_in, c_out, stride, t):
        super().__init__()
        hidden = c_in * t
        layers = []
        if t != 1:
            layers.append(_cbn(c_in, hidden, k=1))
        layers.append(_cbn(hidden, hidden, k=3, s=stride, groups=hidden))
        layers += [tnn.Conv2d(hidden, c_out, 1, bias=False), tnn.BatchNorm2d(c_out)]
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and c_in == c_out

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class _TorchMobileNetV2(tnn.Module):
    """torchvision-naming-compatible MobileNetV2 features."""

    def __init__(self):
        super().__init__()
        settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        feats = [_cbn(3, 32, s=2)]
        c_in = 32
        for t, c, n, s in settings:
            for i in range(n):
                feats.append(_TorchInvertedResidualV2(c_in, c, s if i == 0 else 1, t))
                c_in = c
        feats.append(_cbn(c_in, 1280, k=1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


class _TorchSE(tnn.Module):
    def __init__(self, c, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(c, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, c, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        return x * tnn.functional.hardsigmoid(self.fc2(s))


def _make_div(v, d=8):
    nv = max(d, int(v + d / 2) // d * d)
    return nv + d if nv < 0.9 * v else nv


class _TorchInvertedResidualV3(tnn.Module):
    def __init__(self, c_in, k, e, c_out, se, act, s):
        super().__init__()
        layers = []
        if e != c_in:
            layers.append(_cbn(c_in, e, k=1, act=act, eps=1e-3))
        layers.append(_cbn(e, e, k=k, s=s, groups=e, act=act, eps=1e-3))
        if se:
            layers.append(_TorchSE(e, _make_div(e // 4)))
        layers.append(_cbn(e, c_out, k=1, act="none", eps=1e-3))
        self.block = tnn.Sequential(*layers)
        self.use_res = s == 1 and c_in == c_out

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class _TorchMobileNetV3Small(tnn.Module):
    def __init__(self):
        super().__init__()
        settings = [(3, 16, 16, True, "relu", 2), (3, 72, 24, False, "relu", 2),
                    (3, 88, 24, False, "relu", 1), (5, 96, 40, True, "hardswish", 2),
                    (5, 240, 40, True, "hardswish", 1), (5, 240, 40, True, "hardswish", 1),
                    (5, 120, 48, True, "hardswish", 1), (5, 144, 48, True, "hardswish", 1),
                    (5, 288, 96, True, "hardswish", 2), (5, 576, 96, True, "hardswish", 1),
                    (5, 576, 96, True, "hardswish", 1)]
        feats = [_cbn(3, 16, s=2, act="hardswish", eps=1e-3)]
        c_in = 16
        for k, e, c, se, act, s in settings:
            feats.append(_TorchInvertedResidualV3(c_in, k, e, c, se, act, s))
            c_in = c
        feats.append(_cbn(c_in, 576, k=1, act="hardswish", eps=1e-3))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


def _randomize_bn_stats(module):
    g = torch.Generator().manual_seed(0)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))


@pytest.mark.slow
def test_mobilenet_v2_conversion_numerics():
    tmodel = _TorchMobileNetV2().eval()
    _randomize_bn_stats(tmodel)
    variables = convert_mobilenet_v2(tmodel.state_dict())
    x = np.random.default_rng(0).standard_normal((2, 3, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = MobileNetV2().apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_mobilenet_v3_small_conversion_numerics():
    tmodel = _TorchMobileNetV3Small().eval()
    _randomize_bn_stats(tmodel)
    variables = convert_mobilenet_v3_small(tmodel.state_dict())
    x = np.random.default_rng(1).standard_normal((2, 3, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = MobileNetV3Small().apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)
