"""Numeric parity for the ShuffleNetV2 weight converter (torchvision naming
rebuilt in plain torch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from multimodal_lipread_tpu.models.backbones import ShuffleNetV2  # noqa: E402
from multimodal_lipread_tpu.utils.torch_import import convert_shufflenet_v2  # noqa: E402


def _channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    x = x.view(b, groups, c // groups, h, w).transpose(1, 2).contiguous()
    return x.view(b, c, h, w)


class _TorchShuffleUnit(tnn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = tnn.Sequential(
                tnn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                tnn.BatchNorm2d(inp),
                tnn.Conv2d(inp, bf, 1, bias=False),
                tnn.BatchNorm2d(bf),
                tnn.ReLU(inplace=True),
            )
        else:
            self.branch1 = tnn.Sequential()
        b2_in = inp if stride > 1 else bf
        self.branch2 = tnn.Sequential(
            tnn.Conv2d(b2_in, bf, 1, bias=False),
            tnn.BatchNorm2d(bf),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            tnn.BatchNorm2d(bf),
            tnn.Conv2d(bf, bf, 1, bias=False),
            tnn.BatchNorm2d(bf),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _channel_shuffle(out)


class _TorchShuffleNetV2(tnn.Module):
    def __init__(self, width=0.5):
        super().__init__()
        stage_out = {0.5: (48, 96, 192), 1.0: (116, 232, 464)}[width]
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(3, 24, 3, 2, 1, bias=False), tnn.BatchNorm2d(24), tnn.ReLU(True)
        )
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        c_in = 24
        for stage, (c_out, reps) in enumerate(zip(stage_out, (4, 8, 4))):
            units = [_TorchShuffleUnit(c_in, c_out, 2)]
            units += [_TorchShuffleUnit(c_out, c_out, 1) for _ in range(reps - 1)]
            setattr(self, f"stage{stage + 2}", tnn.Sequential(*units))
            c_in = c_out
        self.conv5 = tnn.Sequential(
            tnn.Conv2d(c_in, 1024, 1, bias=False), tnn.BatchNorm2d(1024), tnn.ReLU(True)
        )

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        for s in (2, 3, 4):
            x = getattr(self, f"stage{s}")(x)
        return self.conv5(x).mean(dim=(2, 3))


def test_shufflenet_v2_conversion_numerics():
    tmodel = _TorchShuffleNetV2(width=0.5).eval()
    g = torch.Generator().manual_seed(0)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))

    variables = convert_shufflenet_v2(tmodel.state_dict(), width=0.5)
    x = np.random.default_rng(0).standard_normal((2, 3, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = ShuffleNetV2(width=0.5).apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)
