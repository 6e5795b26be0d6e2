"""Numeric parity tests for the torch → Flax weight converter.

Builds torch modules with torchvision's exact state_dict naming (torchvision
itself is not installed here), converts their weights, and checks the Flax
forward pass matches torch to float32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_lipread_tpu.models.backbones import ResNet, VGG  # noqa: E402
from multimodal_lipread_tpu.nn import LSTM  # noqa: E402
from multimodal_lipread_tpu.utils.torch_import import (  # noqa: E402
    adapt_first_conv_to_1ch,
    convert_lstm,
    convert_resnet,
    convert_vgg_bn,
)


class _TorchBasicBlock(tnn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c_out)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(c_in, c_out, 1, stride, bias=False), tnn.BatchNorm2d(c_out)
            )

    def forward(self, x):
        idt = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(y + idt)


class _TorchResNet18(tnn.Module):
    """torchvision-compatible naming: conv1, bn1, layer{1-4}.{0,1}, fc."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for i in range(4):
            stride = 1 if i == 0 else 2
            layer = tnn.Sequential(
                _TorchBasicBlock(chans[i], chans[i + 1], stride),
                _TorchBasicBlock(chans[i + 1], chans[i + 1]),
            )
            setattr(self, f"layer{i + 1}", layer)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(module):
    """Non-trivial running stats so the test can't pass with default stats."""
    g = torch.Generator().manual_seed(0)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))


def test_resnet18_conversion_numerics():
    tmodel = _TorchResNet18().eval()
    _randomize_bn_stats(tmodel)
    variables = convert_resnet(tmodel.state_dict(), version=18)

    x = np.random.default_rng(0).standard_normal((2, 3, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    fmodel = ResNet(18)
    out = fmodel.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_resnet18_1ch_adaptation_shapes():
    tmodel = _TorchResNet18().eval()
    variables = convert_resnet(tmodel.state_dict(), version=18)
    adapted = adapt_first_conv_to_1ch(variables)
    assert adapted["params"]["conv1"]["kernel"].shape == (7, 7, 1, 64)
    mel = jnp.zeros((1, 80, 117, 1))
    out = ResNet(18).apply(adapted, mel, False)
    assert out.shape == (1, 512)


def _torch_vgg11_bn_features():
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(c_in, v, 3, padding=1), tnn.BatchNorm2d(v), tnn.ReLU(True)]
            c_in = v
    return tnn.Sequential(*layers)


def test_vgg11_bn_conversion_numerics():
    features = _torch_vgg11_bn_features().eval()
    _randomize_bn_stats(features)
    # torchvision prefixes with 'features.'
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    variables = convert_vgg_bn(sd, version=11)

    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = features(torch.from_numpy(x)).numpy()

    out = VGG(11).apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    np.testing.assert_allclose(np.asarray(out), np.transpose(ref, (0, 2, 3, 1)),
                               atol=2e-4, rtol=1e-3)


def test_lstm_conversion_numerics():
    tlstm = tnn.LSTM(input_size=12, hidden_size=8, num_layers=2,
                     bidirectional=True, batch_first=True).eval()
    params = convert_lstm(tlstm.state_dict(), num_layers=2, bidirectional=True)

    x = np.random.default_rng(2).standard_normal((3, 5, 12)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tlstm(torch.from_numpy(x))

    flstm = LSTM(hidden_size=8, num_layers=2, bidirectional=True)
    out = flstm.apply({"params": {"l0_fwd": params["params"]["l0_fwd"],
                                  "l0_bwd": params["params"]["l0_bwd"],
                                  "l1_fwd": params["params"]["l1_fwd"],
                                  "l1_bwd": params["params"]["l1_bwd"]}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_graft_backbone_into_audio_model():
    """Converted ResNet18 weights graft into AudioResNet's resnet submodule."""
    from multimodal_lipread_tpu.models.audio import AudioResNet
    from multimodal_lipread_tpu.utils.torch_import import graft_backbone

    tmodel = _TorchResNet18().eval()
    backbone = adapt_first_conv_to_1ch(convert_resnet(tmodel.state_dict(), version=18))

    model = AudioResNet(num_classes=4)
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((2, 80, 117))
    variables = model.init({"params": rng, "dropout": rng}, mel, train=False)
    grafted = graft_backbone(variables, backbone, ("resnet",))
    out = model.apply(grafted, mel, train=False)
    assert out.shape == (2, 4)
    # grafted kernel actually replaced the random init
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["resnet"]["conv1"]["kernel"]),
        backbone["params"]["conv1"]["kernel"],
    )


def test_graft_backbone_shape_mismatch_raises():
    from multimodal_lipread_tpu.models.audio import AudioResNet
    from multimodal_lipread_tpu.utils.torch_import import graft_backbone

    tmodel = _TorchResNet18().eval()
    backbone = convert_resnet(tmodel.state_dict(), version=18)  # 3-ch conv1

    model = AudioResNet(num_classes=4)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, jnp.zeros((2, 80, 117)), train=False)
    with pytest.raises(ValueError, match="mismatch"):
        graft_backbone(variables, backbone, ("resnet",))
