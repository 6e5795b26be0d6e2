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

from typing import Any, Dict, Sequence, Tuple

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


def _convbn(sd, conv_key, bn_key) -> Tuple[dict, dict]:
    """torchvision ConvBNActivation pair → _ConvBNAct {conv, bn} subtree."""
    params = {"conv": _conv(sd, conv_key)}
    bn_p, bn_s = _bn(sd, bn_key)
    params["bn"] = bn_p
    return params, {"bn": bn_s}


_MBV2_BLOCKS = [  # (expand_ratio) per torchvision features.{1..17}
    1, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
]


def convert_mobilenet_v2(src: Any) -> Dict[str, Any]:
    """torchvision mobilenet_v2 state_dict → backbones.MobileNetV2 tree.

    torchvision layout: features.0 = stem ConvBNAct; features.{1..17} =
    InvertedResidual (.conv sequential: [expand,] depthwise, project);
    features.18 = head ConvBNAct. Depthwise conv weights transpose the same
    way as dense convs ((O,1,k,k) → (k,k,1,O) with feature_group_count=O).
    """
    sd = load_state_dict(src)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, "features.0.0", "features.0.1")
    for idx, t in enumerate(_MBV2_BLOCKS):
        f = f"features.{idx + 1}.conv"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if t == 1:
            pairs = [("depthwise", f"{f}.0.0", f"{f}.0.1"), ("project", f"{f}.1", f"{f}.2")]
        else:
            pairs = [
                ("expand", f"{f}.0.0", f"{f}.0.1"),
                ("depthwise", f"{f}.1.0", f"{f}.1.1"),
                ("project", f"{f}.2", f"{f}.3"),
            ]
        for name, ck, bk in pairs:
            bp[name], bs[name] = _convbn(sd, ck, bk)
        params[f"block{idx}"] = bp
        stats[f"block{idx}"] = bs
    params["head"], stats["head"] = _convbn(sd, "features.18.0", "features.18.1")
    return {"params": params, "batch_stats": stats}


# torchvision mobilenet_v3_small: (has_expand, has_se) per features.{1..11}
_MBV3S_BLOCKS = [
    (False, True), (True, False), (True, False), (True, True), (True, True),
    (True, True), (True, True), (True, True), (True, True), (True, True),
    (True, True),
]


def convert_mobilenet_v3_small(src: Any) -> Dict[str, Any]:
    """torchvision mobilenet_v3_small state_dict → backbones.MobileNetV3Small.

    torchvision block layout: .block.0 expand (absent in features.1),
    then depthwise, optional SqueezeExcitation (fc1/fc2 convs), project —
    all ConvBNActivation pairs (SE convs carry biases, no BN).
    """
    sd = load_state_dict(src)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, "features.0.0", "features.0.1")
    for idx, (has_expand, has_se) in enumerate(_MBV3S_BLOCKS):
        f = f"features.{idx + 1}.block"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        pos = 0
        if has_expand:
            bp["expand"], bs["expand"] = _convbn(sd, f"{f}.{pos}.0", f"{f}.{pos}.1")
            pos += 1
        bp["depthwise"], bs["depthwise"] = _convbn(sd, f"{f}.{pos}.0", f"{f}.{pos}.1")
        pos += 1
        if has_se:
            bp["se"] = {
                "fc1": {"kernel": np.transpose(sd[f"{f}.{pos}.fc1.weight"], (2, 3, 1, 0)),
                        "bias": sd[f"{f}.{pos}.fc1.bias"]},
                "fc2": {"kernel": np.transpose(sd[f"{f}.{pos}.fc2.weight"], (2, 3, 1, 0)),
                        "bias": sd[f"{f}.{pos}.fc2.bias"]},
            }
            pos += 1
        bp["project"], bs["project"] = _convbn(sd, f"{f}.{pos}.0", f"{f}.{pos}.1")
        params[f"block{idx}"] = bp
        stats[f"block{idx}"] = bs
    params["head"], stats["head"] = _convbn(sd, "features.12.0", "features.12.1")
    return {"params": params, "batch_stats": stats}


def _bn_wrapped(sd, key) -> Tuple[dict, dict]:
    """BN inside a _BN wrapper module (inner name BatchNorm_0)."""
    p, s = _bn(sd, key)
    return {"BatchNorm_0": p}, {"BatchNorm_0": s}


def convert_shufflenet_v2(src: Any, width: float = 1.0) -> Dict[str, Any]:
    """torchvision shufflenet_v2_x{0_5,1_0} state_dict → backbones.ShuffleNetV2.

    torchvision layout: conv1.{0,1}; stage{2,3,4}.{i}.branch1.{0..3} (stride-2
    units only) and .branch2.{0,1,3,4,5,6}; conv5.{0,1}.
    """
    sd = load_state_dict(src)
    repeats = (4, 8, 4)
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1.0"), "conv5": _conv(sd, "conv5.0")}
    stats: Dict[str, Any] = {}
    params["conv1_bn"], stats["conv1_bn"] = _bn_wrapped(sd, "conv1.1")
    params["conv5_bn"], stats["conv5_bn"] = _bn_wrapped(sd, "conv5.1")
    for stage, reps in zip((2, 3, 4), repeats):
        for i in range(reps):
            t = f"stage{stage}.{i}"
            f = f"stage{stage}_{i}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if i == 0:  # stride-2 unit has branch1
                bp["b1_dw"] = _conv(sd, f"{t}.branch1.0")
                bp["b1_dw_bn"], bs["b1_dw_bn"] = _bn_wrapped(sd, f"{t}.branch1.1")
                bp["b1_pw"] = _conv(sd, f"{t}.branch1.2")
                bp["b1_pw_bn"], bs["b1_pw_bn"] = _bn_wrapped(sd, f"{t}.branch1.3")
            bp["b2_pw1"] = _conv(sd, f"{t}.branch2.0")
            bp["b2_pw1_bn"], bs["b2_pw1_bn"] = _bn_wrapped(sd, f"{t}.branch2.1")
            bp["b2_dw"] = _conv(sd, f"{t}.branch2.3")
            bp["b2_dw_bn"], bs["b2_dw_bn"] = _bn_wrapped(sd, f"{t}.branch2.4")
            bp["b2_pw2"] = _conv(sd, f"{t}.branch2.5")
            bp["b2_pw2_bn"], bs["b2_pw2_bn"] = _bn_wrapped(sd, f"{t}.branch2.6")
            params[f] = bp
            stats[f] = bs
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


def graft_backbone(
    model_variables: Dict[str, Any],
    backbone_variables: Dict[str, Any],
    submodule_path: Sequence[str],
) -> Dict[str, Any]:
    """Install converted backbone variables into a full model's tree.

    ``submodule_path`` addresses the backbone module inside the model, e.g.
    ``("resnet",)`` for AudioResNet or ``("video_encoder", "cnn")`` for the
    fusion video encoders. Replaces the params/batch_stats subtrees at that
    path (shapes validated against the random init they replace).
    """
    import copy

    from flax.core import unfreeze

    out = {k: copy.deepcopy(unfreeze(v)) for k, v in model_variables.items()}
    for collection in ("params", "batch_stats"):
        if collection not in backbone_variables:
            continue
        node = out[collection]
        for key in submodule_path[:-1]:
            node = node[key]
        leaf = submodule_path[-1]
        old = node[leaf]
        new = backbone_variables[collection]
        old_shapes = {k: np.shape(v) for k, v in _flatten(old).items()}
        new_shapes = {k: np.shape(v) for k, v in _flatten(new).items()}
        if old_shapes != new_shapes:
            missing = set(old_shapes) ^ set(new_shapes)
            mismatched = {k for k in (set(old_shapes) & set(new_shapes))
                          if old_shapes[k] != new_shapes[k]}
            raise ValueError(
                f"backbone graft mismatch at {submodule_path} ({collection}): "
                f"missing/extra={sorted(missing)[:5]} mismatched={sorted(mismatched)[:5]}"
            )
        node[leaf] = new
    return out


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = tree
    return out


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
