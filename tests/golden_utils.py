"""Shared state-dict synthesis for the frozen parity goldens.

The torch-golden parity tests (test_logmel.py, test_torch_import.py,
test_bert.py, test_nn_layers.py) are importorskip-gated: in an image
without torch they silently skip, and parity coverage vanishes. The golden
freeze removes that failure mode: ``generate_goldens.py`` (torch required,
run once) records each reference computation's *expected activations* in
``tests/goldens/*.npz``, and ``test_goldens.py`` (NO torch import, default
lane) replays the JAX side against them.

Storing full torchvision-shaped state_dicts would cost ~45 MB per backbone,
so instead both sides SYNTHESIZE the weights deterministically: every
parameter is filled from a per-key RNG seeded by crc32(key) ^ seed —
order-independent, process-independent, torch-independent. The generator
additionally loads the synthesized dict into a real torch module with
``strict=True``, proving the key names and shapes match torchvision's
contract before the golden is written.
"""

from __future__ import annotations

import zlib

import numpy as np


def synth_value(name: str, shape: tuple, seed: int) -> np.ndarray:
    """Deterministic per-key value; law chosen so deep eval-mode forwards
    keep non-degenerate activations (He-scaled kernels, near-identity norm
    layers, plausible BN running stats)."""
    rng = np.random.default_rng((zlib.crc32(name.encode()) & 0xFFFFFFFF) ^ seed)
    if not shape:  # scalar buffers (num_batches_tracked)
        return np.zeros((), np.int64)
    if name.endswith("running_var"):
        return (1.0 + 0.1 * rng.uniform(size=shape)).astype(np.float32)
    if name.endswith("running_mean"):
        return (0.1 * rng.standard_normal(shape)).astype(np.float32)
    base = name.rsplit(".", 1)[-1]
    if base == "weight" and len(shape) == 1:  # BN/LN scale
        return (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)
    if base in ("bias",):
        return (0.05 * rng.standard_normal(shape)).astype(np.float32)
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])
    std = float(np.sqrt(2.0 / max(1, fan_in)))
    return (std * rng.standard_normal(shape)).astype(np.float32)


def synth_state(spec: dict, seed: int) -> dict:
    return {k: synth_value(k, tuple(v), seed) for k, v in spec.items()}


def _bn(prefix: str, c: int, spec: dict) -> None:
    spec[f"{prefix}.weight"] = (c,)
    spec[f"{prefix}.bias"] = (c,)
    spec[f"{prefix}.running_mean"] = (c,)
    spec[f"{prefix}.running_var"] = (c,)
    spec[f"{prefix}.num_batches_tracked"] = ()


def resnet18_spec() -> dict:
    """torchvision resnet18 state_dict names/shapes (feature trunk, no fc —
    the converter ignores the classifier head anyway)."""
    spec: dict = {"conv1.weight": (64, 3, 7, 7)}
    _bn("bn1", 64, spec)
    chans = [64, 64, 128, 256, 512]
    for i in range(4):
        c_in, c_out = chans[i], chans[i + 1]
        stride = 1 if i == 0 else 2
        for b in range(2):
            p = f"layer{i + 1}.{b}"
            bi = c_in if b == 0 else c_out
            spec[f"{p}.conv1.weight"] = (c_out, bi, 3, 3)
            _bn(f"{p}.bn1", c_out, spec)
            spec[f"{p}.conv2.weight"] = (c_out, c_out, 3, 3)
            _bn(f"{p}.bn2", c_out, spec)
            if b == 0 and (stride != 1 or c_in != c_out):
                spec[f"{p}.downsample.0.weight"] = (c_out, bi, 1, 1)
                _bn(f"{p}.downsample.1", c_out, spec)
    return spec


def vgg11_bn_features_spec() -> dict:
    """torchvision vgg11_bn 'features.*' names/shapes."""
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    spec: dict = {}
    idx, c_in = 0, 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        spec[f"features.{idx}.weight"] = (v, c_in, 3, 3)
        spec[f"features.{idx}.bias"] = (v,)
        _bn(f"features.{idx + 1}", v, spec)
        idx += 3  # conv, bn, relu
        c_in = v
    return spec


def lstm_spec(input_size: int, hidden: int, num_layers: int,
              bidirectional: bool) -> dict:
    spec: dict = {}
    dirs = ("", "_reverse") if bidirectional else ("",)
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else hidden * len(dirs)
        for d in dirs:
            spec[f"weight_ih_l{layer}{d}"] = (4 * hidden, in_dim)
            spec[f"weight_hh_l{layer}{d}"] = (4 * hidden, hidden)
            spec[f"bias_ih_l{layer}{d}"] = (4 * hidden,)
            spec[f"bias_hh_l{layer}{d}"] = (4 * hidden,)
    return spec


def hf_bert_cls_spec(vocab: int, hidden: int, layers: int, intermediate: int,
                     max_pos: int, num_labels: int) -> dict:
    """HF BertForSequenceClassification state_dict names/shapes (the subset
    convert_hf_bert reads; HF's own dict has no extra params beyond these
    plus optional position_ids buffers, which the converter never touches)."""
    spec: dict = {
        "bert.embeddings.word_embeddings.weight": (vocab, hidden),
        "bert.embeddings.position_embeddings.weight": (max_pos, hidden),
        "bert.embeddings.token_type_embeddings.weight": (2, hidden),
        "bert.embeddings.LayerNorm.weight": (hidden,),
        "bert.embeddings.LayerNorm.bias": (hidden,),
        "bert.pooler.dense.weight": (hidden, hidden),
        "bert.pooler.dense.bias": (hidden,),
        "classifier.weight": (num_labels, hidden),
        "classifier.bias": (num_labels,),
    }
    for i in range(layers):
        p = f"bert.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            spec[f"{p}.attention.self.{qkv}.weight"] = (hidden, hidden)
            spec[f"{p}.attention.self.{qkv}.bias"] = (hidden,)
        spec[f"{p}.attention.output.dense.weight"] = (hidden, hidden)
        spec[f"{p}.attention.output.dense.bias"] = (hidden,)
        spec[f"{p}.attention.output.LayerNorm.weight"] = (hidden,)
        spec[f"{p}.attention.output.LayerNorm.bias"] = (hidden,)
        spec[f"{p}.intermediate.dense.weight"] = (intermediate, hidden)
        spec[f"{p}.intermediate.dense.bias"] = (intermediate,)
        spec[f"{p}.output.dense.weight"] = (hidden, intermediate)
        spec[f"{p}.output.dense.bias"] = (hidden,)
        spec[f"{p}.output.LayerNorm.weight"] = (hidden,)
        spec[f"{p}.output.LayerNorm.bias"] = (hidden,)
    return spec


# one spec per golden; seeds fixed forever (changing one invalidates its npz)
SEED = 20260819
BERT_CFG = dict(vocab=200, hidden=32, layers=2, intermediate=64, max_pos=24,
                num_labels=3)
LSTM_CFG = dict(input_size=12, hidden=8, num_layers=2, bidirectional=True)
