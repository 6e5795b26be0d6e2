"""Frozen torch-parity goldens — torch-free numeric parity in the default lane.

Replays the JAX side of every torch-golden parity computation against
expected activations recorded by ``generate_goldens.py`` (see its docstring
and golden_utils.py for the freeze design). Unlike the live torch tests
(test_logmel.py etc.), these never skip: an image without torch still
asserts log-mel, converter, LSTM, and BERT numerics.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import golden_utils as G

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, name)
    assert os.path.exists(path), (
        f"missing golden {name} — regenerate with tests/generate_goldens.py")
    return np.load(path)


def test_logmel_golden_raw_and_normalized():
    from multimodal_lipread_tpu.ops import logmel as lm

    z = _load("logmel.npz")
    got_raw = np.asarray(lm.log_mel_xla(z["waves"], normalize=False))
    np.testing.assert_allclose(got_raw, z["want_raw"], rtol=2e-4, atol=2e-4)
    got_norm = np.asarray(lm.log_mel_xla(z["waves"], normalize=True))
    np.testing.assert_allclose(got_norm, z["want_norm"], rtol=1e-3, atol=1e-3)


def test_lstm_golden():
    from multimodal_lipread_tpu.nn import LSTM
    from multimodal_lipread_tpu.utils.torch_import import convert_lstm

    z = _load("lstm.npz")
    sd = G.synth_state(G.lstm_spec(**G.LSTM_CFG), G.SEED)
    params = convert_lstm(sd, num_layers=2, bidirectional=True)
    model = LSTM(hidden_size=8, num_layers=2, bidirectional=True)
    got = model.apply({"params": params["params"]}, jnp.asarray(z["x"]))
    np.testing.assert_allclose(np.asarray(got), z["want"], atol=1e-5, rtol=1e-4)


def test_resnet18_converter_golden():
    from multimodal_lipread_tpu.models.backbones import ResNet
    from multimodal_lipread_tpu.utils.torch_import import convert_resnet

    z = _load("resnet18.npz")
    sd = G.synth_state(G.resnet18_spec(), G.SEED)
    variables = convert_resnet(sd, version=18)
    x_nhwc = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    got = ResNet(18).apply(variables, x_nhwc, False)
    np.testing.assert_allclose(np.asarray(got), z["want"], atol=2e-4, rtol=1e-3)


def test_vgg11_converter_golden():
    from multimodal_lipread_tpu.models.backbones import VGG
    from multimodal_lipread_tpu.utils.torch_import import convert_vgg_bn

    z = _load("vgg11.npz")
    sd = G.synth_state(G.vgg11_bn_features_spec(), G.SEED)
    variables = convert_vgg_bn(sd, version=11)
    x_nhwc = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    got = VGG(11).apply(variables, x_nhwc, False)
    np.testing.assert_allclose(np.asarray(got), z["want_nhwc"], atol=2e-4, rtol=1e-3)


def test_bert_converter_golden():
    from multimodal_lipread_tpu.models.bert import (
        BertClassifier, BertConfig, convert_hf_bert)

    z = _load("bert.npz")
    c = G.BERT_CFG
    cfg = BertConfig(vocab_size=c["vocab"], hidden_size=c["hidden"],
                     num_layers=c["layers"], num_heads=4,
                     intermediate_size=c["intermediate"],
                     max_position=c["max_pos"], dropout_rate=0.0)
    sd = G.synth_state(G.hf_bert_cls_spec(**c), G.SEED)
    params = convert_hf_bert(sd, cfg)
    model = BertClassifier(cfg, num_classes=c["num_labels"])
    got = model.apply({"params": params}, jnp.asarray(z["ids"]), train=False)
    np.testing.assert_allclose(np.asarray(got), z["want"], atol=1e-4, rtol=1e-3)


def test_goldens_all_present():
    """The freeze is only a freeze if every golden exists in-tree."""
    want = {"logmel.npz", "lstm.npz", "resnet18.npz", "vgg11.npz", "bert.npz"}
    have = set(os.listdir(GOLDENS)) if os.path.isdir(GOLDENS) else set()
    assert want <= have, f"missing goldens: {sorted(want - have)}"


@pytest.mark.slow
def test_goldens_match_regeneration():
    """With torch present, regenerating must reproduce the committed goldens
    bit-for-bit (guards converter/spec drift AND golden staleness)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import subprocess
    import sys
    import tempfile

    gen = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "generate_goldens.py")
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        code = (
            "import runpy, sys; sys.argv=['generate_goldens.py'];"
            f"import generate_goldens as g; g.OUT={td!r};"
            "g.gen_lstm(); g.gen_resnet18()")
        subprocess.run(
            [sys.executable, "-c", code], check=True, env=env,
            cwd=os.path.dirname(gen))
        for name in ("lstm.npz", "resnet18.npz"):
            a, b = np.load(os.path.join(GOLDENS, name)), np.load(os.path.join(td, name))
            for k in a.files:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{name}:{k}")
