"""Unit checks for the nn layer library, including torch-parity of the LSTM
cell (torch CPU is available as a golden reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_lipread_tpu.nn import (
    BiLSTM,
    LSTM,
    AdditiveAttention,
    PositionalEncoding,
    TransformerEncoder,
    adaptive_avg_pool2d,
)

torch = pytest.importorskip("torch")


def test_lstm_matches_torch():
    B, T, D, H = 3, 7, 5, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    model = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    variables = model.init(jax.random.key(0), jnp.asarray(x))

    t_lstm = torch.nn.LSTM(D, H, num_layers=2, bidirectional=True, batch_first=True)
    # copy jax params into torch (w_ih stored as (D, 4H) = torch weight_ih_l0.T)
    p = variables["params"]
    sd = {}
    for layer in range(2):
        for direction, tag in ((0, "fwd"), (1, "bwd")):
            suffix = f"_l{layer}" + ("_reverse" if direction else "")
            jp = p[f"l{layer}_{tag}"]
            sd[f"weight_ih{suffix}"] = torch.tensor(np.asarray(jp["w_ih"]).T)
            sd[f"weight_hh{suffix}"] = torch.tensor(np.asarray(jp["w_hh"]).T)
            sd[f"bias_ih{suffix}"] = torch.tensor(np.asarray(jp["b_ih"]))
            sd[f"bias_hh{suffix}"] = torch.tensor(np.asarray(jp["b_hh"]))
    t_lstm.load_state_dict(sd)

    want, _ = t_lstm(torch.tensor(x))
    got = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_bilstm_output_shape():
    model = BiLSTM(hidden_size=16, num_layers=2)
    x = jnp.zeros((2, 9, 8))
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x)
    assert out.shape == (2, 9, 32)


def test_additive_attention_weights_sum_to_one():
    model = AdditiveAttention()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)), jnp.float32)
    v = model.init(jax.random.key(0), x)
    out, w = model.apply(v, x)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), np.ones(2), rtol=1e-5)


def test_positional_encoding_matches_reference_formula():
    pe = PositionalEncoding(dim=8, max_len=16)
    x = jnp.zeros((1, 16, 8))
    v = pe.init(jax.random.key(0), x)
    out = np.asarray(pe.apply(v, x))[0]
    # position 0: sin(0)=0, cos(0)=1 alternating
    np.testing.assert_allclose(out[0, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 1::2], 1.0, atol=1e-6)


def test_transformer_encoder_shape():
    model = TransformerEncoder(num_layers=2, num_heads=4, dim_feedforward=64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 32)), jnp.float32)
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x, deterministic=True)
    assert out.shape == (2, 10, 32)


def test_adaptive_avg_pool2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    for out_size in [(2, 3), (1, 1), (5, 7), (3, 4)]:
        got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_size))
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(x).permute(0, 3, 1, 2), out_size
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_adaptive_pool_none_dim():
    x = jnp.ones((1, 4, 6, 2))
    out = adaptive_avg_pool2d(x, (None, 1))
    assert out.shape == (1, 4, 1, 2)
