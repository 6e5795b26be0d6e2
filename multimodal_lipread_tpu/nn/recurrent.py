"""LSTM layers, TPU-first.

Replaces the reference's cuDNN `nn.LSTM` calls (e.g.
audio/models/resnet_lstm_model.py:22-29, video/models/resnet_lstm.py:118-125)
with a formulation XLA maps well onto the MXU:

- the input projection for ALL timesteps is hoisted out of the recurrence
  into one large batched matmul ``(B*T, D) @ (D, 4H)``;
- only the small recurrent matmul ``(B, H) @ (H, 4H)`` lives inside
  ``jax.lax.scan``;
- bidirectionality = two scans over a flipped time axis, concatenated.

Gate order and cell equations match torch.nn.LSTM (i, f, g, o packing), so a
weight converter can map state dicts 1:1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class LSTMLayer(nn.Module):
    """Single-direction LSTM over (B, T, D) → (B, T, H)."""

    hidden_size: int
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden_size
        bound = 1.0 / (H ** 0.5)
        w_ih = self.param("w_ih", _uniform_init(bound), (D, 4 * H))
        w_hh = self.param("w_hh", _uniform_init(bound), (H, 4 * H))
        b_ih = self.param("b_ih", _uniform_init(bound), (4 * H,))
        b_hh = self.param("b_hh", _uniform_init(bound), (4 * H,))

        x = x.astype(self.dtype)
        # Hoisted input projection: one MXU matmul for the whole sequence.
        xg = jnp.einsum("btd,dh->bth", x, w_ih.astype(self.dtype)) + (b_ih + b_hh).astype(self.dtype)
        if self.reverse:
            xg = jnp.flip(xg, axis=1)
        xg = jnp.swapaxes(xg, 0, 1)  # (T, B, 4H) for scan

        w_hh_c = w_hh.astype(self.dtype)

        def step(carry, xg_t):
            h, c = carry
            gates = xg_t + h @ w_hh_c
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((B, H), self.dtype),
            jnp.zeros((B, H), self.dtype),
        )
        _, ys = jax.lax.scan(step, init, xg)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM; returns the full sequence.

    Mirrors torch.nn.LSTM(batch_first=True): output (B, T, H * num_directions).
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = x
        for layer in range(self.num_layers):
            fwd = LSTMLayer(self.hidden_size, reverse=False, dtype=self.dtype, name=f"l{layer}_fwd")(out)
            if self.bidirectional:
                bwd = LSTMLayer(self.hidden_size, reverse=True, dtype=self.dtype, name=f"l{layer}_bwd")(out)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
        return out


class BiLSTM(nn.Module):
    """Convenience wrapper: bidirectional multi-layer LSTM."""

    hidden_size: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return LSTM(
            self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            dtype=self.dtype,
            name="lstm",
        )(x)
