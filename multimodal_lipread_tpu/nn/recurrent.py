"""LSTM layers, TPU-first.

Replaces the reference's cuDNN `nn.LSTM` calls (e.g.
audio/models/resnet_lstm_model.py:22-29, video/models/resnet_lstm.py:118-125)
with a formulation XLA maps well onto the MXU:

- the input projection for ALL timesteps is hoisted out of the recurrence
  into one large batched matmul ``(B*T, D) @ (D, 4H)``;
- only the small recurrent matmul lives inside ``jax.lax.scan``;
- **fused bidirectionality**: both directions run in ONE scan — step t
  advances the forward cell on x[t] and the backward cell on x[T-1-t], with
  the two recurrent matmuls batched as ``(2, B, H) @ (2, H, 4H)``. One scan
  instead of two halves the sequential-dispatch overhead that dominates tiny
  recurrent steps on TPU (measured ~1.8x on the 29-frame video encoders).

Gate order and cell equations match torch.nn.LSTM (i, f, g, o packing), and
the parameter tree (``l{n}_{fwd,bwd}/{w_ih,w_hh,b_ih,b_hh}``) is unchanged,
so utils.torch_import.convert_lstm maps state dicts 1:1.
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


class _LSTMParams(nn.Module):
    """Parameter container for one direction (torch layout, see convert_lstm)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self):
        D, H = self.input_size, self.hidden_size
        bound = 1.0 / (H ** 0.5)
        return (
            self.param("w_ih", _uniform_init(bound), (D, 4 * H)),
            self.param("w_hh", _uniform_init(bound), (H, 4 * H)),
            self.param("b_ih", _uniform_init(bound), (4 * H,)),
            self.param("b_hh", _uniform_init(bound), (4 * H,)),
        )


def _cell_step(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _unidirectional(xg, w_hh, B, H, dtype):
    """xg: (T, B, 4H) pre-projected inputs → (T, B, H) outputs."""

    def step(carry, xg_t):
        h, c = carry
        h, c = _cell_step(xg_t + h @ w_hh, c)
        return (h, c), h

    init = (jnp.zeros((B, H), dtype), jnp.zeros((B, H), dtype))
    _, ys = jax.lax.scan(step, init, xg)
    return ys


def _bidirectional_fused(xg_fwd, xg_bwd, w_hh_fwd, w_hh_bwd, B, H, dtype):
    """One scan for both directions.

    xg_*: (T, B, 4H); the backward stream is pre-flipped in time. Recurrent
    matmuls batch over a leading direction axis of size 2.
    """
    xg = jnp.stack([xg_fwd, xg_bwd], axis=1)  # (T, 2, B, 4H)
    w_hh = jnp.stack([w_hh_fwd, w_hh_bwd])  # (2, H, 4H)

    def step(carry, xg_t):
        h, c = carry  # (2, B, H)
        gates = xg_t + jnp.einsum(
            "kbh,khg->kbg", h, w_hh, preferred_element_type=jnp.float32
        ).astype(dtype)
        h, c = _cell_step(gates, c)
        return (h, c), h

    init = (jnp.zeros((2, B, H), dtype), jnp.zeros((2, B, H), dtype))
    _, ys = jax.lax.scan(step, init, xg)  # (T, 2, B, H)
    fwd = ys[:, 0]
    bwd = jnp.flip(ys[:, 1], axis=0)  # un-flip time
    return fwd, bwd


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM; returns the full sequence.

    Mirrors torch.nn.LSTM(batch_first=True): output (B, T, H * num_directions).
    ``dropout`` follows torch semantics: applied to each layer's OUTPUT
    except the last, train-time only, and ignored for single-layer stacks.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, T, _ = x.shape
        H = self.hidden_size
        out = x.astype(self.dtype)
        for layer in range(self.num_layers):
            D = out.shape[-1]
            fwd_p = _LSTMParams(D, H, name=f"l{layer}_fwd")()
            if self.bidirectional:
                bwd_p = _LSTMParams(D, H, name=f"l{layer}_bwd")()

            def project(p):
                w_ih, _w_hh, b_ih, b_hh = p
                xg = jnp.einsum("btd,dh->bth", out, w_ih.astype(self.dtype))
                return (xg + (b_ih + b_hh).astype(self.dtype))

            xg_fwd = jnp.swapaxes(project(fwd_p), 0, 1)  # (T, B, 4H)
            if self.bidirectional:
                xg_bwd = jnp.swapaxes(jnp.flip(project(bwd_p), axis=1), 0, 1)
                fwd, bwd = _bidirectional_fused(
                    xg_fwd, xg_bwd,
                    fwd_p[1].astype(self.dtype), bwd_p[1].astype(self.dtype),
                    B, H, self.dtype,
                )
                out = jnp.concatenate(
                    [jnp.swapaxes(fwd, 0, 1), jnp.swapaxes(bwd, 0, 1)], axis=-1
                )
            else:
                ys = _unidirectional(xg_fwd, fwd_p[1].astype(self.dtype), B, H, self.dtype)
                out = jnp.swapaxes(ys, 0, 1)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout)(out, deterministic=not train)
        return out


class LSTMLayer(nn.Module):
    """Single-direction LSTM over (B, T, D) → (B, T, H).

    Kept for direct use; parameters live at this module's scope
    (w_ih/w_hh/b_ih/b_hh), matching the historical layout.
    """

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
        xg = jnp.einsum("btd,dh->bth", x, w_ih.astype(self.dtype)) + (b_ih + b_hh).astype(self.dtype)
        if self.reverse:
            xg = jnp.flip(xg, axis=1)
        ys = _unidirectional(jnp.swapaxes(xg, 0, 1), w_hh.astype(self.dtype), B, H, self.dtype)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiLSTM(nn.Module):
    """Convenience wrapper: bidirectional multi-layer LSTM."""

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0  # inter-layer, torch semantics (see LSTM)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return LSTM(
            self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            dropout=self.dropout,
            dtype=self.dtype,
            name="lstm",
        )(x, train=train)
