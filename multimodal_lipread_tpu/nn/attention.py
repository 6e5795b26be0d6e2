"""Attention blocks and positional encodings.

Covers the attention vocabulary of the reference model zoo:

- additive (Bahdanau-style) attention over a sequence
  (reference: audio/models/lstm_resnet_attn_model.py:6-15)
- sinusoidal positional encoding
  (reference: audio/models/lstm_resnet_trans_model.py:6-17)
- multi-head self-attention over time
  (reference: video/models/resnet_attn.py:23-35)
- torch-style post-LN TransformerEncoder
  (reference: video/models/resnet_trans.py:45-133)
- single-query cross-modal scaled dot-product attention
  (reference: cues_video/models/early_fusion_mobile.py:133-148)

Sequences here are tiny (≤29 steps), so plain XLA attention is already
optimal — no flash/blockwise machinery is warranted (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class AdditiveAttention(nn.Module):
    """Softmax(Linear(x)) weighted sum over an axis.

    ``axis=1`` is the sequence axis (standard). The reference's audio_cues
    early-fusion applies softmax over dim=0 — the batch! — which is
    reproduced by ``axis=0`` where bug-compatibility is required
    (reference: audio_cues/models/early_fusion_mobile.py:65).
    """

    axis: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores = nn.Dense(1, dtype=self.dtype, name="attn")(x).squeeze(-1)  # (B, T)
        weights = nn.softmax(scores, axis=self.axis)
        weighted = jnp.sum(x * weights[..., None], axis=1)
        return weighted, weights


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding added to (B, T, D)."""

    dim: int
    max_len: int = 5000

    def setup(self):
        pe = np.zeros((self.max_len, self.dim), dtype=np.float32)
        position = np.arange(self.max_len, dtype=np.float32)[:, None]
        div_term = np.exp(np.arange(0, self.dim, 2, dtype=np.float32) * (-np.log(10000.0) / self.dim))
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
        self.pe = jnp.asarray(pe)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.pe[None, : x.shape[1], :]


class MultiHeadSelfAttention(nn.Module):
    """nn.MultiheadAttention-equivalent self-attention; returns the (B, T, D)
    attention output (torch's second return value, the weights, is omitted —
    no caller uses it)."""

    num_heads: int
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            name="mha",
        )(x, x)


class SingleQueryAttention(nn.Module):
    """One query vector attends over a key/value sequence.

    Scaled dot-product with learned q/k/v projections; returns the attended
    vector (B, D). TPU-friendly: one (B, 1, D) x (B, T, D) attention, fused
    by XLA (reference: cues_video/models/early_fusion_mobile.py:133-148).
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_vec: jnp.ndarray, seq: jnp.ndarray) -> jnp.ndarray:
        # param names match the torch module (query/key/value Linears,
        # early_fusion_mobile.py:136-138) for 1:1 state-dict import
        q = nn.Dense(self.dim, dtype=self.dtype, name="query")(query_vec)  # (B, D)
        k = nn.Dense(self.dim, dtype=self.dtype, name="key")(seq)  # (B, T, D)
        v = nn.Dense(self.dim, dtype=self.dtype, name="value")(seq)
        scores = jnp.einsum("bd,btd->bt", q, k) * (self.dim ** -0.5)
        w = nn.softmax(scores, axis=-1)
        return jnp.einsum("bt,btd->bd", w, v)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer defaults: post-LN, ReLU FFN.

    d_model inferred from input; dim_feedforward defaults to torch's 2048
    unless overridden.
    """

    num_heads: int
    dim_feedforward: Optional[int] = None
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d_model = x.shape[-1]
        ff = self.dim_feedforward or 2048
        # torch forwards the layer dropout into nn.MultiheadAttention too
        # (attention-probability dropout), not just outputs/FFN
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout_rate, deterministic=deterministic,
            name="self_attn",
        )(x, x)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)
        y = nn.Dense(ff, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class TransformerEncoder(nn.Module):
    """Stack of TransformerEncoderLayer."""

    num_layers: int
    num_heads: int
    dim_feedforward: Optional[int] = None
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, deterministic=deterministic)
        return x
