"""Conformer encoder blocks (extension beyond the reference zoo).

Conformer = macaron FFN halves around MHSA + a depthwise-conv module —
state of the art for audio-visual speech recognition (see PAPERS.md:
"End-to-end Audio-visual Speech Recognition with Conformers",
arxiv 2102.06657). The reference predates this; the framework ships it as an
opt-in registry entry ("conformer") for users chasing accuracy headroom.

TPU notes: all matmuls are (B·T, D) GEMMs; the conv module's depthwise conv
is a (k,) feature-grouped nn.Conv — XLA fuses GLU/swish/BN epilogues. Tiny
sequence lengths (29-117) make plain attention optimal.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn.attention import PositionalEncoding


class _FFN(nn.Module):
    """Half-step macaron feed-forward: LN → Dense(4d) → swish → Dense(d)."""

    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(y)
        y = nn.swish(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return x + 0.5 * y


class _ConvModule(nn.Module):
    """LN → pointwise-GLU → depthwise conv → BN → swish → pointwise."""

    kernel_size: int = 7
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        y = nn.Dense(2 * d, dtype=self.dtype, name="pw1")(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)  # GLU
        y = nn.Conv(d, (self.kernel_size,), padding="SAME", feature_group_count=d,
                    dtype=self.dtype, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(y)
        y = nn.swish(y)
        y = nn.Dense(d, dtype=self.dtype, name="pw2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=not train)
        return x + y


class ConformerBlock(nn.Module):
    num_heads: int = 4
    conv_kernel: int = 7
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        deterministic = not train
        x = _FFN(self.dropout_rate, dtype=self.dtype, name="ffn1")(x, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="mhsa_ln")(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype,
                                            name="mhsa")(y, y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        x = x + y
        x = _ConvModule(self.conv_kernel, self.dropout_rate, dtype=self.dtype,
                        name="conv")(x, train)
        x = _FFN(self.dropout_rate, dtype=self.dtype, name="ffn2")(x, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)


class ConformerEncoder(nn.Module):
    """Input proj + sinusoidal PE + N conformer blocks → (B, T, d_model)."""

    d_model: int = 144
    num_layers: int = 4
    num_heads: int = 4
    conv_kernel: int = 7
    dropout_rate: float = 0.1
    max_len: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.d_model, dtype=self.dtype, name="proj_in")(x)
        x = PositionalEncoding(self.d_model, max_len=self.max_len, name="pos")(x)
        for i in range(self.num_layers):
            x = ConformerBlock(self.num_heads, self.conv_kernel, self.dropout_rate,
                               dtype=self.dtype, name=f"block{i}")(x, train)
        return x
