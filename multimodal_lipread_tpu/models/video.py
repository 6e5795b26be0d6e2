"""Video-only model zoo: the 7 reference architectures, TPU-native.

Registry names match the reference (video/train.py:188-202): vgg_lstm,
resnet_lstm, shufflenet_lstm, mobilenet_lstm, resnet_attn, cnn, resnet_trans.

Input contract: lip-region sequences as **(B, T, H, W, C)** float in [0, 1]
(NTHWC — channels-last for TPU conv layouts; the reference uses (B, C, T, H, W),
video/data_utils/dataset_loader.py:84-94). TimeDistributed frame encoding is
a reshape to (B*T, H, W, C) — one large batched conv XLA tiles onto the MXU —
rather than the reference's chunked/checkpointed per-frame loops.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import (
    BiLSTM,
    MultiHeadSelfAttention,
    PositionalEncoding,
    TransformerEncoder,
)
from multimodal_lipread_tpu.models.backbones import MobileNetV2, ResNet, ShuffleNetV2


def _td(module_fn, x, train: bool):
    """TimeDistributed: (B, T, H, W, C) → (B, T, F) via one batched call."""
    B, T = x.shape[0], x.shape[1]
    flat = x.reshape((B * T,) + x.shape[2:])
    out = module_fn(flat, train)
    return out.reshape(B, T, -1)


class VGGLite(nn.Module):
    """Tiny 3-block VGG → 128-d (reference: video/models/vgg_lstm.py:18-50).

    No BatchNorm, matching the reference exactly.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((32, 32)):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"b1_conv{i}")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 44 → 22
        for i, ch in enumerate((64, 64)):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"b2_conv{i}")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 22 → 11
        x = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="b3_conv0")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool → (B, 128)


class _LSTMHead(nn.Module):
    """BiLSTM → last step → ReLU → Dropout → Dense, the recurring video head
    (reference: video/models/resnet_lstm.py:113-177)."""

    feature_dim: int
    num_classes: int
    dropout_rate: float
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq, train: bool = False):
        # reference passes the same dropout into nn.LSTM(num_layers=2,
        # dropout=...) — inter-layer, train-time only
        out = BiLSTM(self.feature_dim // 2, self.num_layers,
                     dropout=self.dropout_rate, dtype=self.dtype, name="lstm")(seq, train=train)
        x = nn.relu(out[:, -1, :])
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class VGGLSTM(nn.Module):
    """(reference: video/models/vgg_lstm.py:53-92)"""

    num_classes: int
    feature_dim: int = 256
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = VGGLite(dtype=self.dtype, name="vgglite")
        seq = _td(backbone, x, train)
        return _LSTMHead(self.feature_dim, self.num_classes, self.dropout_rate,
                         dtype=self.dtype, name="head")(seq, train)


class ResNet2DBiLSTM(nn.Module):
    """(reference: video/models/resnet_lstm.py:56-177)"""

    num_classes: int
    resnet_version: int = 18
    feature_dim: int = 1024
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNet(self.resnet_version, dtype=self.dtype, name="resnet")
        seq = _td(backbone, x, train)
        return _LSTMHead(self.feature_dim, self.num_classes, self.dropout_rate,
                         dtype=self.dtype, name="head")(seq, train)


class ShuffleNet2DBiLSTM(nn.Module):
    """(reference: video/models/shufflenet_lstm.py:27-111)"""

    num_classes: int
    width: float = 0.5
    feature_dim: int = 512
    dropout_rate: float = 0.4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ShuffleNetV2(width=self.width, dtype=self.dtype, name="shufflenet")
        seq = _td(backbone, x, train)
        return _LSTMHead(self.feature_dim, self.num_classes, self.dropout_rate,
                         dtype=self.dtype, name="head")(seq, train)


class MobileNetLSTM(nn.Module):
    """(reference: video/models/mobilenet_lstm.py:22-70)"""

    num_classes: int
    feature_dim: int = 256
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = MobileNetV2(dtype=self.dtype, name="mobilenet")
        seq = _td(backbone, x, train)
        return _LSTMHead(self.feature_dim, self.num_classes, self.dropout_rate,
                         dtype=self.dtype, name="head")(seq, train)


class ResNet2DAttention(nn.Module):
    """ResNet frames → temporal multi-head self-attention → mean pool
    (reference: video/models/resnet_attn.py:38-115)."""

    num_classes: int
    resnet_version: int = 18
    attention_dim: int = 512  # reference default: the CNN output dim
    num_heads: int = 4
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNet(self.resnet_version, dtype=self.dtype, name="resnet")
        seq = _td(backbone, x, train)
        seq = nn.Dense(self.attention_dim, dtype=self.dtype, name="proj_in")(seq)
        # reference: nn.MultiheadAttention(..., dropout=dropout) — the 0.3
        # applies to the attention probabilities too (resnet_attn.py:30)
        attended = MultiHeadSelfAttention(
            self.num_heads, dtype=self.dtype, dropout_rate=self.dropout_rate,
            name="attention",
        )(seq, deterministic=not train)
        pooled = jnp.mean(attended, axis=1)
        pooled = nn.relu(pooled)
        pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)


class ResNet2DTransformer(nn.Module):
    """ResNet frames → PE → TransformerEncoder → mean pool
    (reference: video/models/resnet_trans.py:45-133)."""

    num_classes: int
    resnet_version: int = 18
    transformer_dim: int = 256
    num_layers: int = 2
    num_heads: int = 4
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNet(self.resnet_version, dtype=self.dtype, name="resnet")
        seq = _td(backbone, x, train)
        seq = nn.Dense(self.transformer_dim, dtype=self.dtype, name="proj_in")(seq)
        seq = PositionalEncoding(self.transformer_dim, max_len=200, name="pos")(seq)
        enc = TransformerEncoder(
            self.num_layers, self.num_heads, dim_feedforward=4 * self.transformer_dim,
            dropout_rate=self.dropout_rate, dtype=self.dtype, name="transformer",
        )(seq, deterministic=not train)
        pooled = jnp.mean(enc, axis=1)
        pooled = nn.relu(pooled)
        pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)


class CNNOnly(nn.Module):
    """Per-frame CNN + temporal Conv1d stack + mean pool
    (reference: video/models/cnn.py:6-73)."""

    num_classes: int
    temporal_channels: int = 128
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def frame_cnn(frames, train):
            y = frames
            for i, ch in enumerate((32, 64)):
                y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(y)
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn{i}")(y)
                y = nn.relu(y)
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            y = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name="bn2")(y)
            y = nn.relu(y)
            return jnp.mean(y, axis=(1, 2))

        seq = _td(frame_cnn, x, train)  # (B, T, 128)
        # Temporal Conv1d over time: (B, T, C) is already flax's Conv layout.
        y = seq
        for i in range(2):
            y = nn.Conv(self.temporal_channels, (3,), padding=1, dtype=self.dtype,
                        name=f"tconv{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"tbn{i}")(y)
            y = nn.relu(y)
        pooled = jnp.mean(y, axis=1)
        pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)


class VideoConformer(nn.Module):
    """EXTENSION (not in the reference): per-frame ResNet + Conformer encoder
    over time (PAPERS.md, arxiv 2102.06657), mean-pooled word classifier."""

    num_classes: int
    resnet_version: int = 18
    d_model: int = 144
    num_layers: int = 4
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from multimodal_lipread_tpu.nn.conformer import ConformerEncoder

        backbone = ResNet(self.resnet_version, dtype=self.dtype, name="resnet")
        seq = _td(backbone, x, train)  # (B, T, 512)
        enc = ConformerEncoder(self.d_model, self.num_layers, dropout_rate=self.dropout_rate,
                               dtype=self.dtype, name="encoder")(seq, train)
        pooled = jnp.mean(enc, axis=1)
        pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)


def get_video_model(
    name: str,
    num_classes: int,
    resnet_version: int = 18,
    shufflenet_version: str = "0.5x",
    feature_dim: int | None = None,
    dropout: float | None = None,
    dtype: Any = jnp.float32,
) -> nn.Module:
    """Name → model registry (reference: video/train.py:188-202)."""
    fd = feature_dim

    def opt(default):
        return default if dropout is None else dropout

    if name == "vgg_lstm":
        return VGGLSTM(num_classes, feature_dim=fd or 256, dropout_rate=opt(0.5), dtype=dtype)
    if name == "resnet_lstm":
        return ResNet2DBiLSTM(num_classes, resnet_version=resnet_version,
                              feature_dim=fd or 1024, dropout_rate=opt(0.5), dtype=dtype)
    if name == "shufflenet_lstm":
        width = 0.5 if shufflenet_version == "0.5x" else 1.0
        return ShuffleNet2DBiLSTM(num_classes, width=width, feature_dim=fd or 512,
                                  dropout_rate=opt(0.4), dtype=dtype)
    if name == "mobilenet_lstm":
        return MobileNetLSTM(num_classes, feature_dim=fd or 256, dropout_rate=opt(0.3), dtype=dtype)
    if name == "resnet_attn":
        return ResNet2DAttention(num_classes, resnet_version=resnet_version,
                                 dropout_rate=opt(0.3), dtype=dtype)
    if name == "cnn":
        return CNNOnly(num_classes, dropout_rate=opt(0.3), dtype=dtype)
    if name == "resnet_trans":
        return ResNet2DTransformer(num_classes, resnet_version=resnet_version,
                                   dropout_rate=opt(0.2), dtype=dtype)
    if name == "conformer":  # TPU-native extension beyond the reference zoo
        return VideoConformer(num_classes, resnet_version=resnet_version,
                              dropout_rate=opt(0.1), dtype=dtype)
    raise ValueError(f"Unknown video model: {name}")


VIDEO_MODEL_NAMES = (
    "vgg_lstm", "resnet_lstm", "shufflenet_lstm", "mobilenet_lstm",
    "resnet_attn", "cnn", "resnet_trans",
    "conformer",  # extension
)
