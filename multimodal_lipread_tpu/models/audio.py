"""Audio-only model zoo: the 7 reference architectures, TPU-native.

Registry names match the reference's (audio/train.py:118-134): resnet,
resnet_lstm, vgg, vgg_lstm, lstm_resnet, lstm_resnet_attn, lstm_resnet_trans.
The ``models_without_reg`` ablation copies (reference: audio/models_without_reg/)
are exposed via ``use_batchnorm=False`` rather than duplicated files.

Input contract: (B, 80, input_size) normalized log-mel; internally NHWC
(B, 80, T, 1) so convolutions tile onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import (
    AdditiveAttention,
    BiLSTM,
    ClassifierHead,
    PositionalEncoding,
    TransformerEncoder,
    adaptive_avg_pool2d,
)
from multimodal_lipread_tpu.models.backbones import ResNet, VGG


def _to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 80, T) log-mel → (B, 80, T, 1) NHWC image."""
    return x[..., None]


class AudioResNet(nn.Module):
    """ResNet18 over the log-mel image (reference: audio/models/resnet_model.py:5-40)."""

    num_classes: int
    dropout_rate: float = 0.5
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(18, dtype=self.dtype, name="resnet")(_to_nhwc(x), train)
        return ClassifierHead(512, self.num_classes, self.dropout_rate, self.use_batchnorm,
                              dtype=self.dtype, name="classifier")(feats, train)


class AudioResNetLSTM(nn.Module):
    """ResNet18 → length-1 BiLSTM → classifier
    (reference: audio/models/resnet_lstm_model.py:5-59)."""

    num_classes: int
    lstm_hidden: int = 128
    lstm_layers: int = 2
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(18, dtype=self.dtype, name="resnet")(_to_nhwc(x), train)
        seq = feats[:, None, :]  # (B, 1, 512)
        out = BiLSTM(self.lstm_hidden, self.lstm_layers, dtype=self.dtype, name="lstm")(seq)
        last = out[:, -1, :]
        return ClassifierHead(256, self.num_classes, self.dropout_rate, self.use_batchnorm,
                              dtype=self.dtype, name="classifier")(last, train)


class VGGAudioClassifier(nn.Module):
    """VGG-BN + adaptive (2,3) pooling (reference: audio/models/vgg_model.py:5-58)."""

    num_classes: int
    version: int = 11
    dropout_rate: float = 0.5
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = VGG(self.version, dtype=self.dtype, name="vgg")(_to_nhwc(x), train)
        pooled = adaptive_avg_pool2d(fmap, (2, 3))  # (B, 2, 3, 512)
        # flatten in torch CHW order so converted weights line up
        flat = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(pooled.shape[0], -1)  # (B, 3072)
        return ClassifierHead(256, self.num_classes, self.dropout_rate, self.use_batchnorm,
                              dtype=self.dtype, name="classifier")(flat, train)


class VGGWithLSTMClassifier(nn.Module):
    """VGG-BN, collapse frequency, BiLSTM over the remaining axis
    (reference: audio/models/vgg_lstm_model.py:5-75)."""

    num_classes: int
    version: int = 11
    lstm_hidden: int = 128
    lstm_layers: int = 2
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = VGG(self.version, dtype=self.dtype, name="vgg")(_to_nhwc(x), train)
        # torch AdaptiveAvgPool2d((None, 1)): keep H' (mel-derived), collapse W'
        seq = jnp.mean(fmap, axis=2)  # (B, H', 512)
        out = BiLSTM(self.lstm_hidden, self.lstm_layers, dtype=self.dtype, name="lstm")(seq)
        last = out[:, -1, :]
        return ClassifierHead(128, self.num_classes, self.dropout_rate, self.use_batchnorm,
                              dtype=self.dtype, name="classifier")(last, train)


class _LSTMResNetStem(nn.Module):
    """Shared stem of the lstm_resnet family: per-mel-row BiLSTM → ResNet18 → FC.

    (reference: audio/models/lstm_resnet_model.py:10-35 and copies.)
    The stem is shape-agnostic — the reference's input_size only sizes its
    torch Linear; here the row-BiLSTM/ResNet path needs no static dim.
    """

    proj_dim: int = 256
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, mel_bins, T = x.shape
        rows = x.reshape(B * mel_bins, 1, T)  # length-1 "sequences" per mel row
        rows = BiLSTM(64, 2, dtype=self.dtype, name="initial_bilstm")(rows)  # (B*80, 1, 128)
        img = rows.reshape(B, mel_bins, rows.shape[-1], 1)  # NHWC (B, 80, 128, 1)
        feats = ResNet(18, dtype=self.dtype, name="resnet")(img, train)  # (B, 512)
        y = nn.Dense(self.proj_dim, dtype=self.dtype, name="fc")(feats)
        if self.use_batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name="fc_bn")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=not train)
        return y


class LSTMResNet(nn.Module):
    """(reference: audio/models/lstm_resnet_model.py:5-71)"""

    num_classes: int
    input_size: int = 117
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = _LSTMResNetStem(256, self.dropout_rate, self.use_batchnorm,
                               dtype=self.dtype, name="stem")(x, train)
        seq = stem[:, None, :]
        out = BiLSTM(128, 2, dtype=self.dtype, name="final_bilstm")(seq)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(out[:, -1, :])


class DeepAudioNetWithAttention(nn.Module):
    """(reference: audio/models/lstm_resnet_attn_model.py:18-87)"""

    num_classes: int
    input_size: int = 117
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = _LSTMResNetStem(256, self.dropout_rate, self.use_batchnorm,
                               dtype=self.dtype, name="stem")(x, train)
        seq = jnp.repeat(stem[:, None, :], 10, axis=1)  # fake 10-step sequence
        out = BiLSTM(128, 2, dtype=self.dtype, name="final_bilstm")(seq)
        attended, _ = AdditiveAttention(axis=1, dtype=self.dtype, name="attention")(out)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(attended)


class LSTMResNetWithTransformer(nn.Module):
    """(reference: audio/models/lstm_resnet_trans_model.py:20-102)"""

    num_classes: int
    input_size: int = 117
    transformer_dim: int = 256
    num_heads: int = 4
    num_layers: int = 2
    seq_len: int = 10
    dropout_rate: float = 0.3
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 4:
            x = x.squeeze(1)
        stem = _LSTMResNetStem(self.transformer_dim, self.dropout_rate,
                               self.use_batchnorm, dtype=self.dtype, name="stem")(x, train)
        seq = jnp.repeat(stem[:, None, :], self.seq_len, axis=1)
        seq = PositionalEncoding(self.transformer_dim, max_len=self.seq_len, name="pos")(seq)
        enc = TransformerEncoder(self.num_layers, self.num_heads, dtype=self.dtype,
                                 name="transformer")(seq, deterministic=not train)
        pooled = jnp.mean(enc, axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)


class AudioConformer(nn.Module):
    """EXTENSION (not in the reference): Conformer over the mel time axis.

    (B, 80, T) is treated as a T-step sequence of 80-d frames — the modern
    AVSR recipe (PAPERS.md, arxiv 2102.06657) adapted to word classification
    via mean pooling.
    """

    num_classes: int
    # 128 is the measured shipping default: at the zoo protocol on the hard
    # corpus, d=128 matches d=144's accuracy on every seed (81.6-81.8% vs
    # 81.6%, 3 seeds each — experiments/conformer_dmodel/aggregate.json)
    # and runs +18% clips/s (docs/PERFORMANCE.md d_model sweep). Set
    # model.d_model: 144 to load pre-round-5 checkpoints.
    d_model: int = 128
    num_layers: int = 4
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from multimodal_lipread_tpu.nn.conformer import ConformerEncoder

        seq = jnp.swapaxes(x, 1, 2)  # (B, T, 80)
        enc = ConformerEncoder(self.d_model, self.num_layers, dropout_rate=self.dropout_rate,
                               dtype=self.dtype, name="encoder")(seq, train)
        pooled = jnp.mean(enc, axis=1)
        pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)


def get_audio_model(
    name: str,
    num_classes: int,
    input_size: int = 117,
    version: int = 16,
    use_batchnorm: bool = True,
    dtype: Any = jnp.float32,
    d_model: Optional[int] = None,
) -> nn.Module:
    """Name → model registry (reference: audio/train.py:118-134).

    ``version`` defaults to 16 here because that is what the reference's
    SHIPPED config trains (audio/configs/audio_config.yaml:12 ``version:
    16`` — the value behind BASELINE.md's vgg_lstm 90.00%); the bare class
    constructors keep the reference ctor default of 11
    (vgg_lstm_model.py:7). Pass ``version`` explicitly to be unambiguous.
    """
    if name == "resnet":
        return AudioResNet(num_classes, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "resnet_lstm":
        return AudioResNetLSTM(num_classes, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "vgg":
        return VGGAudioClassifier(num_classes, version=version, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "vgg_lstm":
        return VGGWithLSTMClassifier(num_classes, version=version, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "lstm_resnet":
        return LSTMResNet(num_classes, input_size, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "lstm_resnet_attn":
        return DeepAudioNetWithAttention(num_classes, input_size, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "lstm_resnet_trans":
        return LSTMResNetWithTransformer(num_classes, input_size, use_batchnorm=use_batchnorm, dtype=dtype)
    if name == "conformer":  # TPU-native extension beyond the reference zoo
        if d_model is not None:
            # model.d_model: the measured width/throughput dial
            # (docs/PERFORMANCE.md "Shape-bound, monotonically": 128 was
            # +18% clips/s over the 144 default in the d_model sweep)
            return AudioConformer(num_classes, d_model=d_model, dtype=dtype)
        return AudioConformer(num_classes, dtype=dtype)
    raise ValueError(f"Unknown audio model: {name}")


AUDIO_MODEL_NAMES = (
    "resnet", "resnet_lstm", "vgg", "vgg_lstm",
    "lstm_resnet", "lstm_resnet_attn", "lstm_resnet_trans",
    "conformer",  # extension
)
