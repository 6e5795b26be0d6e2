"""Audio–video fusion model zoo: the 7 reference architectures, TPU-native.

Registry names match the reference (audio_video/train.py:112-127):
early_fusion_resnet, early_fusion_mobilenet, late_fusion_mobilenet,
middle_fusion_mobilenet, early_fusion_fast, late_fusion_fast,
middle_fusion_fast.

Inputs: ``audio`` (B, 80, input_size) normalized log-mel; ``video``
(B, T, 44, 44, 3) NTHWC lip sequences in [0, 1].

The two "final hidden state" idioms of the reference are reproduced exactly:
- last-timestep of the BiLSTM output sequence (e.g. ef_cnn_lstm_resnet.py:88-92)
- torch ``h_n`` concat of forward-last + backward-first hidden
  (early_fusion_fast.py:67-69) — see ``bilstm_final_hidden``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import BiLSTM
from multimodal_lipread_tpu.models.backbones import MobileNetV3Small, ResNet


def bilstm_final_hidden(out: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """torch h_n-concat for a 1-layer BiLSTM output (B, T, 2H) → (B, 2H).

    Forward direction's final state is its last output; backward direction's
    final state is its output at t=0 (it scanned the sequence reversed).
    """
    return jnp.concatenate([out[:, -1, :hidden], out[:, 0, hidden:]], axis=-1)


class AudioCNNEncoder(nn.Module):
    """Small conv stack over the (B, 80, T, 1) mel image.

    ``channels``: conv widths; ``pool_after``: which blocks get 2x2 max-pool
    (the rest end with global average pooling); optional BatchNorm; optional
    projection Dense. Covers the reference's AudioEncoder /
    AudioEncoderLate / AudioEncoderFast variants
    (audio_video/models/early_fusion.py:14-45, late_fusion.py:13-38,
    early_fusion_fast.py:9-33).
    """

    channels: Sequence[int] = (32, 64, 128)
    pool_after: Sequence[bool] = (True, True, False)
    use_batchnorm: bool = True
    proj_dim: int | None = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x[..., None]  # (B, 80, T, 1)
        for i, (ch, pool) in enumerate(zip(self.channels, self.pool_after)):
            y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(y)
            if self.use_batchnorm:
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn{i}")(y)
            y = nn.relu(y)
            if pool:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = jnp.mean(y, axis=(1, 2))  # global average pool
        if self.proj_dim is not None:
            y = nn.Dense(self.proj_dim, dtype=self.dtype, name="fc")(y)
        return y


class AudioCNNMidEncoder(nn.Module):
    """Conv stack stopped early and FLATTENED (no pooling to a vector) —
    the reference's mid-fusion audio feature
    (audio_video/models/middle_fusion.py:14-34: 64ch map flattened;
    middle_fusion_fast.py:8-13: 16ch map flattened + fc)."""

    channels: Sequence[int] = (32, 64)
    use_batchnorm: bool = True
    proj_dim: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x[..., None]
        for i, ch in enumerate(self.channels):
            y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(y)
            if self.use_batchnorm:
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"bn{i}")(y)
            y = nn.relu(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = y.reshape(y.shape[0], -1)
        if self.proj_dim is not None:
            y = nn.Dense(self.proj_dim, dtype=self.dtype, name="fc")(y)
        return y


class VideoSeqEncoder(nn.Module):
    """Per-frame backbone + BiLSTM video encoder.

    ``backbone``: 'resnet18' or 'mobilenet_v3_small'.
    ``summary``: 'last_step' (output seq last step) or 'final_hidden'
    (torch h_n concat); ``lstm_layers`` per reference variant.
    """

    backbone: str = "mobilenet_v3_small"
    lstm_hidden: int = 256
    lstm_layers: int = 2
    summary: str = "last_step"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, train: bool = False):
        B, T = video.shape[0], video.shape[1]
        flat = video.reshape((B * T,) + video.shape[2:])
        if self.backbone == "resnet18":
            feats = ResNet(18, dtype=self.dtype, name="cnn")(flat, train)
        elif self.backbone == "mobilenet_v3_small":
            feats = MobileNetV3Small(dtype=self.dtype, name="cnn")(flat, train)
        else:
            raise ValueError(f"Unknown video backbone: {self.backbone}")
        seq = feats.reshape(B, T, -1)
        # reference: 2-layer encoders (early_fusion.py:63-70,
        # ef_cnn_lstm_resnet.py:66-73) use nn.LSTM(..., dropout=0.2);
        # 1-layer variants are unaffected (torch ignores it)
        out = BiLSTM(self.lstm_hidden, self.lstm_layers, dropout=0.2,
                     dtype=self.dtype, name="lstm")(seq, train=train)
        if self.summary == "last_step":
            return out[:, -1, :]
        return bilstm_final_hidden(out, self.lstm_hidden)


class _FusionMLP(nn.Module):
    """Linear → ReLU → [Dropout] → Linear classifier over the fused vector."""

    hidden: int
    num_classes: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class EarlyFusionAV(nn.Module):
    """concat(audio CNN 256, ResNet18+BiLSTM video 512) → MLP
    (reference: audio_video/models/ef_cnn_lstm_resnet.py:100-125)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNEncoder(dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="resnet18", lstm_hidden=256, lstm_layers=2,
                            dtype=self.dtype, name="video_encoder")(video, train)
        fused = jnp.concatenate([a, v], axis=-1)
        return _FusionMLP(512, self.num_classes, 0.3, dtype=self.dtype,
                          name="classifier")(fused, train)


class EarlyFusionAVMobileNet(nn.Module):
    """(reference: audio_video/models/early_fusion.py:80-110)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNEncoder(dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=256, lstm_layers=2,
                            dtype=self.dtype, name="video_encoder")(video, train)
        fused = jnp.concatenate([a, v], axis=-1)
        return _FusionMLP(512, self.num_classes, 0.3, dtype=self.dtype,
                          name="classifier")(fused, train)


class LateFusionAVMobileNet(nn.Module):
    """Per-modality logits fused α·a + (1−α)·v with scalar learnable α
    (reference: audio_video/models/late_fusion.py:62-93)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNEncoder(channels=(32, 64), pool_after=(True, False), proj_dim=256,
                            dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=256, lstm_layers=1,
                            summary="final_hidden", dtype=self.dtype,
                            name="video_encoder")(video, train)
        a_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="audio_classifier")(a)
        v_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="video_classifier")(v)
        alpha = self.param("alpha", lambda k: jnp.asarray(0.5, jnp.float32))
        return alpha * a_logits + (1.0 - alpha) * v_logits


class MidFusionAVMobileNet(nn.Module):
    """Flattened intermediate audio conv map concat video BiLSTM feature
    (reference: audio_video/models/middle_fusion.py:62-88)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNMidEncoder(channels=(32, 64), dtype=self.dtype,
                               name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=256, lstm_layers=1,
                            dtype=self.dtype, name="video_encoder")(video, train)
        fused = jnp.concatenate([a, v], axis=-1)
        return _FusionMLP(512, self.num_classes, 0.3, dtype=self.dtype,
                          name="classifier")(fused, train)


class EarlyFusionFast(nn.Module):
    """(reference: audio_video/models/early_fusion_fast.py:73-93)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNEncoder(channels=(16, 32), pool_after=(True, False), use_batchnorm=False,
                            proj_dim=128, dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=128, lstm_layers=1,
                            summary="final_hidden", dtype=self.dtype,
                            name="video_encoder")(video, train)
        fused = jnp.concatenate([a, v], axis=-1)
        return _FusionMLP(256, self.num_classes, 0.0, dtype=self.dtype,
                          name="classifier")(fused, train)


class LateFusionFast(nn.Module):
    """(reference: audio_video/models/late_fusion_fast.py:8-70)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNEncoder(channels=(16,), pool_after=(False,), use_batchnorm=False,
                            proj_dim=128, dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=128, lstm_layers=1,
                            summary="final_hidden", dtype=self.dtype,
                            name="video_encoder")(video, train)
        a_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="audio_classifier")(a)
        v_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="video_classifier")(v)
        alpha = self.param("alpha", lambda k: jnp.asarray(0.5, jnp.float32))
        return alpha * a_logits + (1.0 - alpha) * v_logits


class MidFusionFast(nn.Module):
    """(reference: audio_video/models/middle_fusion_fast.py:5-40)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        a = AudioCNNMidEncoder(channels=(16,), use_batchnorm=False, proj_dim=128,
                               dtype=self.dtype, name="audio_encoder")(audio, train)
        v = VideoSeqEncoder(backbone="mobilenet_v3_small", lstm_hidden=128, lstm_layers=1,
                            dtype=self.dtype, name="video_encoder")(video, train)
        fused = jnp.concatenate([a, v], axis=-1)
        return _FusionMLP(256, self.num_classes, 0.0, dtype=self.dtype,
                          name="classifier")(fused, train)


def get_av_model(name: str, num_classes: int, dtype: Any = jnp.float32) -> nn.Module:
    """Name → model registry (reference: audio_video/train.py:112-127)."""
    registry = {
        "early_fusion_resnet": EarlyFusionAV,
        "early_fusion_mobilenet": EarlyFusionAVMobileNet,
        "late_fusion_mobilenet": LateFusionAVMobileNet,
        "middle_fusion_mobilenet": MidFusionAVMobileNet,
        "early_fusion_fast": EarlyFusionFast,
        "late_fusion_fast": LateFusionFast,
        "middle_fusion_fast": MidFusionFast,
    }
    if name not in registry:
        raise ValueError(f"Unknown audio_video model: {name}")
    return registry[name](num_classes, dtype=dtype)


AV_MODEL_NAMES = (
    "early_fusion_resnet", "early_fusion_mobilenet", "late_fusion_mobilenet",
    "middle_fusion_mobilenet", "early_fusion_fast", "late_fusion_fast",
    "middle_fusion_fast",
)
