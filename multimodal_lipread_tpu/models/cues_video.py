"""Video + textual-cue fusion zoo: the 7 reference architectures, TPU-native.

Registry (reference: cues_video/train.py model selection): early_fusion_mobile,
middle_fusion_mobile, late_fusion_mobile, early_fusion_resnet,
middle_fusion_resnet, late_fusion_resnet, test_model.

Inputs (cue first, matching the reference's forward(cue, video)):
``cue`` (B, cue_dim); ``video`` (B, T, 44, 44, 3) NTHWC.

The reference's memory machinery — TimeDistributedChunked(chunk=8) and
torch.utils.checkpoint wrappers (cues_video/models/early_fusion_mobile.py:10-62)
— is unnecessary here: frames are encoded as one (B*T) batched conv and XLA
rematerializes as needed (use jax.checkpoint at the step level if ever
required). ``freeze_backbone`` is reproduced with ``jax.lax.stop_gradient``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import BiLSTM, SingleQueryAttention
from multimodal_lipread_tpu.models.backbones import MobileNetV2, ResNet


class VideoLSTMSeqEncoder(nn.Module):
    """Per-frame backbone + BiLSTM returning the FULL (B, T, D) sequence.

    Reference parity per variant family: the MOBILE encoders freeze the
    MobileNet features and use a 1-layer BiLSTM
    (cues_video/models/early_fusion_mobile.py:68-127,
    middle_fusion_mobile.py:57-106); the RESNET encoders train the backbone
    and use a 2-layer BiLSTM (early/middle/late_fusion_resnet.py ResNetLSTM).
    """

    backbone: str = "mobilenet_v2"
    feature_dim: int = 256
    freeze_backbone: bool = False
    lstm_layers: int = 1
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, train: bool = False, cached_features: bool = False,
                 return_cnn_features: bool = False):
        if cached_features:
            # `video` is already the precomputed (B, T, D) CNN feature seq
            seq = video
        else:
            B, T = video.shape[0], video.shape[1]
            flat = video.reshape((B * T,) + video.shape[2:])
            # frozen_bn_eval pins the frozen backbone's BN to running stats
            # (per-sample deterministic → feature caching stays exact)
            bb_train = train and not (self.freeze_backbone and self.frozen_bn_eval)
            if self.backbone == "mobilenet_v2":
                feats = MobileNetV2(dtype=self.dtype, name="cnn")(flat, bb_train)
            else:
                feats = ResNet(18, dtype=self.dtype, name="cnn")(flat, bb_train)
            if self.freeze_backbone:
                feats = jax.lax.stop_gradient(feats)
            seq = feats.reshape(B, T, -1)
            if return_cnn_features:
                return seq
        # reference: nn.LSTM(..., dropout=0.3) — effective only for the
        # 2-layer (resnet/test_model) variants, matching torch semantics
        return BiLSTM(self.feature_dim // 2, self.lstm_layers, dropout=0.3,
                      dtype=self.dtype, name="lstm")(seq, train=train)


class EarlyAttentionFusion(nn.Module):
    """cue proj queries video seq → attended → MLP
    (reference: cues_video/models/early_fusion_mobile.py:152-200)."""

    num_classes: int
    backbone: str = "mobilenet_v2"
    freeze_backbone: bool = True
    lstm_layers: int = 1
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, video, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        enc = VideoLSTMSeqEncoder(self.backbone, 256, self.freeze_backbone,
                                  self.lstm_layers, self.frozen_bn_eval,
                                  dtype=self.dtype, name="video_encoder")
        if return_frozen_features:
            return enc(video, train, return_cnn_features=True)
        vseq = enc(video, train, cached_features)
        c = nn.Dense(256, dtype=self.dtype, name="cue_proj")(cue)
        c = nn.relu(c)
        attended = SingleQueryAttention(256, dtype=self.dtype, name="attn")(c, vseq)
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(attended)
        x = nn.relu(x)
        x = nn.Dropout(0.3)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class MiddleAttentionFusion(nn.Module):
    """concat(video last step, attended) → fusion MLP
    (reference: cues_video/models/middle_fusion_mobile.py:133-172)."""

    num_classes: int
    backbone: str = "mobilenet_v2"
    freeze_backbone: bool = False
    lstm_layers: int = 1
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, video, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        enc = VideoLSTMSeqEncoder(self.backbone, 256, self.freeze_backbone,
                                  self.lstm_layers, self.frozen_bn_eval,
                                  dtype=self.dtype, name="video_encoder")
        if return_frozen_features:
            return enc(video, train, return_cnn_features=True)
        vseq = enc(video, train, cached_features)
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc")(cue)
        c = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="cue_bn")(c)
        c = nn.relu(c)
        attended = SingleQueryAttention(256, dtype=self.dtype, name="attn")(c, vseq)
        fused = jnp.concatenate([vseq[:, -1, :], attended], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="fusion_fc")(fused)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


class LateAttentionFusion(nn.Module):
    """Per-modality logits; a tiny MLP computes softmax 2-weights from their
    concat (reference: cues_video/models/late_fusion_mobile.py:105-148)."""

    num_classes: int
    backbone: str = "mobilenet_v2"
    freeze_backbone: bool = True
    lstm_layers: int = 1
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, video, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        enc = VideoLSTMSeqEncoder(self.backbone, 256, self.freeze_backbone,
                                  self.lstm_layers, self.frozen_bn_eval,
                                  dtype=self.dtype, name="video_encoder")
        if return_frozen_features:
            return enc(video, train, return_cnn_features=True)
        vseq = enc(video, train, cached_features)
        v_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="video_head")(vseq[:, -1, :])
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc1")(cue)
        c = nn.relu(c)
        c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cue_fc2")(c)
        g = nn.Dense(64, dtype=self.dtype, name="gate_fc1")(
            jnp.concatenate([v_logits, c_logits], axis=-1)
        )
        g = nn.relu(g)
        g = nn.Dense(2, dtype=self.dtype, name="gate_fc2")(g)
        w = nn.softmax(g, axis=-1)
        return w[:, 0:1] * v_logits + w[:, 1:2] * c_logits


class MultimodalCueVideoNet(nn.Module):
    """Plain concat baseline (reference: cues_video/models/test_model.py:83-107)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, video, train: bool = False):
        vseq = VideoLSTMSeqEncoder("mobilenet_v2", 256, False, 2, dtype=self.dtype,
                                   name="video_encoder")(video, train)
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc1")(cue)
        c = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="cue_bn")(c)
        c = nn.relu(c)
        c = nn.Dropout(0.3)(c, deterministic=not train)
        # reference CueEncoder ends with a second Linear(256,256), no
        # activation (cues_video/models/test_model.py:63-77)
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc2")(c)
        fused = jnp.concatenate([vseq[:, -1, :], c], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="fusion_fc")(fused)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="fusion_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def get_cues_video_model(name: str, num_classes: int, dtype: Any = jnp.float32,
                         frozen_bn_eval: bool = False,
                         freeze_backbone: "bool | None" = None) -> nn.Module:
    # reference parity: mobile encoders = frozen MobileNet + 1-layer BiLSTM;
    # resnet encoders = trainable ResNet18 + 2-layer BiLSTM (see
    # VideoLSTMSeqEncoder docstring for the file:line evidence).
    # frozen_bn_eval pins the FROZEN backbone's BN to running stats (enables
    # exact feature caching) — a no-op for the trainable-backbone variants.
    # freeze_backbone=None keeps each variant's reference default; an
    # explicit bool overrides it (config model.freeze_backbone) — the
    # reference's frozen-mobile design presumes IMAGENET features
    # (middle_fusion_mobile.py:70 pretrained=True), which this zero-egress
    # image cannot provide, so unfreezing is the honest trainable fallback
    # (see experiments/cues_video_rank_study.py for the measured effect).
    fz = freeze_backbone

    def _fz(default: bool) -> bool:
        return default if fz is None else fz

    if name == "early_fusion_mobile":
        return EarlyAttentionFusion(num_classes, "mobilenet_v2", _fz(True), 1,
                                    frozen_bn_eval, dtype=dtype)
    if name == "middle_fusion_mobile":
        return MiddleAttentionFusion(num_classes, "mobilenet_v2", _fz(True), 1,
                                     frozen_bn_eval, dtype=dtype)
    if name == "late_fusion_mobile":
        return LateAttentionFusion(num_classes, "mobilenet_v2", _fz(True), 1,
                                   frozen_bn_eval, dtype=dtype)
    if name == "early_fusion_resnet":
        return EarlyAttentionFusion(num_classes, "resnet18", _fz(False), 2,
                                    frozen_bn_eval, dtype=dtype)
    if name == "middle_fusion_resnet":
        return MiddleAttentionFusion(num_classes, "resnet18", _fz(False), 2,
                                     frozen_bn_eval, dtype=dtype)
    if name == "late_fusion_resnet":
        return LateAttentionFusion(num_classes, "resnet18", _fz(False), 2,
                                   frozen_bn_eval, dtype=dtype)
    if name == "test_model":
        return MultimodalCueVideoNet(num_classes, dtype=dtype)
    raise ValueError(f"Unknown cues_video model: {name}")


# param-path prefixes the reference freezes (requires_grad=False); feed to
# TrainerConfig.frozen_param_prefixes so the optimizer skips them entirely
FROZEN_PARAM_PREFIXES = {
    "early_fusion_mobile": (("video_encoder", "cnn"),),
    "middle_fusion_mobile": (("video_encoder", "cnn"),),
    "late_fusion_mobile": (("video_encoder", "cnn"),),
}


CUES_VIDEO_MODEL_NAMES = (
    "early_fusion_mobile", "middle_fusion_mobile", "late_fusion_mobile",
    "early_fusion_resnet", "middle_fusion_resnet", "late_fusion_resnet",
    "test_model",
)
