"""Triple fusion (audio + cue + video) zoo: the 7 reference architectures.

Registry (reference: audio_cues_video/train.py:144-159): early_fusion_mobile,
middle_fusion_mobile, late_fusion_mobile, early_fusion_resnet,
middle_fusion_resnet, late_fusion_resnet, test_model.

Inputs: ``mel`` (B, 80, input_size), ``cue`` (B, cue_dim),
``lip`` (B, T, 44, 44, 3) NTHWC.

Freezing semantics: the reference's early variants set requires_grad=False
and BN.eval() at construction (early_fusion_mobile.py:136-144) — but the
train loop's per-epoch ``model.train()`` (train.py:53) flips BN back to
batch-stats mode, so the EFFECTIVE reference behavior is train-mode BN with
no weight gradients. ``frozen=True`` reproduces exactly that: BN follows the
train flag, outputs are stop_gradient'd, and the pipeline excludes the
frozen param prefixes from optimizer updates.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import BiLSTM
from multimodal_lipread_tpu.models.backbones import MobileNetV2, ResNet


class ModalityAttentionFusion(nn.Module):
    """Stack M modality vectors; MLP scores → softmax over modalities →
    weighted sum (reference: audio_cues_video/models/early_fusion_mobile.py:10-25).
    Returns (fused, weights)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        stacked = jnp.stack(feats, axis=1)  # (B, M, D)
        d = stacked.shape[-1]
        s = nn.Dense(max(d // 2, 1), dtype=self.dtype, name="attn_fc1")(stacked)
        s = nn.relu(s)
        scores = nn.Dense(1, dtype=self.dtype, name="attn_fc2")(s).squeeze(-1)  # (B, M)
        weights = nn.softmax(scores, axis=1)
        fused = jnp.sum(stacked * weights[..., None], axis=1)
        return fused, weights


class TripleAudioEncoder(nn.Module):
    """ResNet18 over the 1-channel mel image → 512-d; optionally frozen
    (reference: early_fusion_mobile.py:128-152).

    ``frozen_bn_eval=True`` runs the (frozen) backbone's BatchNorm on its
    running averages even under ``train=True`` — the reference's
    CONSTRUCTION-time intent (``BN.eval()``, early_fusion_mobile.py:141-144)
    before its train loop's ``model.train()`` flips it back. This makes the
    frozen encoder per-sample deterministic, which is what permits
    ``training.cache_frozen_features`` (precompute-once) with an identical
    trajectory."""

    frozen: bool = False
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool = False, cached_features: bool = False):
        if cached_features:
            # `mel` is already the precomputed (B, 512) encoder output
            return mel
        # The reference freezes params + BN.eval() at construction, but its
        # train loop calls model.train() every epoch (train.py:53), which
        # puts BN back in batch-stats mode — so the effective reference
        # behavior is train-mode BN with no weight gradients. Reproduce
        # that by default: BN follows `train`; gradients stop below; frozen
        # params are additionally excluded from the optimizer by the pipeline.
        bb_train = train and not (self.frozen and self.frozen_bn_eval)
        feats = ResNet(18, dtype=self.dtype, name="resnet")(mel[..., None], bb_train)
        return jax.lax.stop_gradient(feats) if self.frozen else feats


class TripleCueEncoder(nn.Module):
    """Per-variant cue MLP — the reference ships TWO CueEncoder topologies:

    - style='early': Linear(768→256)→BN→ReLU→Drop(0.3)→Linear(256→256)→ReLU
      (early_fusion_mobile.py:158-172, early_fusion_resnet.py:142-152,
      test_model.py:103-113)
    - style='plain': Linear(768→256)→BN→ReLU→Linear(256→256) — no dropout,
      no final ReLU (middle_fusion_mobile.py:70-78, late_fusion_mobile.py:
      70-78, middle_fusion_resnet.py:145-154, late_fusion_resnet.py:63-72)
    """

    style: str = "early"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, train: bool = False):
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(cue)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        if self.style == "early":
            x = nn.Dropout(0.3)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        return nn.relu(x) if self.style == "early" else x


class TripleVideoEncoder(nn.Module):
    """Per-frame backbone + BiLSTM, LAST step → (B, feature_dim).

    Reference parity: early variants and middle_fusion_resnet use FROZEN
    backbones with a 1-layer BiLSTM (early_fusion_mobile.py:78-122,
    middle_fusion_resnet.py:69-109); middle/late mobile and late resnet use
    trainable backbones with 2-layer BiLSTMs (middle_fusion_mobile.py:34-55,
    late_fusion_resnet.py:33-48)."""

    backbone: str = "mobilenet_v2"
    feature_dim: int = 256
    frozen: bool = False
    frozen_bn_eval: bool = False
    lstm_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, train: bool = False, cached_features: bool = False,
                 return_cnn_features: bool = False):
        if cached_features:
            # `video` is already the precomputed (B, T, D) per-frame CNN
            # features; only the trainable BiLSTM runs
            seq = video
        else:
            B, T = video.shape[0], video.shape[1]
            flat = video.reshape((B * T,) + video.shape[2:])
            # BN runs in train mode even when frozen by default — see
            # TripleAudioEncoder; frozen_bn_eval pins it to running stats
            bb_train = train and not (self.frozen and self.frozen_bn_eval)
            if self.backbone == "mobilenet_v2":
                feats = MobileNetV2(dtype=self.dtype, name="cnn")(flat, bb_train)
            else:
                feats = ResNet(18, dtype=self.dtype, name="cnn")(flat, bb_train)
            if self.frozen:
                feats = jax.lax.stop_gradient(feats)
            seq = feats.reshape(B, T, -1)
            if return_cnn_features:
                return seq
        # reference: nn.LSTM(..., dropout=0.3) on the 2-layer variants
        out = BiLSTM(self.feature_dim // 2, self.lstm_layers, dropout=0.3,
                     dtype=self.dtype, name="lstm")(seq, train=train)
        return out[:, -1, :]


class MultimodalAttentionEarly(nn.Module):
    """(reference: early_fusion_mobile.py:178-213; resnet variant
    early_fusion_resnet.py)"""

    num_classes: int
    video_backbone: str = "mobilenet_v2"
    frozen: bool = True
    lstm_layers: int = 1
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, lip, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        audio_enc = TripleAudioEncoder(frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       dtype=self.dtype, name="audio")
        video_enc = TripleVideoEncoder(self.video_backbone, frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       lstm_layers=self.lstm_layers,
                                       dtype=self.dtype, name="video")
        a = audio_enc(mel, train, cached_features)
        if return_frozen_features:
            return a, video_enc(lip, train, return_cnn_features=True)
        c = TripleCueEncoder(dtype=self.dtype, name="cue")(cue, train)
        v = video_enc(lip, train, cached_features)
        a = nn.Dense(256, dtype=self.dtype, name="ap")(a)
        c = nn.Dense(256, dtype=self.dtype, name="cp")(c)
        v = nn.Dense(256, dtype=self.dtype, name="vp")(v)
        fused, _ = ModalityAttentionFusion(dtype=self.dtype, name="attn")([a, c, v])
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(fused)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class MultimodalAttentionMiddle(nn.Module):
    """(reference: middle_fusion_mobile.py:85-114)"""

    num_classes: int
    video_backbone: str = "mobilenet_v2"
    frozen: bool = False
    lstm_layers: int = 2
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, lip, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        audio_enc = TripleAudioEncoder(frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       dtype=self.dtype, name="audio")
        video_enc = TripleVideoEncoder(self.video_backbone, frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       lstm_layers=self.lstm_layers,
                                       dtype=self.dtype, name="video")
        a = audio_enc(mel, train, cached_features)
        if return_frozen_features:
            return a, video_enc(lip, train, return_cnn_features=True)
        c = TripleCueEncoder(style="plain", dtype=self.dtype, name="cue")(cue, train)
        v = video_enc(lip, train, cached_features)
        a = nn.Dense(256, dtype=self.dtype, name="ap")(a)
        v = nn.Dense(256, dtype=self.dtype, name="vp")(v)
        fused, _ = ModalityAttentionFusion(dtype=self.dtype, name="attn")([a, c, v])
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(fused)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class MultimodalAttentionLate(nn.Module):
    """Per-modality logits → modality attention over logits
    (reference: late_fusion_mobile.py:85-107)."""

    num_classes: int
    video_backbone: str = "mobilenet_v2"
    frozen: bool = False
    lstm_layers: int = 2
    frozen_bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, lip, train: bool = False,
                 cached_features: bool = False,
                 return_frozen_features: bool = False):
        audio_enc = TripleAudioEncoder(frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       dtype=self.dtype, name="audio")
        video_enc = TripleVideoEncoder(self.video_backbone, frozen=self.frozen,
                                       frozen_bn_eval=self.frozen_bn_eval,
                                       lstm_layers=self.lstm_layers,
                                       dtype=self.dtype, name="video")
        a = audio_enc(mel, train, cached_features)
        if return_frozen_features:
            return a, video_enc(lip, train, return_cnn_features=True)
        c = TripleCueEncoder(style="plain", dtype=self.dtype, name="cue")(cue, train)
        v = video_enc(lip, train, cached_features)
        a_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="afc")(a)
        c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cfc")(c)
        v_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="vfc")(v)
        fused, _ = ModalityAttentionFusion(dtype=self.dtype, name="attn")(
            [a_logits, c_logits, v_logits]
        )
        return fused


class MultimodalThreeNet(nn.Module):
    """Plain concat baseline (reference: audio_cues_video/models/test_model.py:27-172)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, lip, train: bool = False):
        a = TripleAudioEncoder(dtype=self.dtype, name="audio")(mel, train)
        c = TripleCueEncoder(dtype=self.dtype, name="cue")(cue, train)
        v = TripleVideoEncoder("mobilenet_v2", lstm_layers=2, dtype=self.dtype,
                               name="video")(lip, train)
        fused = jnp.concatenate([a, c, v], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(fused)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


def get_triple_model(name: str, num_classes: int, dtype: Any = jnp.float32,
                     frozen_bn_eval: bool = False) -> nn.Module:
    # reference parity table (freeze, lstm_layers):
    #   early mobile/resnet + middle resnet → frozen encoders, 1-layer BiLSTM
    #   middle/late mobile + late resnet    → trainable encoders, 2-layer BiLSTM
    # frozen_bn_eval pins the FROZEN encoders' BN to running stats (the
    # reference's construction-time intent; required by feature caching) —
    # a no-op for the variants with trainable encoders.
    if name == "early_fusion_mobile":
        return MultimodalAttentionEarly(num_classes, "mobilenet_v2", True, 1,
                                        frozen_bn_eval, dtype=dtype)
    if name == "middle_fusion_mobile":
        return MultimodalAttentionMiddle(num_classes, "mobilenet_v2", False, 2, dtype=dtype)
    if name == "late_fusion_mobile":
        return MultimodalAttentionLate(num_classes, "mobilenet_v2", False, 2, dtype=dtype)
    if name == "early_fusion_resnet":
        return MultimodalAttentionEarly(num_classes, "resnet18", True, 1,
                                        frozen_bn_eval, dtype=dtype)
    if name == "middle_fusion_resnet":
        return MultimodalAttentionMiddle(num_classes, "resnet18", True, 1,
                                         frozen_bn_eval, dtype=dtype)
    if name == "late_fusion_resnet":
        return MultimodalAttentionLate(num_classes, "resnet18", False, 2, dtype=dtype)
    if name == "test_model":
        return MultimodalThreeNet(num_classes, dtype=dtype)
    raise ValueError(f"Unknown audio_cues_video model: {name}")


# param-path prefixes the reference freezes in the early variants
# (audio ResNet + video backbone, early_fusion_mobile.py:136-144)
FROZEN_PARAM_PREFIXES = {
    "early_fusion_mobile": (("audio", "resnet"), ("video", "cnn")),
    "early_fusion_resnet": (("audio", "resnet"), ("video", "cnn")),
    "middle_fusion_resnet": (("audio", "resnet"), ("video", "cnn")),
}


TRIPLE_MODEL_NAMES = (
    "early_fusion_mobile", "middle_fusion_mobile", "late_fusion_mobile",
    "early_fusion_resnet", "middle_fusion_resnet", "late_fusion_resnet",
    "test_model",
)
