"""Audio + textual-cue fusion zoo: the 7 reference architectures, TPU-native.

Registry (reference: audio_cues/train.py:119-133): early_fusion_mobile,
middle_fusion_mobile, late_fusion_mobile, early_fusion_resnet,
middle_fusion_resnet, late_fusion_resnet, test_model.

Inputs: ``mel`` (B, 80, input_size) log-mel; ``cue`` (B, cue_dim) sentence
embedding (768-d mpnet by default).

Bug-compatibility note: the reference's early-fusion attention gate applies
softmax over **dim=0 — the batch axis** (audio_cues/models/
early_fusion_mobile.py:65 and early_fusion_resnet.py:61). That makes
per-example outputs depend on the rest of the batch; reproducing it would
poison padded-batch evaluation, so this build uses a sigmoid gate (per-example,
same parameter shapes). Set ``batch_softmax_gate=True`` to reproduce the
reference literally for parity studies.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.models.backbones import MobileNetV2, ResNet


class MelMobileNetEncoder(nn.Module):
    """MobileNetV2 over the 1-channel mel image → 1280-d
    (reference: audio_cues/models/early_fusion_mobile.py:6-19)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool = False):
        return MobileNetV2(dtype=self.dtype, name="mobilenet")(mel[..., None], train)


class MelResNetEncoder(nn.Module):
    """ResNet18 over the 1-channel mel image → 512-d
    (reference: audio_cues/models/early_fusion_resnet.py:6-17)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool = False):
        return ResNet(18, dtype=self.dtype, name="resnet")(mel[..., None], train)


class CueProjEncoder(nn.Module):
    """Linear(cue_dim→128) → ReLU → Dropout(0.2)
    (reference: audio_cues/models/early_fusion_mobile.py:22-33)."""

    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cue, train: bool = False):
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(cue)
        x = nn.relu(x)
        return nn.Dropout(0.2)(x, deterministic=not train)


class _GatedEarlyFusion(nn.Module):
    """concat → attention gate → MLP classifier (shared early-fusion shape)."""

    num_classes: int
    batch_softmax_gate: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused, train: bool = False):
        d = fused.shape[-1]
        s = nn.Dense(d, dtype=self.dtype, name="attn_fc1")(fused)
        s = jnp.tanh(s)
        # open-gate init (sigmoid(2)≈0.88, the LSTM forget-gate trick): a
        # zero-init bias lets aggressive Adam steps saturate the sigmoid to
        # 0 for every example, zeroing `fused` AND the gate's own gradient.
        # The reference's batch-softmax gate cannot die this way (it sums
        # to 1 over the batch), so the per-example sigmoid replacement gets
        # the classic gate-bias guard. Note this guards the GATE only: at
        # the reference's family lr (0.001, ac_config.yaml:14) the
        # MelMobileNet encoder itself still collapses (dead ReLU6); the
        # architecture trains cleanly at lr 1e-4 (see ZOO.md footnote).
        s = nn.Dense(1, dtype=self.dtype, name="attn_fc2",
                     bias_init=nn.initializers.constant(2.0))(s)  # (B, 1)
        if self.batch_softmax_gate:
            gate = nn.softmax(s, axis=0)  # reference bug: softmax over the batch
        else:
            gate = nn.sigmoid(s)
        fused = fused * gate
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(fused)
        x = nn.relu(x)
        x = nn.Dropout(0.3)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class _SelfAttnMidFusion(nn.Module):
    """concat → 1-token MultiheadAttention → MLP classifier
    (reference: audio_cues/models/middle_fusion_mobile.py:36-66)."""

    num_classes: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused, train: bool = False):
        seq = fused[:, None, :]
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype,
                                               name="cross_attn")(seq, seq)
        x = attn[:, 0, :]
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class _ModalitySoftmaxLateFusion(nn.Module):
    """Learnable 2-vector softmax weights over per-modality logits
    (reference: audio_cues/models/late_fusion_mobile.py:50-58)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a_logits, c_logits):
        w = self.param("attn_weights", lambda k: jnp.ones((2,), jnp.float32))
        w = nn.softmax(w, axis=0)
        return w[0] * a_logits + w[1] * c_logits


class EarlyFusionAttentionMobile(nn.Module):
    num_classes: int
    batch_softmax_gate: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelMobileNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        c = CueProjEncoder(dtype=self.dtype, name="cue_encoder")(cue, train)
        fused = jnp.concatenate([a, c], axis=-1)
        return _GatedEarlyFusion(self.num_classes, self.batch_softmax_gate,
                                 dtype=self.dtype, name="fusion")(fused, train)


class MiddleFusionAttentionMobile(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelMobileNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        c = CueProjEncoder(dtype=self.dtype, name="cue_encoder")(cue, train)
        fused = jnp.concatenate([a, c], axis=-1)
        return _SelfAttnMidFusion(self.num_classes, dtype=self.dtype, name="fusion")(fused, train)


class LateFusionAttentionMobile(nn.Module):
    """(reference: audio_cues/models/late_fusion_mobile.py:43-59)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelMobileNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        a = nn.Dense(256, dtype=self.dtype, name="audio_fc1")(a)
        a = nn.relu(a)
        a = nn.Dropout(0.3)(a, deterministic=not train)
        a_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="audio_fc2")(a)
        c = nn.Dense(128, dtype=self.dtype, name="cue_fc1")(cue)
        c = nn.relu(c)
        c = nn.Dropout(0.2)(c, deterministic=not train)
        c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cue_fc2")(c)
        return _ModalitySoftmaxLateFusion(dtype=self.dtype, name="late")(a_logits, c_logits)


class EarlyFusionAttentionResNet(nn.Module):
    num_classes: int
    batch_softmax_gate: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelResNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        c = CueProjEncoder(dtype=self.dtype, name="cue_encoder")(cue, train)
        fused = jnp.concatenate([a, c], axis=-1)
        return _GatedEarlyFusion(self.num_classes, self.batch_softmax_gate,
                                 dtype=self.dtype, name="fusion")(fused, train)


class MiddleFusionAttentionResNet(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelResNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        c = CueProjEncoder(dtype=self.dtype, name="cue_encoder")(cue, train)
        fused = jnp.concatenate([a, c], axis=-1)
        return _SelfAttnMidFusion(self.num_classes, dtype=self.dtype, name="fusion")(fused, train)


class LateFusionAttentionResNet(nn.Module):
    """(reference: audio_cues/models/late_fusion_resnet.py:40-55)"""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelResNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        a = nn.Dense(256, dtype=self.dtype, name="audio_fc1")(a)
        a = nn.relu(a)
        a = nn.Dropout(0.3)(a, deterministic=not train)
        a_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="audio_fc2")(a)
        c = nn.Dense(128, dtype=self.dtype, name="cue_fc1")(cue)
        c = nn.relu(c)
        c = nn.Dropout(0.2)(c, deterministic=not train)
        c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cue_fc2")(c)
        return _ModalitySoftmaxLateFusion(dtype=self.dtype, name="late")(a_logits, c_logits)


class MultimodalNet(nn.Module):
    """Plain concat baseline (reference: audio_cues/models/test_model.py:9-81)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, cue, train: bool = False):
        a = MelResNetEncoder(dtype=self.dtype, name="audio_encoder")(mel, train)
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc1")(cue)
        c = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="cue_bn")(c)
        c = nn.relu(c)
        c = nn.Dropout(0.3)(c, deterministic=not train)
        c = nn.Dense(256, dtype=self.dtype, name="cue_fc2")(c)
        c = nn.relu(c)
        fused = jnp.concatenate([a, c], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(fused)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


def get_audio_cues_model(name: str, num_classes: int, dtype: Any = jnp.float32) -> nn.Module:
    registry = {
        "early_fusion_mobile": EarlyFusionAttentionMobile,
        "middle_fusion_mobile": MiddleFusionAttentionMobile,
        "late_fusion_mobile": LateFusionAttentionMobile,
        "early_fusion_resnet": EarlyFusionAttentionResNet,
        "middle_fusion_resnet": MiddleFusionAttentionResNet,
        "late_fusion_resnet": LateFusionAttentionResNet,
        "test_model": MultimodalNet,
    }
    if name not in registry:
        raise ValueError(f"Unknown audio_cues model: {name}")
    return registry[name](num_classes, dtype=dtype)


AUDIO_CUES_MODEL_NAMES = (
    "early_fusion_mobile", "middle_fusion_mobile", "late_fusion_mobile",
    "early_fusion_resnet", "middle_fusion_resnet", "late_fusion_resnet",
    "test_model",
)
