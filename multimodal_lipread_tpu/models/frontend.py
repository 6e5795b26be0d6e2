"""On-device feature frontends that fuse preprocessing into the train step.

Used by the streaming pipelines: host workers ship RAW records (20k-sample
waveforms, uint8 lip tensors) and the device computes features inside the
jitted step — the reference instead recomputes features per sample per epoch
in DataLoader worker processes (reference: audio/train.py:59-84 +
audio/utils/audio_processor.py:48-64).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodal_lipread_tpu.ops.logmel import log_mel


class WaveToLogMel(nn.Module):
    """Wrap an audio model with the fused on-device log-mel frontend.

    Input: (B, 20000) waveforms → normalized log-mel sliced to
    (B, 80, input_size) → wrapped model. The log-mel math always runs in
    float32 internally (bf16 corrupts the power spectrum at spectral nulls),
    regardless of the wrapped model's compute dtype.

    NOTE: parameters nest one level deeper than the bare model — pretrained
    grafting specs must prefix the submodule path with ``model`` (e.g.
    ``submodule: [model, resnet]``).
    """

    model: Any
    input_size: int = 117
    impl: str = "auto"

    @nn.compact
    def __call__(self, wave: jnp.ndarray, train: bool = False, **kwargs):
        mel = log_mel(wave.astype(jnp.float32), normalize=True, impl=self.impl)
        mel = mel[:, :80, : self.input_size]
        return self.model(mel, train=train, **kwargs)
