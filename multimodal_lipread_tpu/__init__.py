"""multimodal_lipread_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
word-level multimodal lip reading on the GLips dataset.

Provides the full capability surface of the reference
``Aswath25S/multimodal_lipread`` project (see SURVEY.md), re-designed
TPU-first:

- seven pipelines: audio, video, audio_video, cues, audio_cues, cues_video,
  audio_cues_video
- a fused Pallas log-mel frontend (STFT + mel filterbank + log + normalize)
- a Flax model zoo (ResNet / VGG / MobileNet / ShuffleNet backbones, BiLSTM /
  Transformer / attention heads, early/mid/late fusion modules)
- one generic data-parallel Trainer (`pjit` over a `jax.sharding.Mesh`)
  reproducing the reference's CSV/TXT logging and best-val checkpointing
"""

__version__ = "0.2.0"

from multimodal_lipread_tpu.config import Config, load_config  # noqa: F401
