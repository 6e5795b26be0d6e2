"""Shared pipeline plumbing: config → arrays → Trainer.

Feature extraction happens ONCE, up front, on device — unlike the reference,
which recomputes features per sample per epoch inside DataLoader workers
(SURVEY.md §3.1). Per-clip outputs are identical; only the schedule differs.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from multimodal_lipread_tpu.config import Config, load_config
from multimodal_lipread_tpu.data.audio_io import load_waveform
from multimodal_lipread_tpu.data.glips import (
    SPLITS,
    AUDIO_EXTS,
    GlipsIndex,
    scan_glips,
)
from multimodal_lipread_tpu.ops.logmel import log_mel
from multimodal_lipread_tpu.train.trainer import ArrayDataset

MEL_BINS = 80


def compute_logmel_features(
    waves: np.ndarray, input_size: int = 117, chunk: int = 256, impl: str = "auto"
) -> np.ndarray:
    """(N, 20000) waveforms → (N, 80, input_size) normalized log-mel, on device.

    Normalization runs over the full (80, 126) spectrogram BEFORE time slicing,
    matching the reference order (audio/data_utils/dataset.py:42-52).
    """
    out: List[np.ndarray] = []
    n = waves.shape[0]
    for start in range(0, n, chunk):
        batch = jnp.asarray(waves[start : start + chunk], jnp.float32)
        mel = log_mel(batch, normalize=True, impl=impl)  # (b, 80, 126)
        out.append(np.asarray(mel[:, :MEL_BINS, :input_size]))
    return np.concatenate(out, axis=0) if out else np.zeros((0, MEL_BINS, input_size), np.float32)


def decode_waveforms(paths: Sequence[str]) -> np.ndarray:
    """Host decode of audio files to fixed 20,000-sample float32 waveforms.

    PCM WAV batches go through the threaded native decoder
    (native/mlt_io.cpp); anything else (m4a, odd sample rates) falls back to
    the Python/ffmpeg path per file.
    """
    if not paths:
        return np.zeros((0, 20000), np.float32)
    if all(p.lower().endswith(".wav") for p in paths):
        from multimodal_lipread_tpu.data.native_io import load_wav_batch

        native = load_wav_batch(paths)
        if native is not None:
            return native
    return np.stack([load_waveform(p) for p in paths])


def load_audio_datasets(
    root_dir: str,
    input_size: int = 117,
    splits: Sequence[str] = SPLITS,
    words: Optional[Sequence[str]] = None,
    impl: str = "auto",
) -> Tuple[Dict[str, ArrayDataset], GlipsIndex]:
    """Scan GLips, decode + featurize all audio clips, return per-split datasets."""
    index = scan_glips(root_dir, exts=AUDIO_EXTS, words=words)
    class_to_idx = index.class_to_idx
    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = index.by_split(split)
        waves = decode_waveforms([e.path for e in entries])
        mels = compute_logmel_features(waves, input_size=input_size, impl=impl)
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(mels,), labels=labels)
    return datasets, index


def load_lip_sequences(paths: Sequence[str]) -> np.ndarray:
    """Load lip-region .npy files → (N, 29, 44, 44, 3) float32 in [0, 1] (NTHWC).

    The reference loads the same arrays, scales by 1/255 and permutes to
    (C, T, H, W) (video/data_utils/dataset_loader.py:84-94); we keep
    channels-last for TPU conv layouts.
    """
    if not paths:
        return np.zeros((0, 29, 44, 44, 3), np.float32)
    from multimodal_lipread_tpu.data.native_io import load_npy_u8_batch

    native = load_npy_u8_batch(paths, (29, 44, 44, 3))
    if native is not None:
        return native
    return np.stack([np.load(p).astype(np.float32) / 255.0 for p in paths])


def load_video_datasets(
    lip_root: str,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], "GlipsIndex"]:
    """Scan a lip-region mirror tree and materialize per-split video datasets."""
    from multimodal_lipread_tpu.data.glips import scan_lip_regions

    index = scan_lip_regions(lip_root)
    class_to_idx = index.class_to_idx
    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = index.by_split(split)
        lips = load_lip_sequences([e.path for e in entries])
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(lips,), labels=labels)
    return datasets, index


def parse_cli(default_config: Optional[str] = None) -> Config:
    """--config path.yaml [--set a.b=c ...] → Config with overrides applied."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=default_config, required=default_config is None)
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()
    cfg = load_config(args.config)
    for kv in args.set:
        key, _, value = kv.partition("=")
        try:
            import yaml

            value = yaml.safe_load(value)
        except Exception:
            pass
        cfg.set(key, value)
    cfg.set("_cli.resume", bool(args.resume))
    return cfg


def default_dirs(cfg: Config, pipeline: str) -> Tuple[str, str]:
    """(metrics_dir, checkpoints_dir) for a pipeline, reference-style layout."""
    base = cfg.get("output.base_dir", pipeline)
    metrics = cfg.get("output.metrics_dir", os.path.join(base, "metrics"))
    ckpts = cfg.get("output.checkpoints_dir", os.path.join(base, "models_trained"))
    return metrics, ckpts
