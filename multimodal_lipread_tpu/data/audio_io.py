"""Host-side audio decode to fixed-length waveforms.

TPU-first split of the reference's AudioProcessor.load_audio
(reference: audio/utils/audio_processor.py:23-46): decode happens on the host
(ffmpeg subprocess for compressed formats, pure-python ``wave`` for PCM WAV),
producing a deterministic float32 waveform padded/truncated to
``target_duration * sample_rate`` samples (1.25 s @ 16 kHz = 20,000). All
spectral work (STFT/mel/log/normalize) then runs on-device
(see multimodal_lipread_tpu.ops.logmel).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from typing import Optional

import numpy as np

SAMPLE_RATE = 16000
TARGET_DURATION = 1.25
TARGET_SAMPLES = int(TARGET_DURATION * SAMPLE_RATE)  # 20000


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _load_wav(path: str) -> "tuple[np.ndarray, int]":
    """Decode a PCM WAV file to a mono float waveform at its native rate.

    Matches pydub's sample scaling: int16 sample values are used as-is
    (the reference feeds raw int16-range floats into the mel transform,
    audio/utils/audio_processor.py:29).
    """
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sr = w.getframerate()
        frames = w.readframes(w.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(frames, dtype="<i2").astype(np.float32)
    elif sampwidth == 4:
        data = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 65536.0
    elif sampwidth == 1:
        data = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"Unsupported WAV sample width {sampwidth} in {path}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, sr


def _load_via_ffmpeg(path: str, sample_rate: int) -> np.ndarray:
    """Decode any compressed format via an ffmpeg subprocess → mono int16 PCM.

    Equivalent of the reference's pydub m4a path
    (audio/utils/audio_processor.py:26-29): resample + mono downmix happen in
    ffmpeg, samples arrive in int16 range.
    """
    cmd = [
        "ffmpeg", "-v", "error", "-i", path,
        "-f", "s16le", "-acodec", "pcm_s16le",
        "-ac", "1", "-ar", str(sample_rate), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, dtype="<i2").astype(np.float32)


def load_waveform(
    path: str,
    sample_rate: int = SAMPLE_RATE,
    target_samples: Optional[int] = TARGET_SAMPLES,
) -> np.ndarray:
    """Load an audio file as a mono float32 waveform of fixed length.

    Pads with zeros / truncates to ``target_samples``
    (reference: audio/utils/audio_processor.py:39-44).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        data, sr = _load_wav(path)
        if sr != sample_rate:
            if not _ffmpeg_available():
                raise RuntimeError(f"WAV at {sr} Hz needs resampling but ffmpeg is unavailable: {path}")
            data = _load_via_ffmpeg(path, sample_rate)
    else:
        if not _ffmpeg_available():
            raise RuntimeError(
                f"Decoding {ext} requires ffmpeg, which is not installed. "
                f"Convert the dataset to 16 kHz WAV or install ffmpeg."
            )
        data = _load_via_ffmpeg(path, sample_rate)

    if target_samples is not None:
        if data.shape[0] > target_samples:
            data = data[:target_samples]
        elif data.shape[0] < target_samples:
            data = np.pad(data, (0, target_samples - data.shape[0]))
    return np.ascontiguousarray(data, dtype=np.float32)


def write_wav(path: str, waveform: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    """Write a float waveform (int16 range) to a PCM16 WAV file."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pcm = np.clip(waveform, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
