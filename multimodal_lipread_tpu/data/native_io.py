"""ctypes binding for the native host-IO library (native/mlt_io.cpp).

Provides threaded batch WAV decoding and .npy lip-sequence loading — the
framework's first-party replacement for the reference's third-party native
host decode (pydub/torchaudio/numpy, SURVEY.md §2.9). The library is built
on demand with the repo's Makefile (g++); every entry point falls back to the
pure-Python implementation when a compiler is unavailable, so correctness
never depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmlt_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

DEFAULT_THREADS = min(16, os.cpu_count() or 4)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mlt_load_wav_batch.restype = ctypes.c_longlong
            lib.mlt_load_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.mlt_load_npy_u8_batch.restype = ctypes.c_longlong
            lib.mlt_load_npy_u8_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _load_failed = True
        return _lib


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_wav_batch(
    paths: Sequence[str],
    target_samples: int = 20000,
    sample_rate: int = 16000,
    n_threads: int = DEFAULT_THREADS,
) -> Optional[np.ndarray]:
    """Threaded native decode of PCM16 WAVs → (N, target_samples) float32.

    Returns None when the native library is unavailable or any file is not a
    plain PCM16 WAV at ``sample_rate`` (the caller falls back to the
    Python/ffmpeg path, which resamples)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), target_samples), np.float32)
    status = lib.mlt_load_wav_batch(
        _paths_array(paths), len(paths), target_samples, sample_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out if status == 0 else None


def load_npy_u8_batch(
    paths: Sequence[str],
    shape: Sequence[int],
    scale: float = 1.0 / 255.0,
    n_threads: int = DEFAULT_THREADS,
) -> Optional[np.ndarray]:
    """Threaded native load of uint8 .npy files → (N, *shape) float32 * scale."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    elems = int(np.prod(shape))
    out = np.empty((len(paths), elems), np.float32)
    status = lib.mlt_load_npy_u8_batch(
        _paths_array(paths), len(paths), elems, scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if status != 0:
        return None
    return out.reshape((len(paths),) + tuple(shape))
