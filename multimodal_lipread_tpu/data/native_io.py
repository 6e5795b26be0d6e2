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

# must match native/mlt_io.cpp::mlt_io_version() — a stale gitignored .so
# built from older source is rebuilt, not loaded (its missing/changed
# symbols would otherwise crash callers instead of falling back)
_EXPECTED_VERSION = 3


def _build(force: bool = False) -> bool:
    try:
        cmd = ["make", "-B", "-C", _NATIVE_DIR] if force else ["make", "-C", _NATIVE_DIR]
        subprocess.run(cmd, check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> None:
    """Declare signatures; raises AttributeError on a stale library."""
    lib.mlt_io_version.restype = ctypes.c_int
    lib.mlt_io_version.argtypes = []
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
    lib.mlt_prefetch_create.restype = ctypes.c_void_p
    lib.mlt_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_longlong, ctypes.c_int,
    ]
    lib.mlt_prefetch_start.restype = None
    lib.mlt_prefetch_start.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
    ]
    lib.mlt_prefetch_next.restype = ctypes.c_longlong
    lib.mlt_prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
    ]
    lib.mlt_prefetch_first_error.restype = ctypes.c_longlong
    lib.mlt_prefetch_first_error.argtypes = [ctypes.c_void_p]
    lib.mlt_prefetch_destroy.restype = None
    lib.mlt_prefetch_destroy.argtypes = [ctypes.c_void_p]


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    A library whose ``mlt_io_version`` is missing (AttributeError) or stale
    triggers ONE forced rebuild + reload; if that still mismatches, callers
    fall back to pure Python rather than crash on absent symbols.
    """
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        for attempt in (0, 1):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                _bind(lib)
                if lib.mlt_io_version() != _EXPECTED_VERSION:
                    raise AttributeError(
                        f"mlt_io_version {lib.mlt_io_version()} != {_EXPECTED_VERSION}"
                    )
                _lib = lib
                return _lib
            except (OSError, AttributeError):
                # stale .so from older source — rebuild once and retry
                # (g++ writes a new inode, so the reload is not dlopen-cached)
                if attempt == 0 and _build(force=True):
                    continue
                break
        _load_failed = True
        return None


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


class NativePrefetcher:
    """In-order background prefetcher over a fixed file list (C++ thread
    pool + bounded ring; see native/mlt_io.cpp "prefetcher").

    One instance per dataset split; per epoch, call :meth:`start_epoch` with
    the (shuffled, sharded) index order, then drain :meth:`next_batch` until
    it returns fewer than requested. Failed reads are zero-filled and
    reported via :attr:`first_error` (the reference's loaders raise
    mid-epoch instead — here a bad file costs one zeroed weight-0-able
    record, not the run).

    kind='npy_u8': records are raw uint8 arrays of ``record_shape``.
    kind='wav': records are float32 waveforms of ``record_shape=(samples,)``
    decoded from PCM16 WAVs at ``sample_rate``.
    """

    def __init__(
        self,
        paths: Sequence[str],
        kind: str,
        record_shape: Sequence[int],
        sample_rate: int = 16000,
        capacity: int = 256,
        n_threads: int = DEFAULT_THREADS,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable (no compiler?)")
        if kind not in ("npy_u8", "wav"):
            raise ValueError(f"unknown prefetch kind: {kind!r}")
        self._lib = lib
        self.kind = kind
        self.record_shape = tuple(int(s) for s in record_shape)
        self.dtype = np.uint8 if kind == "npy_u8" else np.float32
        elems = int(np.prod(self.record_shape))
        # serializes every C call on this handle: close() must never run
        # mlt_prefetch_destroy while another thread is inside _next (the C++
        # side wakes blocked consumers on stop, but freeing the Prefetcher
        # under a still-returning call would be a race)
        self._op_lock = threading.Lock()
        # C++ copies paths into std::string synchronously during create —
        # the ctypes array is a plain local
        self._handle = lib.mlt_prefetch_create(
            _paths_array(paths), len(paths), 0 if kind == "npy_u8" else 1,
            elems, sample_rate, capacity, n_threads,
        )
        if not self._handle:
            raise RuntimeError("mlt_prefetch_create failed")
        self.n_files = len(paths)

    def _require_handle(self):
        h = getattr(self, "_handle", None)
        if not h:
            # explicit error instead of passing NULL into C (segfault)
            raise RuntimeError("NativePrefetcher is closed")
        return h

    def start_epoch(self, order: np.ndarray) -> None:
        order = np.ascontiguousarray(order, np.int64)
        # explicit raise (not assert): an out-of-range index would reach the
        # C++ worker_loop, which indexes paths with no bounds check — and
        # assert is stripped under ``python -O``
        if order.size and (order.min() < 0 or order.max() >= self.n_files):
            raise ValueError(
                f"epoch order indices must be in [0, {self.n_files}); got "
                f"range [{order.min()}, {order.max()}]"
            )
        with self._op_lock:
            # C++ copies order synchronously (order.assign) — no keepalive
            self._lib.mlt_prefetch_start(
                self._require_handle(),
                order.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                order.size,
            )

    def next_batch(self, k: int) -> Optional[np.ndarray]:
        """The next ≤k records in epoch order; None when the epoch is done."""
        out = np.empty((k,) + self.record_shape, self.dtype)
        with self._op_lock:
            got = self._lib.mlt_prefetch_next(
                self._require_handle(), out.ctypes.data_as(ctypes.c_void_p), k
            )
        if got == 0:
            return None
        return out[:got]

    @property
    def first_error(self) -> int:
        """Index of the first failed read this epoch, or -1."""
        with self._op_lock:
            return int(self._lib.mlt_prefetch_first_error(self._require_handle()))

    def close(self) -> None:
        with getattr(self, "_op_lock", threading.Lock()):
            if getattr(self, "_handle", None):
                self._lib.mlt_prefetch_destroy(self._handle)
                self._handle = None

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass
