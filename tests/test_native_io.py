"""Native host-IO library tests: parity with the pure-Python loaders."""

import os

import numpy as np
import pytest

from multimodal_lipread_tpu.data.audio_io import load_waveform, write_wav
from multimodal_lipread_tpu.data.native_io import get_lib, load_npy_u8_batch, load_wav_batch


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_native_wav_matches_python(lib, tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        wave = (rng.standard_normal(15000 + 2000 * i) * 5000).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, wave)
        paths.append(p)

    native = load_wav_batch(paths, target_samples=20000)
    assert native is not None and native.shape == (4, 20000)
    python = np.stack([load_waveform(p) for p in paths])
    np.testing.assert_allclose(native, python, atol=0.51)  # int16 write rounding only


def test_native_wav_pad_and_truncate(lib, tmp_path):
    long_wave = np.arange(30000, dtype=np.float32) % 1000
    p = str(tmp_path / "long.wav")
    write_wav(p, long_wave)
    out = load_wav_batch([p], target_samples=20000)
    assert out.shape == (1, 20000)

    short = np.ones(100, np.float32) * 100
    p2 = str(tmp_path / "short.wav")
    write_wav(p2, short)
    out2 = load_wav_batch([p2], target_samples=20000)
    assert out2[0, 100:].sum() == 0  # zero-padded tail


def test_native_wav_bad_file_returns_none(lib, tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav at all")
    assert load_wav_batch([p]) is None


def test_native_npy_matches_numpy(lib, tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    ref = []
    for i in range(3):
        arr = rng.integers(0, 256, size=(29, 44, 44, 3), dtype=np.uint8)
        p = str(tmp_path / f"l{i}.npy")
        np.save(p, arr)
        paths.append(p)
        ref.append(arr.astype(np.float32) / 255.0)

    native = load_npy_u8_batch(paths, (29, 44, 44, 3))
    assert native is not None
    np.testing.assert_allclose(native, np.stack(ref), rtol=1e-6)


def test_native_npy_wrong_dtype_returns_none(lib, tmp_path):
    p = str(tmp_path / "f32.npy")
    np.save(p, np.zeros((2, 2), np.float32))
    assert load_npy_u8_batch([p], (2, 2)) is None


def test_native_wav_rejects_wrong_sample_rate(lib, tmp_path):
    """A 44.1 kHz WAV must be rejected (caller resamples via ffmpeg path)."""
    p = str(tmp_path / "hi_rate.wav")
    write_wav(p, np.ones(1000, np.float32) * 100, sample_rate=44100)
    assert load_wav_batch([p], sample_rate=16000) is None
    # and accepted when the expected rate matches
    out = load_wav_batch([p], sample_rate=44100)
    assert out is not None and out.shape == (1, 20000)


def test_native_npy_rejects_wrong_shape(lib, tmp_path):
    """A differently-shaped array with enough bytes must be rejected, not
    silently reinterpreted."""
    p = str(tmp_path / "wrong_shape.npy")
    np.save(p, np.zeros((29, 48, 48, 3), np.uint8))  # bigger than expected
    assert load_npy_u8_batch([p], (29, 44, 44, 3)) is None


def test_native_npy_truncated_file_safe(lib, tmp_path):
    p = str(tmp_path / "trunc.npy")
    with open(p, "wb") as f:
        f.write(b"\x93NUMPY\x02\x00\x10\x00")  # 10-byte v2 header stub
    assert load_npy_u8_batch([p], (2, 2)) is None
