"""Numerical validation of the log-mel frontend against torchaudio semantics.

torchaudio itself is not installed here, so the golden values are produced
with torch.stft + a hand-built melscale_fbanks that follows the documented
torchaudio construction (HTK scale, norm=None). This reproduces
``MelSpectrogram(sample_rate=16000, n_fft=400, hop_length=160, n_mels=80,
normalized=True)`` exactly (reference: audio/utils/audio_processor.py:15-21).
"""

import numpy as np
import pytest

from multimodal_lipread_tpu.ops import logmel as lm

torch = pytest.importorskip("torch")


def torch_golden_logmel(wave_np: np.ndarray) -> np.ndarray:
    """torchaudio-equivalent log-mel via torch.stft (float64 for reference)."""
    x = torch.from_numpy(wave_np.astype(np.float64))
    window = torch.hann_window(lm.N_FFT, dtype=torch.float64)
    stft = torch.stft(
        x,
        n_fft=lm.N_FFT,
        hop_length=lm.HOP_LENGTH,
        win_length=lm.N_FFT,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = stft.abs() ** 2 / window.pow(2).sum()  # normalized=True, power=2
    fb = torch.from_numpy(lm.mel_filterbank().astype(np.float64))  # (n_freqs, n_mels)
    mel = torch.matmul(power.transpose(-1, -2), fb).transpose(-1, -2)  # (B, n_mels, T)
    return torch.log(mel + lm.LOG_EPS).numpy()


def torch_normalize(spec: np.ndarray) -> np.ndarray:
    t = torch.from_numpy(spec)
    out = []
    for s in t:
        out.append(((s - s.mean()) / (s.std() + lm.NORM_EPS)).numpy())
    return np.stack(out)


@pytest.fixture(scope="module")
def waves(rng=None):
    r = np.random.default_rng(42)
    # int16-range waveforms like the pydub decode path produces
    return (r.standard_normal((4, lm.NUM_SAMPLES)) * 5000).astype(np.float32)


def test_mel_filterbank_shape_and_coverage():
    fb = lm.mel_filterbank()
    assert fb.shape == (lm.N_FREQS, lm.N_MELS)
    # every filter has nonzero mass; triangles tile the band
    assert (fb.sum(axis=0) > 0).all()
    assert fb.min() >= 0


def test_xla_matches_torch_golden(waves):
    got = np.asarray(lm.log_mel_xla(waves, normalize=False))
    want = torch_golden_logmel(waves)
    assert got.shape == (4, lm.N_MELS, lm.NUM_FRAMES)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_xla_normalized_matches_torch(waves):
    got = np.asarray(lm.log_mel_xla(waves, normalize=True))
    want = torch_normalize(torch_golden_logmel(waves))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # standardization: per-clip mean ~0, unbiased std ~1
    assert abs(float(got[0].mean())) < 1e-4
    assert abs(float(got[0].std(ddof=1)) - 1.0) < 1e-3


def test_pallas_matches_xla(waves):
    from multimodal_lipread_tpu.ops.logmel_pallas import log_mel_pallas

    want = np.asarray(lm.log_mel_xla(waves, normalize=True))
    got = np.asarray(log_mel_pallas(waves, normalize=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_unnormalized(waves):
    from multimodal_lipread_tpu.ops.logmel_pallas import log_mel_pallas

    want = np.asarray(lm.log_mel_xla(waves, normalize=False))
    got = np.asarray(log_mel_pallas(waves, normalize=False, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frame_count_and_slice_contract(waves):
    out = np.asarray(lm.log_mel(waves, impl="xla"))
    # dataset contract: slice [:80, :117] AFTER normalization
    sliced = out[:, :80, :117]
    assert sliced.shape == (4, 80, 117)
