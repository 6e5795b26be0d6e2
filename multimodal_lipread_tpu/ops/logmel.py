"""On-device log-mel spectrogram frontend.

Numerically matches ``torchaudio.transforms.MelSpectrogram(sample_rate=16000,
n_fft=400, hop_length=160, n_mels=80, normalized=True)`` followed by
``log(mel + 1e-9)`` and per-clip standardization — the reference audio
frontend (reference: audio/utils/audio_processor.py:15-64) — but computed
on the TPU as matmuls instead of in DataLoader workers:

- STFT expressed as a windowed-DFT **matmul** (frames @ [cos | sin] basis),
  which runs on the MXU, instead of an FFT; for n_fft=400 this is a tiny
  GEMM and the MXU eats it.
- mel projection is a second matmul with the (HTK-scale, unnormalized)
  triangular filterbank, identical to ``torchaudio.functional.melscale_fbanks``.
- ``normalized=True`` (window L2 normalization) is folded into the DFT basis.
- the whole pipeline (window ∘ DFT ∘ power ∘ mel ∘ log ∘ standardize) is
  fused into ONE Pallas kernel per clip (see ``logmel_pallas.py``); a pure-XLA
  path is kept for CPU tests and as a fallback.

Semantics pinned down (validated against torch.stft in tests/test_logmel.py):
- Hann window, periodic, win_length = n_fft = 400
- center=True with reflect padding of n_fft//2 = 200
- power spectrogram |STFT|^2 / sum(window^2)   (normalized=True, power=2)
- HTK mel scale, f_min=0, f_max=sr/2, norm=None
- log(mel + 1e-9)
- per-clip (x - mean) / (std + 1e-9) with torch's unbiased std (ddof=1),
  computed over the FULL (80, n_frames) spectrogram BEFORE any time slicing
  (reference: audio/data_utils/dataset.py:42-52 normalizes then slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
LOG_EPS = 1e-9
NORM_EPS = 1e-9

# Fixed-length input contract: 20,000 samples (1.25 s @ 16 kHz)
NUM_SAMPLES = 20000
# center=True ⇒ reflect-pad n_fft//2 on both sides
PAD = N_FFT // 2
NUM_FRAMES = 1 + NUM_SAMPLES // HOP_LENGTH  # 126
N_FREQS = N_FFT // 2 + 1  # 201

# Lane-aligned layout used by both the XLA and Pallas paths:
# DFT basis (n_fft, 512) with cos in columns [0, 256) and sin in [256, 512);
# only the first N_FREQS columns of each half are nonzero.
FREQ_PAD = 256


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


@functools.lru_cache(maxsize=None)
def dft_basis(n_fft: int = N_FFT, normalized: bool = True) -> np.ndarray:
    """Windowed real-DFT basis of shape (n_fft, 2*FREQ_PAD), float32.

    column j < N_FREQS:              window[n] * cos(2π j n / n_fft)
    column FREQ_PAD + j, j < N_FREQS: -window[n] * sin(2π j n / n_fft)
    (sign matches the DFT convention X_j = Σ x_n e^{-2πi jn/N}).
    Window L2 normalization (torchaudio normalized=True) is folded in as
    1/sqrt(Σ w²) so the power spectrum needs no further scaling.
    """
    w = hann_window(n_fft)
    if normalized:
        w = w / np.sqrt(np.sum(w ** 2))
    n = np.arange(n_fft)[:, None]
    j = np.arange(N_FREQS)[None, :]
    ang = 2.0 * np.pi * n * j / n_fft
    basis = np.zeros((n_fft, 2 * FREQ_PAD), dtype=np.float64)
    basis[:, :N_FREQS] = w[:, None] * np.cos(ang)
    basis[:, FREQ_PAD : FREQ_PAD + N_FREQS] = -w[:, None] * np.sin(ang)
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int = N_MELS,
    n_freqs: int = N_FREQS,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, shape (n_freqs, n_mels).

    Identical construction to torchaudio.functional.melscale_fbanks with
    norm=None, mel_scale='htk'.
    """
    if f_max is None:
        f_max = sample_rate / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def mel_filterbank_padded() -> np.ndarray:
    """(FREQ_PAD, N_MELS) filterbank with zero rows above N_FREQS."""
    fb = np.zeros((FREQ_PAD, N_MELS), dtype=np.float32)
    fb[:N_FREQS] = mel_filterbank()
    return fb


def frame_signal(wave: jnp.ndarray) -> jnp.ndarray:
    """Reflect-pad and frame waveforms: (..., NUM_SAMPLES) → (..., NUM_FRAMES, N_FFT)."""
    padded = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(PAD, PAD)], mode="reflect")
    idx = np.arange(NUM_FRAMES)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    return jnp.take(padded, jnp.asarray(idx), axis=-1)


# Framing-free formulation: materializing the (B, 126, 400) frame tensor
# costs ~1.5 ms at B=128 on TPU — 80% of the whole op (the frames carry 2.5×
# redundant data through lane-misaligned copies). Because hop (160) divides
# the frame into block-aligned pieces (400 = 160 + 160 + 80), the windowed
# DFT factors into THREE matmuls over hop-sized blocks of the padded wave:
#     frame f = [blocks[f] | blocks[f+1] | blocks[f+2][:80]]
#   ⇒ spec    = blocks[0:126] @ W[0:160]
#             + blocks[1:127] @ W[160:320]
#             + blocks[2:128, :80] @ W[320:400]
# Same FLOPs, no gather, no frame tensor. Both the XLA path and the Pallas
# kernel are built on this.
N_BLOCKS = -(-(NUM_SAMPLES + 2 * PAD) // HOP_LENGTH)  # ceil(20400/160) = 128
_BLOCK_PAD = N_BLOCKS * HOP_LENGTH - (NUM_SAMPLES + 2 * PAD)  # 80 zeros


def block_signal(wave: jnp.ndarray) -> jnp.ndarray:
    """Reflect-pad and view as hop blocks: (..., NUM_SAMPLES) → (..., N_BLOCKS, HOP)."""
    lead = [(0, 0)] * (wave.ndim - 1)
    padded = jnp.pad(wave, lead + [(PAD, PAD)], mode="reflect")
    padded = jnp.pad(padded, lead + [(0, _BLOCK_PAD)])
    return padded.reshape(wave.shape[:-1] + (N_BLOCKS, HOP_LENGTH))


@functools.lru_cache(maxsize=None)
def dft_basis_split() -> tuple:
    """The windowed-DFT basis split at hop boundaries: rows [0:160),
    [160:320), [320:400) of :func:`dft_basis` — the three per-block factors
    of the framing-free formulation."""
    basis = dft_basis()
    return (
        basis[:HOP_LENGTH],
        basis[HOP_LENGTH : 2 * HOP_LENGTH],
        basis[2 * HOP_LENGTH :],
    )


def _standardize(logmel: jnp.ndarray) -> jnp.ndarray:
    """Per-clip (x-μ)/(σ+eps) with unbiased std, over the last two axes."""
    n = logmel.shape[-1] * logmel.shape[-2]
    mean = jnp.mean(logmel, axis=(-2, -1), keepdims=True)
    sq = jnp.sum((logmel - mean) ** 2, axis=(-2, -1), keepdims=True)
    std = jnp.sqrt(sq / (n - 1))
    return (logmel - mean) / (std + NORM_EPS)


@functools.partial(jax.jit, static_argnames=("normalize",))
def log_mel_xla(wave: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Pure-XLA log-mel: (B, NUM_SAMPLES) → (B, N_MELS, NUM_FRAMES) float32.

    Framing-free split-GEMM formulation (see :func:`block_signal`).
    Jitted at this boundary: on remote/tunneled backends, eager per-op
    dispatch of the ~15-op pipeline costs minutes of compile round-trips
    per fresh process, vs one cached executable."""
    blocks = block_signal(wave.astype(jnp.float32))  # (B, N_BLOCKS, HOP)
    w0, w1, w2 = (jnp.asarray(w) for w in dft_basis_split())
    t = NUM_FRAMES
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    spec = (
        jnp.einsum("bth,hf->btf", blocks[:, :t], w0, **kw)
        + jnp.einsum("bth,hf->btf", blocks[:, 1 : t + 1], w1, **kw)
        + jnp.einsum("bth,hf->btf", blocks[:, 2 : t + 2, : N_FFT - 2 * HOP_LENGTH], w2, **kw)
    )
    re, im = spec[..., :FREQ_PAD], spec[..., FREQ_PAD:]
    power = re * re + im * im  # (B, T, FREQ_PAD); cols >= N_FREQS are 0
    fb = jnp.asarray(mel_filterbank_padded())
    mel = jnp.einsum(
        "btf,fm->bmt", power, fb,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    logmel = jnp.log(mel + LOG_EPS)
    return _standardize(logmel) if normalize else logmel


@functools.partial(jax.jit, static_argnames=("normalize",))
def log_mel_fft(wave: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """rfft-based log-mel: (B, NUM_SAMPLES) → (B, N_MELS, NUM_FRAMES) float32.

    The windowed-DFT-as-GEMM formulation is PRECISION-bound on the MXU: the
    power-spectrum cancellation at spectral nulls forces
    ``Precision.HIGHEST`` (6-pass bf16), so the matmul runs at ~1/6 of peak
    (docs/PERFORMANCE.md "Log-mel frontend"). A real FFT sidesteps that
    entirely — ~24× fewer FLOPs (5·N·log₂N vs 2·N·512 per frame) and XLA's
    TPU FFT runs in f32, so there is no bf16 cancellation to begin with.
    Numerics match the GEMM path to <1e-5 in log space.
    """
    frames = frame_signal(wave.astype(jnp.float32))  # (B, T, n_fft)
    w = hann_window()
    w = w / np.sqrt(np.sum(w**2))  # normalized=True folded into the window
    spec = jnp.fft.rfft(frames * jnp.asarray(w, jnp.float32), axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, T, N_FREQS)
    fb = jnp.asarray(mel_filterbank())
    mel = jnp.einsum(
        "btf,fm->bmt", power, fb,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    logmel = jnp.log(mel + LOG_EPS)
    return _standardize(logmel) if normalize else logmel


def log_mel(wave: jnp.ndarray, normalize: bool = True, impl: str = "auto") -> jnp.ndarray:
    """Log-mel frontend: (B, 20000) waveforms → (B, 80, 126) spectrograms.

    impl: 'auto', 'xla' (framing-free split-GEMM), 'pallas' (fused per-clip
    TPU kernel on the same formulation), or 'fft' (rfft power spectrum).
    'auto' selects 'xla' — the split-GEMM measured fastest
    (docs/PERFORMANCE.md "Log-mel frontend"): frame materialization, not
    the GEMM, dominated the old formulation; XLA's TPU FFT is slower than
    the HIGHEST-precision matmuls despite ~24× fewer FLOPs. The Pallas
    kernel and FFT path are kept as documented measured alternatives.
    """
    if impl == "auto":
        impl = "xla"
    if impl == "fft":
        return log_mel_fft(wave, normalize=normalize)
    if impl == "pallas":
        from multimodal_lipread_tpu.ops.logmel_pallas import log_mel_pallas

        return log_mel_pallas(wave, normalize=normalize)
    return log_mel_xla(wave, normalize=normalize)
