"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel invocation per clip fuses the entire audio feature pipeline that
the reference runs in torchaudio C++ inside DataLoader workers
(reference: audio/utils/audio_processor.py:48-64):

    frames (126, 400)
      @ windowed-DFT basis (400, 512)          -> MXU matmul
      -> power = re² + im²  (126, 256)          -> VPU
      @ mel filterbank (256, 80)                -> MXU matmul
      -> log(· + 1e-9)                          -> VPU
      -> transpose to (80, 126)
      -> per-clip standardization (ddof=1)      -> VPU reductions

Everything stays in VMEM (~1.5 MB of operands), so the only HBM traffic is
the input frames and the (80, 126) output — the op is compute-bound on the
MXU rather than bandwidth-bound.

Framing (reflect pad + strided gather) stays in XLA: the hop (160) and window
(400) are not lane-aligned, so an in-kernel gather would fight the (8, 128)
tiling for no FLOP benefit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_lipread_tpu.ops.logmel import (
    FREQ_PAD,
    LOG_EPS,
    N_FFT,
    N_MELS,
    NORM_EPS,
    NUM_FRAMES,
    dft_basis,
    frame_signal,
    mel_filterbank_padded,
)


def _logmel_kernel(frames_ref, basis_ref, fb_ref, out_ref, *, normalize: bool):
    frames = frames_ref[0]  # (NUM_FRAMES, N_FFT)
    # Windowed DFT as one MXU matmul: (126, 400) @ (400, 512).
    # precision=HIGHEST: the MXU's default bf16 passes lose ~0.4% on re/im,
    # which explodes through the power-spectrum cancellation at spectral
    # nulls and then through log(); full-f32 multi-pass matmuls keep parity
    # with torchaudio at <2e-5 in log space (validated on hardware). The
    # kernel costs 0.09 ms for a batch of 32 either way — correctness wins.
    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    re = spec[:, :FREQ_PAD]
    im = spec[:, FREQ_PAD:]
    power = re * re + im * im  # (126, 256)
    # Mel projection: (126, 256) @ (256, 80)
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log(mel + LOG_EPS)  # (126, 80)
    logmel = logmel.T  # (80, 126)

    if normalize:
        n = N_MELS * NUM_FRAMES
        mean = jnp.sum(logmel) / n
        centered = logmel - mean
        var = jnp.sum(centered * centered) / (n - 1)
        std = jnp.sqrt(var)
        out_ref[0] = centered / (std + NORM_EPS)
    else:
        out_ref[0] = logmel


@functools.partial(jax.jit, static_argnames=("normalize", "interpret"))
def log_mel_pallas(wave: jnp.ndarray, normalize: bool = True, interpret: bool = False) -> jnp.ndarray:
    """(B, 20000) float waveforms → (B, 80, 126) log-mel spectrograms."""
    frames = frame_signal(wave.astype(jnp.float32))  # (B, 126, 400)
    batch = frames.shape[0]
    basis = jnp.asarray(dft_basis())
    fb = jnp.asarray(mel_filterbank_padded())

    flops_per_clip = 2 * NUM_FRAMES * N_FFT * 2 * FREQ_PAD + 2 * NUM_FRAMES * FREQ_PAD * N_MELS
    return pl.pallas_call(
        functools.partial(_logmel_kernel, normalize=normalize),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, NUM_FRAMES, N_FFT), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 2 * FREQ_PAD), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_PAD, N_MELS), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_MELS, NUM_FRAMES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, N_MELS, NUM_FRAMES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=batch * flops_per_clip,
            bytes_accessed=batch * (NUM_FRAMES * N_FFT + N_MELS * NUM_FRAMES) * 4,
            transcendentals=batch * NUM_FRAMES * N_MELS,
        ),
        interpret=interpret,
    )(frames, basis, fb)
