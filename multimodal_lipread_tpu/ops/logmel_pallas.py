"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel invocation per clip fuses the entire audio feature pipeline that
the reference runs in torchaudio C++ inside DataLoader workers
(reference: audio/utils/audio_processor.py:48-64), in the FRAMING-FREE
split-GEMM formulation (ops/logmel.py:block_signal — materializing the
(126, 400) frame tensor costs more than every matmul combined):

    hop blocks (128, 160)                        -> one 80 KB VMEM read
      spec = blocks[0:126] @ W0                  -> MXU matmul
           + blocks[1:127] @ W1                  -> MXU matmul
           + blocks[2:128] @ W2 (zero-padded)    -> MXU matmul
      -> power = re² + im²  (126, 256)           -> VPU
      @ mel filterbank (256, 80)                 -> MXU matmul
      -> log(· + 1e-9)                           -> VPU
      -> transpose to (80, 126)
      -> per-clip standardization (ddof=1)       -> VPU reductions

Everything stays in VMEM, so the only HBM traffic is the 80 KB of blocks in
and the (80, 126) output — ~2.5× less input traffic than a framed kernel,
and zero gather/copy work outside the MXU.
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
    HOP_LENGTH,
    LOG_EPS,
    N_BLOCKS,
    N_FFT,
    N_MELS,
    NORM_EPS,
    NUM_FRAMES,
    block_signal,
    dft_basis_split,
    mel_filterbank_padded,
)

_TAIL = N_FFT - 2 * HOP_LENGTH  # 80 basis rows in the third factor


@functools.lru_cache(maxsize=None)
def _basis_factors_padded() -> tuple:
    """(W0, W1, W2p): the hop-split DFT basis with W2 zero-padded from
    (80, 512) to (160, 512) so the kernel's third matmul takes full blocks
    (a sub-lane-width slice would fight the (8, 128) tiling; the extra zero
    FLOPs are ~13% of one of three matmuls)."""
    w0, w1, w2 = dft_basis_split()
    w2p = np.zeros_like(w0)
    w2p[:_TAIL] = w2
    return w0, w1, w2p


def _logmel_kernel(blocks_ref, w0_ref, w1_ref, w2_ref, fb_ref, out_ref, *, normalize: bool):
    blocks = blocks_ref[0]  # (N_BLOCKS, HOP)
    t = NUM_FRAMES
    # precision=HIGHEST: the MXU's default bf16 passes lose ~0.4% on re/im,
    # which explodes through the power-spectrum cancellation at spectral
    # nulls and then through log(); full-f32 multi-pass matmuls keep parity
    # with torchaudio at <2e-5 in log space (validated on hardware).
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    spec = (
        jnp.dot(blocks[0:t], w0_ref[:], **kw)
        + jnp.dot(blocks[1 : t + 1], w1_ref[:], **kw)
        + jnp.dot(blocks[2 : t + 2], w2_ref[:], **kw)
    )
    re = spec[:, :FREQ_PAD]
    im = spec[:, FREQ_PAD:]
    power = re * re + im * im  # (126, 256)
    # Mel projection: (126, 256) @ (256, 80)
    mel = jnp.dot(power, fb_ref[:], **kw)
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
    blocks = block_signal(wave.astype(jnp.float32))  # (B, N_BLOCKS, HOP)
    batch = blocks.shape[0]
    w0, w1, w2p = (jnp.asarray(w) for w in _basis_factors_padded())
    fb = jnp.asarray(mel_filterbank_padded())

    flops_per_clip = (
        3 * 2 * NUM_FRAMES * HOP_LENGTH * 2 * FREQ_PAD
        + 2 * NUM_FRAMES * FREQ_PAD * N_MELS
    )
    return pl.pallas_call(
        functools.partial(_logmel_kernel, normalize=normalize),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, N_BLOCKS, HOP_LENGTH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HOP_LENGTH, 2 * FREQ_PAD), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HOP_LENGTH, 2 * FREQ_PAD), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HOP_LENGTH, 2 * FREQ_PAD), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_PAD, N_MELS), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_MELS, NUM_FRAMES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, N_MELS, NUM_FRAMES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=batch * flops_per_clip,
            bytes_accessed=batch * (N_BLOCKS * HOP_LENGTH + N_MELS * NUM_FRAMES) * 4,
            transcendentals=batch * NUM_FRAMES * N_MELS,
        ),
        interpret=interpret,
    )(blocks, w0, w1, w2p, fb)
