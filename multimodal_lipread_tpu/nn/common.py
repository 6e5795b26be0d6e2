"""Common building blocks: classifier heads, MLPs, adaptive pooling,
time-distributed application.

TimeDistributed (reference: video/models/resnet_lstm.py:15-53, re-implemented
per-model in the reference) is just a reshape here — XLA sees one big batched
conv over (B*T, H, W, C), which is exactly what the MXU wants. The chunked /
checkpointed variants the reference needs for 2 GB GPUs
(cues_video/models/early_fusion_mobile.py:10-62) are unnecessary; use
``jax.checkpoint`` at the model level if memory ever demands it.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def time_distributed(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Apply ``fn`` per frame: (B, T, ...) → (B, T, F...)."""
    B, T = x.shape[0], x.shape[1]
    flat = x.reshape((B * T,) + x.shape[2:])
    out = fn(flat)
    return out.reshape((B, T) + out.shape[1:])


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Sequence[int | None]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d for NHWC tensors with static shapes.

    ``output_size`` entries may be None (keep that dimension). Bin boundaries
    match torch: start = floor(i*L/out), end = ceil((i+1)*L/out).
    """
    B, H, W, C = x.shape
    oh = H if output_size[0] is None else int(output_size[0])
    ow = W if output_size[1] is None else int(output_size[1])

    def pool_axis(arr, in_len, out_len, axis):
        if in_len == out_len:
            return arr
        starts = np.floor(np.arange(out_len) * in_len / out_len).astype(int)
        ends = np.ceil((np.arange(out_len) + 1) * in_len / out_len).astype(int)
        slices = [
            jnp.mean(jnp.take(arr, jnp.arange(s, e), axis=axis), axis=axis, keepdims=True)
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, H, oh, axis=1)
    x = pool_axis(x, W, ow, axis=2)
    return x


class MLP(nn.Module):
    """Dense → [BatchNorm] → ReLU → Dropout stack with a final Dense."""

    hidden_sizes: Sequence[int]
    num_outputs: int
    dropout_rate: float = 0.0
    use_batchnorm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense{i}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"bn{i}",
                )(x)
            x = nn.relu(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_outputs, dtype=self.dtype, name="out")(x)


class ClassifierHead(nn.Module):
    """The reference's recurring Linear→BN→ReLU→Dropout→Linear classifier
    (e.g. audio/models/resnet_model.py:22-35)."""

    hidden_size: int
    num_classes: int
    dropout_rate: float = 0.5
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
