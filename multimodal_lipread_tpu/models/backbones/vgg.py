"""VGG-BN backbones (11/13/16/19), torchvision 'features' topology in Flax.

The reference's audio classifiers run VGG-BN over 1-channel log-mel images
(reference: audio/models/vgg_model.py:12-15, vgg_lstm_model.py:13-17).
Returns the final conv feature map (NHWC); pooling/heads live in the models.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

_CFGS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
         512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    """VGG-BN feature extractor. Input NHWC → feature map NHWC (512 channels)."""

    version: int = 11
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.version not in _CFGS:
            raise ValueError(f"Invalid VGG version: {self.version}")
        conv_idx = 0
        for v in _CFGS[self.version]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(int(v), (3, 3), padding=1, dtype=self.dtype, name=f"conv{conv_idx}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"bn{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        return x
