"""ShuffleNetV2 backbone (x0.5 / x1.0), torchvision topology, in Flax NHWC.

Backs the reference's shufflenet_lstm video model
(reference: video/models/shufflenet_lstm.py:27-111).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

_STAGE_OUT = {
    0.5: ((48, 96, 192), 1024),
    1.0: ((116, 232, 464), 1024),
}
_REPEATS = (4, 8, 4)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(B, H, W, C)


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                            dtype=self.dtype)(x)


class ShuffleUnit(nn.Module):
    features: int  # total output channels
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_ch = self.features // 2
        if self.strides == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            x1 = x2 = x
            # branch1 only exists for stride-2 units
            x1 = nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1, feature_group_count=x.shape[-1],
                         use_bias=False, dtype=self.dtype, name="b1_dw")(x1)
            x1 = _BN(self.dtype, name="b1_dw_bn")(x1, train)
            x1 = nn.Conv(branch_ch, (1, 1), use_bias=False, dtype=self.dtype, name="b1_pw")(x1)
            x1 = _BN(self.dtype, name="b1_pw_bn")(x1, train)
            x1 = nn.relu(x1)

        y = nn.Conv(branch_ch, (1, 1), use_bias=False, dtype=self.dtype, name="b2_pw1")(x2)
        y = _BN(self.dtype, name="b2_pw1_bn")(y, train)
        y = nn.relu(y)
        y = nn.Conv(branch_ch, (3, 3), strides=self.strides, padding=1, feature_group_count=branch_ch,
                    use_bias=False, dtype=self.dtype, name="b2_dw")(y)
        y = _BN(self.dtype, name="b2_dw_bn")(y, train)
        y = nn.Conv(branch_ch, (1, 1), use_bias=False, dtype=self.dtype, name="b2_pw2")(y)
        y = _BN(self.dtype, name="b2_pw2_bn")(y, train)
        y = nn.relu(y)

        out = jnp.concatenate([x1, y], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    """ShuffleNetV2 → pooled (B, 1024) features by default."""

    width: float = 1.0
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return _STAGE_OUT[self.width][1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, pool: bool = True):
        if self.width not in _STAGE_OUT:
            raise ValueError(f"Unsupported ShuffleNetV2 width: {self.width}")
        stage_out, final_ch = _STAGE_OUT[self.width]
        x = nn.Conv(24, (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _BN(self.dtype, name="conv1_bn")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (out_ch, reps) in enumerate(zip(stage_out, _REPEATS)):
            for i in range(reps):
                x = ShuffleUnit(out_ch, strides=2 if i == 0 else 1, dtype=self.dtype,
                                name=f"stage{stage + 2}_{i}")(x, train)
        x = nn.Conv(final_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv5")(x)
        x = _BN(self.dtype, name="conv5_bn")(x, train)
        x = nn.relu(x)
        if pool:
            x = jnp.mean(x, axis=(1, 2))
        return x
