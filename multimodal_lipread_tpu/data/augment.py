"""Batch augmentation: mixup.

The reference defines a MixupTransform and an ``augmentation:`` YAML block
but never wires either into training (dead code/config,
video/data_utils/dataset_loader.py:104-125, video/config/visual_config.yaml:33-46).
Here mixup is implemented the JAX way — a pure function over a batch, usable
inside the jitted train step — and stays OFF by default to match the
reference's effective behavior. Enable with ``training.mixup_alpha > 0``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup(
    rng: jax.Array,
    inputs: Tuple[jnp.ndarray, ...],
    labels_onehot: jnp.ndarray,
    alpha: float,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Beta(alpha, alpha) convex combination of a batch with a shuffled copy.

    ``labels_onehot``: (B, C) soft labels in, soft labels out. All inputs are
    mixed along the leading batch axis with the same permutation/lambda.
    """
    k1, k2 = jax.random.split(rng)
    B = labels_onehot.shape[0]
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, B)

    def mix(x):
        lam_b = lam.astype(x.dtype)
        return x * lam_b + x[perm] * (1.0 - lam_b)

    mixed_inputs = tuple(mix(x) for x in inputs)
    mixed_labels = labels_onehot * lam + labels_onehot[perm] * (1.0 - lam)
    return mixed_inputs, mixed_labels
