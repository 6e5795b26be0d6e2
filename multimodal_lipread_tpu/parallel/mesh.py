"""Device mesh + sharding helpers for data-parallel training.

The reference is single-device (SURVEY.md §2.10: ``device = 'cuda' if
available else 'cpu'``, no torch.distributed anywhere). This framework adds
the capability the TPU way: a 1-D ``jax.sharding.Mesh`` over all local
devices with the batch axis sharded (`P('data')`) and parameters replicated
(`P()`). Gradient all-reduce then materializes as XLA ``psum`` collectives
over ICI — no NCCL-style calls in user code.

The same code path runs on a single TPU chip (mesh of 1), a v5e-8 slice, or
a virtual 8-device CPU mesh for tests
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[Any]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad the leading axis up to the next multiple (for even sharding)."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a batch pytree with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)
