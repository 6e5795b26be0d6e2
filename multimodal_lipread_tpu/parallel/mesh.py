"""Device mesh + sharding helpers for data- and tensor-parallel training.

The reference is single-device (SURVEY.md §2.10: ``device = 'cuda' if
available else 'cpu'``, no torch.distributed anywhere). This framework adds
the capability the TPU way: a 1-D ``jax.sharding.Mesh`` over all local
devices with the batch axis sharded (`P('data')`) and parameters replicated
(`P()`). Gradient all-reduce then materializes as XLA ``psum`` collectives
over ICI — no NCCL-style calls in user code.

Tensor parallelism (opt-in, for the widest models — the BERT fine-tune is
the only reference family near the size where TP pays) uses a 2-D
``Mesh(('data', 'model'))`` plus per-parameter ``PartitionSpec`` rules
(``place_state``): Megatron-style column/row-parallel Dense layers fall out
of GSPMD propagation from the parameter shardings alone — the activation
all-reduce after each row-parallel matmul is inserted by XLA, never written
by hand.

The same code path runs on a single TPU chip (mesh of 1), a v5e-8 slice, or
a virtual 8-device CPU mesh for tests
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# rule list: (path regex, partition spec as a tuple of axis names / None),
# matched with re.search against the '/'-joined state path of each leaf.
# First match wins; no match → fully replicated. A trailing "..." entry
# replicates all remaining dims, letting ONE rule cover leaves of varying
# rank — e.g. ("stage", "...") shards every stacked-encoder leaf's leading
# layer axis for pipeline parallelism (parallel/pipeline.py). Without the
# marker, rank must match exactly (typos fail loudly).
PartitionRules = Sequence[Tuple[str, Tuple[Optional[str], ...]]]


def get_mesh(devices: Optional[Sequence[Any]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_2d(
    model_parallel: int, devices: Optional[Sequence[Any]] = None
) -> Mesh:
    """2-D ``(data, model)`` mesh: batch over 'data', weights over 'model'.

    The model axis is innermost so tensor-parallel collectives ride the
    fastest links (adjacent devices / ICI neighbours on a real slice).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the {n} devices"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def resolve_partition_spec(rules: PartitionRules, path: str) -> P:
    """First-match-wins PartitionSpec for a '/'-joined parameter path."""
    for pattern, spec in rules:
        if re.search(pattern, path):
            return P(*spec)
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k)))))
    return "/".join(parts)


def place_state(mesh: Mesh, state: Any, rules: PartitionRules) -> Any:
    """Device-put a train-state pytree with per-leaf rule-resolved shardings.

    Optimizer moments mirror the parameter tree (optax states nest the same
    dict structure under e.g. ``mu``/``nu``), so a rule written against a
    parameter path suffix (``attention/query/kernel$``) shards the Adam
    moments identically — exactly what keeps per-device optimizer memory
    proportional to the parameter shard.

    Leaves whose rank or axis sizes don't fit the matched spec raise — a
    silent replicate-on-mismatch would hide a typo in the rules.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(key_path, leaf):
        arr = jax.numpy.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        path = _path_str(key_path)
        spec = resolve_partition_spec(rules, path)
        names = tuple(spec)
        if names and names[-1] == "...":
            head = names[:-1]
            if len(head) > arr.ndim:
                raise ValueError(
                    f"partition rule for '{path}' names {len(head)} leading dims "
                    f"but the leaf has shape {arr.shape}"
                )
            names = head + (None,) * (arr.ndim - len(head))
            spec = P(*names)
        if names:
            if len(names) != arr.ndim:
                raise ValueError(
                    f"partition rule for '{path}' has rank {len(names)} but the "
                    f"leaf has shape {arr.shape}"
                )
            for dim, name in enumerate(names):
                if name is None:
                    continue
                size = axis_sizes.get(name)
                if size is None:
                    raise ValueError(
                        f"partition rule for '{path}' names axis '{name}' not in "
                        f"mesh axes {mesh.axis_names}"
                    )
                if arr.shape[dim] % size:
                    raise ValueError(
                        f"'{path}' dim {dim} (size {arr.shape[dim]}) not divisible "
                        f"by mesh axis '{name}' (size {size})"
                    )
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


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
