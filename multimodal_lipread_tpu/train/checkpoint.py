"""Training-state checkpointing with the reference's best-val policy.

The reference torch.saves ``{epoch, model_state_dict, optimizer_state_dict,
val_acc}`` on each new best validation accuracy (reference:
audio/train.py:172-179, cues_video/train.py:212-221) and, in the video and
triple-fusion trainers, also a rolling per-epoch checkpoint + model_best
(reference: video/train.py:248-262, audio_cues_video/train.py:179-187), then
reloads the best for the final test (reference: audio/train.py:187-191).

Format here: one msgpack file (flax.serialization) holding the full pytree —
host-portable, mesh-independent (arrays are fully gathered on save and
re-sharded on load by the trainer), and safe to load with a structure
template. File names mirror the reference: ``<name>_checkpoint.msgpack``
(rolling) and ``<name>_best.msgpack``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    """Serialize a checkpoint pytree to ``path`` (atomic rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    # pid-unique staging name: on a SHARED filesystem two hosts of a
    # multi-process run save the same (replicated, identical) checkpoint
    # concurrently — a common tmp name would interleave their writes
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a checkpoint into the structure of ``template``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(_to_host(template), data)


_async_ckptr = None


def _get_async_checkpointer():
    """Process-wide Orbax checkpointer reused across saves (its save() is
    async: arrays are staged synchronously, files written in background)."""
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.StandardCheckpointer()
    return _async_ckptr


def wait_for_async_saves() -> None:
    """Block until every in-flight async Orbax save has committed to disk.

    Call before restoring a checkpoint that may still be writing, and before
    process exit (an abandoned background write leaves a corrupt directory).
    """
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint_orbax(directory: str, tree: Dict[str, Any], async_save: bool = False) -> None:
    """Orbax backend: save the checkpoint pytree to a directory.

    Orbax shards large arrays across files — the right backend once
    checkpoints outgrow a single msgpack blob (multi-host, very large
    models). With ``async_save=True`` the call returns once the arrays are
    staged to host and the file write proceeds in background, overlapping
    the next training epoch; pair with :func:`wait_for_async_saves` before
    restore/exit. Same best-val policy either way.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    # a previous async save to this path may still be in flight — wait
    # BEFORE the existence check (it commits the directory via rename)
    wait_for_async_saves()
    import jax

    if os.path.exists(path) and jax.process_index() == 0:
        # multi-host orbax saves are COLLECTIVE to one shared directory
        # (unlike msgpack's host-local files): only the primary clears the
        # old checkpoint, and everyone barriers before the new save starts
        import shutil

        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"mlt_orbax_clear:{path}")
    if async_save:
        _get_async_checkpointer().save(path, _to_host(tree))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, _to_host(tree))


def load_checkpoint_orbax(directory: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Orbax backend: restore a checkpoint pytree saved by save_checkpoint_orbax."""
    import orbax.checkpoint as ocp

    wait_for_async_saves()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(directory), _to_host(template))
