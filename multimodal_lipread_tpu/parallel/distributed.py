"""Multi-host initialization helper.

The reference is single-process (SURVEY.md §2.10). For multi-host TPU slices
this framework uses the standard JAX recipe: call
``maybe_initialize_distributed()`` once at process start; on TPU pods the
coordinator/process settings come from the environment automatically, and the
same jitted DP program then spans all hosts (ICI within a slice, DCN across
slices). Per-host input sharding comes from the Grain loaders
(data/grain_loader.py shard_index/shard_count).

No-ops on single-process runs, so every entry point can call it
unconditionally.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-process env is detected.

    Returns True when distributed mode is active. IMPORTANT: this inspects
    ONLY environment variables before calling ``jax.distributed.initialize``
    — querying jax (even ``jax.process_count()``) would initialize the local
    backend first and make ``initialize()`` raise. Call this before any JAX
    computation.
    """
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    # Pod auto-detect must require MULTIPLE workers: single-chip tunneled
    # environments (axon) also export TPU_WORKER_HOSTNAMES, and calling
    # jax.distributed.initialize() there dies on a missing coordinator.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod_env = bool(
        ("," in hostnames) or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not ((coordinator and num_processes > 1) or pod_env):
        return False

    import jax

    try:
        if coordinator and num_processes > 1:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        else:  # TPU pod metadata present: let jax auto-detect everything
            jax.distributed.initialize()
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():  # initialize() called twice
            return True
        raise
    except ValueError as e:
        # mis-detected pod metadata (no derivable coordinator) must degrade
        # to single-process training, never kill the run
        print(f"jax.distributed auto-init skipped: {e}")
        return False
