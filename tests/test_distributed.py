"""Two-process jax.distributed smoke test (localhost coordinator, CPU).

Proves parallel/distributed.py actually initializes a multi-process JAX
runtime and that cross-process collectives work — not just env parsing.
Skipped automatically when no localhost port can be bound.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, %(repo)r)
from multimodal_lipread_tpu.parallel.distributed import maybe_initialize_distributed

ok = maybe_initialize_distributed()
assert ok, "maybe_initialize_distributed returned False under a 2-process env"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2  # one CPU device per process, global view

import jax.numpy as jnp
from jax.experimental import multihost_utils

x = jnp.ones(()) * (jax.process_index() + 1)
gathered = multihost_utils.process_allgather(x)
assert float(gathered.sum()) == 3.0, gathered
print("DIST_OK", jax.process_index())
"""


def _free_port() -> int:
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("no localhost port available")
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_init():
    port = _free_port()
    base_env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            base_env,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER % {"repo": REPO}],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke test timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "DIST_OK" in out


def test_maybe_initialize_noops_on_single_worker_tunnel(monkeypatch):
    """Single-chip tunneled environments export TPU_WORKER_HOSTNAMES with ONE
    host; auto-init must not fire there (it would die on a missing
    coordinator and kill every CLI launch)."""
    from multimodal_lipread_tpu.parallel.distributed import maybe_initialize_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert maybe_initialize_distributed() is False
