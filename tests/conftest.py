"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding behavior is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4). Env vars must be
set before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers a TPU backend and overrides
# JAX_PLATFORMS; re-pin to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e tests' train-step compiles (minutes
# each on CPU) are identical across runs — repeat suite runs skip them.
jax.config.update("jax_compilation_cache_dir", "/tmp/mlt_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest

from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips


@pytest.fixture(scope="session")
def glips_root(tmp_path_factory):
    """Session-wide synthetic mini-GLips tree (audio + lip regions + cues)."""
    root = tmp_path_factory.mktemp("glips") / "GLips_4"
    make_synthetic_glips(str(root), words=DEFAULT_WORDS, clips_per_split=4, seed=0)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
