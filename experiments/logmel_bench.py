"""Log-mel frontend implementation shootout (docs/PERFORMANCE.md "Log-mel").

Methodology (required on this tunneled backend — see bench.py):
- chain N dependent applications inside ONE jitted function (the output of
  call k feeds call k+1 through a data dependency), so per-dispatch tunnel
  latency (~1.45 ms fixed on this rig) amortizes across the chain;
- fence with a single scalar value fetch (``float()``), because
  ``block_until_ready`` can return before remote execution completes;
- best-of-R trials absorbs tunnel contention.

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/logmel_bench.py
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_lipread_tpu.ops.logmel import NUM_SAMPLES, log_mel


def chained(impl: str, batch: int, chain: int):
    @jax.jit
    def fn(wave):
        def body(i, w):
            m = log_mel(w, impl=impl)
            # fold the output back into the input so every link is a real
            # data dependency XLA cannot elide
            return w + 1e-12 * jnp.mean(m)
        return jnp.mean(log_mel(jax.lax.fori_loop(0, chain - 1, body, wave),
                                impl=impl))
    return fn


def measure(impl: str, batch: int, chain: int = 20, trials: int = 3) -> float:
    wave = jnp.asarray(np.random.RandomState(0)
                       .randn(batch, NUM_SAMPLES).astype(np.float32))
    fn = chained(impl, batch, chain)
    float(fn(wave))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(wave))
        best = min(best, (time.perf_counter() - t0) / chain)
    return best * 1e3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 128])
    ap.add_argument("--chain", type=int, default=20)
    a = ap.parse_args()
    for batch in a.batches:
        for impl in ("xla", "pallas", "fft"):
            if impl == "pallas" and jax.default_backend() != "tpu":
                continue
            ms = measure(impl, batch, a.chain)
            print(json.dumps({"impl": impl, "batch": batch,
                              "ms_per_call": round(ms, 3)}), flush=True)
