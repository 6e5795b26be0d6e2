"""Close the cached-frozen-feature gap (VERDICT r4 weak #3).

BENCH_r04: triple early_fusion_mobile cached = 26,725 clips/s at 2.6% MFU,
only 1.44x over uncached — while the builder's own attribution showed the
frozen trunk was ~76-87% of the uncached step (compute ceiling ~4-7x).
This driver does two things:

1. **Attribution** of the cached step: where do the ms go? The bench
   harness device_puts inputs ONCE (bench.py:143), so per-step H2D is NOT
   in the loop — the suspects are the dispatch floor of a tiny program on
   a TUNNELED chip and the Adam update over the full (mostly frozen) param
   tree. Measured: empty-step dispatch floor, cached step at 1x and 4x
   batch (compute-bound programs scale, dispatch-bound ones don't), and
   the would-be per-step H2D cost of the cached features (the production
   Trainer path without device_resident).

2. **Composition**: a REAL acv early_fusion_mobile fit (synthetic corpus,
   Trainer path) in three configs — uncached (frozen_bn_eval), cached, and
   cached + device_resident (both knobs existed since round 3/4 but were
   never composed). Steady-epoch clips/s per config; target >=3x uncached
   or a roofline verdict that the wall is irreducible.

Reference path being beaten: the frozen forward the reference pays every
step (/root/reference/audio_cues_video/models/early_fusion_mobile.py:136-152).

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/frozen_cache_bench.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "experiments", "frozen_cache_bench")


def attribution():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import _bench_train_step, _fusion_inputs, VIDEO_BATCH
    from multimodal_lipread_tpu.models.audio_cues_video import get_triple_model

    n_chips = len(jax.devices())
    rows = []

    # dispatch floor: the cheapest possible donated-state step, same loop
    x = jax.device_put(jnp.zeros((8, 8), jnp.float32))

    @jax.jit
    def tiny(s):
        return s + 1.0

    for _ in range(5):
        x = tiny(x)
    x.block_until_ready()
    t0 = time.perf_counter()
    N = 200
    for _ in range(N):
        x = tiny(x)
    x.block_until_ready()
    floor_ms = (time.perf_counter() - t0) / N * 1e3
    rows.append({"metric": "dispatch floor (tiny jitted step)", "ms": round(floor_ms, 3)})

    model = get_triple_model("early_fusion_mobile", 4, dtype=jnp.bfloat16,
                             frozen_bn_eval=True)
    for mult in (1, 4):
        batch = VIDEO_BATCH * n_chips * mult
        inputs, labels = _fusion_inputs(batch)
        rng = np.random.default_rng(0)
        cached_inputs = (
            rng.standard_normal((batch, 512)).astype(np.float32),
            inputs[1],
            rng.standard_normal((batch, 29, 1280)).astype(np.float32),
        )
        clips, flops, dt = _bench_train_step(
            model, cached_inputs, labels, 30,
            init_inputs=inputs, apply_kwargs={"cached_features": True},
        )
        step_ms = dt / 30 * 1e3
        rows.append({
            "metric": f"cached step, batch {batch}", "ms": round(step_ms, 3),
            "clips_per_sec_chip": round(clips, 1),
            "dispatch_floor_frac": round(floor_ms / step_ms, 3),
        })

    # the per-step H2D the PRODUCTION path pays without device_resident:
    # time device_put of one cached-feature batch
    batch = VIDEO_BATCH * n_chips
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((batch, 29, 1280)).astype(np.float32)
    from multimodal_lipread_tpu.parallel.mesh import batch_sharding, get_mesh

    bsh = batch_sharding(get_mesh())
    jax.device_put(feats, bsh).block_until_ready()  # warm
    t0 = time.perf_counter()
    for _ in range(20):
        jax.device_put(feats, bsh).block_until_ready()
    h2d_ms = (time.perf_counter() - t0) / 20 * 1e3
    rows.append({
        "metric": f"H2D of cached video feats (batch {batch}, "
                  f"{feats.nbytes / 1e6:.1f} MB)",
        "ms": round(h2d_ms, 3),
        "gb_per_s": round(feats.nbytes / (h2d_ms / 1e3) / 1e9, 2),
    })
    return rows


def real_fit(epochs=4):
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips
    from multimodal_lipread_tpu.pipelines.audio_cues_video import main as acv_main

    root = "/tmp/fcbench/GLips_4"
    if not os.path.isdir(os.path.join(root, "lipread_files")):
        make_synthetic_glips(root, clips_per_split=200, seed=11,
                             hardness={"audio": 0.55, "video": 0.8, "cues": 0.7})
    rows = []
    for tag, training in (
        ("uncached", {"frozen_bn_eval": True}),
        ("cached", {"cache_frozen_features": True}),
        ("cached+device_resident", {"cache_frozen_features": True,
                                    "device_resident": True}),
        # + multi-step dispatch: if the attribution shows the cached tail is
        # dispatch-bound, scanning K steps per dispatch is the fix
        ("cached+dr+spd16", {"cache_frozen_features": True,
                             "device_resident": True,
                             "steps_per_dispatch": 16}),
    ):
        cfg = Config.from_dict({
            "dataset": {"root_dir": root, "cue_root": root, "cue_mode": "emotion",
                        "embed_model": "mpnet", "cache_dir": "/tmp/fcbench/cache",
                        "num_classes": 4},
            "model": {"name": "early_fusion_mobile", "dtype": "bfloat16"},
            "train": {"batch": 128, "lr": 1e-4, "epochs": epochs, "seed": 0},
            "training": training,
            "output": {"base_dir": f"/tmp/fcbench/out_{tag}", "plots": False},
        })
        t0 = time.time()
        r = acv_main(cfg)
        secs = [round(h["seconds"], 2) for h in r["history"]]
        rows.append({
            "config": tag, "epoch_seconds": secs, "steady_epoch_s": secs[-1],
            "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
            "total_s": round(time.time() - t0, 1),
            "final_val_acc": r["history"][-1]["val_acc"],
        })
        print(json.dumps(rows[-1]), flush=True)
    base = rows[0]["steady_epoch_s"]
    for row in rows[1:]:
        row["epoch_speedup_vs_uncached"] = round(base / row["steady_epoch_s"], 2)
    return rows


def main():
    os.makedirs(OUT, exist_ok=True)
    out = {"attribution": attribution()}
    for r in out["attribution"]:
        print(json.dumps(r), flush=True)
    out["real_fit"] = real_fit()
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("written", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
