"""Seed replicates for the pooled-cues inversion (VERDICT r4 weak #5).

The zoo's cues family on the compositional corpus ranks dense_nn above
multi_attn within the pooled-embedding group, where the reference orders
multi_attn (65.0) > minilm_lstm (56.9) > dense_nn (51.25)
(reference: plotting/cues_compare.py:11-12, cues/emotion_metrics/*.csv).
Round 4 asserted "within-group tie-noise" without variance bars; this
study runs 5 training-seed replicates of each pooled model on the SAME
compositional corpus + hyperparameters as the zoo sweep
(experiments/hard_sweep.py::zoo_runs cues spec: batch 64, lr 1e-3,
15 epochs, device_resident) and reports the replicate spread.

If the inversion is stable across seeds it is a real property of this
corpus/embedder (the hashing fallback embedder vs the reference's mpnet is
the obvious confound — reference: cues/models/minilm_models/dense.py:29 vs
multi_attn.py:68-95); if the spreads overlap, "tie-noise" is confirmed
with data.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/cues_replicates.py
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODELS = ("dense_nn", "multi_attn", "minilm_lstm")
SEEDS = (0, 1, 2, 3, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/hardsynth/GLips_4")
    ap.add_argument("--cache", default="/tmp/hardsynth/cue_cache")
    ap.add_argument("--out", default=os.path.join(REPO, "experiments", "cues_replicates"))
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.corpus, "Descriptions_Emotion")):
        raise SystemExit(
            f"{args.corpus}: compositional cue corpus not found — build it "
            "with experiments/hard_sweep.py --cue-style compositional first "
            "(this study must share the zoo sweep's corpus)"
        )

    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.cues import main as cues_main

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hard_sweep import corpus_recipe, provenance  # same stamp as the zoo rows

    os.makedirs(args.out, exist_ok=True)
    # stamp the corpus ACTUALLY read (recipe sidecar written at build time);
    # a foreign corpus without a sidecar is recorded as unknown, not assumed
    recipe = corpus_recipe(args.corpus) or {
        "seed": "unknown", "clips": "unknown", "label_noise": "unknown",
        "cue_style": "unknown", "hardness": "unknown",
    }
    prov = provenance(
        argparse.Namespace(seed=recipe["seed"], clips=recipe["clips"],
                           label_noise=recipe["label_noise"],
                           cue_style=recipe["cue_style"]),
        recipe["hardness"],
    )
    path = os.path.join(args.out, "summary.jsonl")
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if "model" in r:
                    done.add((r["model"], r["seed"]))

    for model in MODELS:
        for seed in SEEDS:
            if (model, seed) in done:
                print(f"[{model} seed={seed}] already done, skipping", flush=True)
                continue
            cfg = Config.from_dict({
                "dataset": {"root_dir": args.corpus, "cue_root": args.corpus,
                            "cue_mode": "emotion", "embed_model": "mpnet",
                            "cache_dir": args.cache, "num_classes": 4},
                "model": {"name": model},
                "training": {"batch_size": 64, "learning_rate": 1e-3,
                             "epochs": args.epochs, "seed": seed,
                             "device_resident": True},
                "output": {"base_dir": os.path.join(args.out, f"{model}_s{seed}"),
                           "plots": False},
            })
            t0 = time.time()
            result = cues_main(cfg)
            acc = max(h["val_acc"] for h in result["history"])  # cues logs val-only
            row = {"model": model, "seed": seed, "best_val_acc": acc,
                   "seconds": round(time.time() - t0, 1), "provenance": prov}
            with open(path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[{model} seed={seed}] best val {acc:.2f}% "
                  f"({row['seconds']}s)", flush=True)

    # aggregate
    rows = [r for r in map(json.loads, open(path)) if "model" in r]
    agg = {}
    for m in MODELS:
        accs = sorted(r["best_val_acc"] for r in rows if r["model"] == m)
        if accs:
            agg[m] = {"n": len(accs), "accs": accs,
                      "mean": round(sum(accs) / len(accs), 2),
                      "spread": round(accs[-1] - accs[0], 2)}
    print(json.dumps({"aggregate": agg}, indent=2))
    with open(os.path.join(args.out, "aggregate.json"), "w") as f:
        json.dump({"aggregate": agg, "provenance": prov}, f, indent=2)


if __name__ == "__main__":
    main()
