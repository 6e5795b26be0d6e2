"""Conformer width tradeoff: d_model 128 vs 144, accuracy measured (VERDICT r4 #7).

docs/PERFORMANCE.md's d_model sweep measured d=128 at +18% clips/s over the
d=144 default but called the accuracy cost "a (small, unmeasured) risk".
This measures it: the zoo protocol's audio conformer run (hard compositional
corpus, batch 128, lr 5e-4, wd 1e-4, 15 epochs, device_resident — identical
to experiments/hard_sweep.py::zoo_runs) at both widths, 3 seeds each, so the
shipping default can be picked with data.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/conformer_dmodel.py
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "experiments", "conformer_dmodel")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/hardsynth/GLips_4")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.corpus, "lipread_files")):
        raise SystemExit(
            f"{args.corpus}: hard corpus not found — build it with "
            "experiments/hard_sweep.py first (this study shares its corpus)"
        )

    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hard_sweep import corpus_recipe, provenance

    # stamp the corpus ACTUALLY read — see cues_replicates.py
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
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "summary.jsonl")
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            done = {(r["d_model"], r["seed"]) for r in map(json.loads, f) if "d_model" in r}

    for d_model in (144, 128):
        for seed in args.seeds:
            if (d_model, seed) in done:
                print(f"[d={d_model} seed={seed}] done, skipping", flush=True)
                continue
            cfg = Config.from_dict({
                "dataset": {"root_dir": args.corpus, "num_classes": 4,
                            "input_size": 117},
                "model": {"name": "conformer", "dtype": "bfloat16",
                          "d_model": d_model},
                "training": {"batch_size": 128, "learning_rate": 5e-4,
                             "weight_decay": 1e-4, "epochs": args.epochs,
                             "seed": seed, "device_resident": True},
                "output": {"base_dir": os.path.join(OUT, f"d{d_model}_s{seed}"),
                           "plots": False},
            })
            t0 = time.time()
            r = audio_main(cfg)
            row = {"d_model": d_model, "seed": seed,
                   "final_test_acc": r["final_test_acc"],
                   "best_val_acc": r["best_val_acc"],
                   "seconds": round(time.time() - t0, 1), "provenance": prov}
            with open(path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[d={d_model} seed={seed}] test {row['final_test_acc']:.2f}% "
                  f"({row['seconds']}s)", flush=True)

    rows = [r for r in map(json.loads, open(path)) if "d_model" in r]
    agg = {}
    for d in (144, 128):
        accs = sorted(r["final_test_acc"] for r in rows if r["d_model"] == d)
        if accs:
            agg[str(d)] = {"n": len(accs), "accs": accs,
                           "mean": round(sum(accs) / len(accs), 2),
                           "spread": round(accs[-1] - accs[0], 2)}
    print(json.dumps({"aggregate": agg}, indent=2))
    with open(os.path.join(OUT, "aggregate.json"), "w") as f:
        json.dump({"aggregate": agg, "provenance": prov}, f, indent=2)


if __name__ == "__main__":
    main()
