"""Non-saturating benchmark sweep over all 7 pipelines.

Builds a reference-scale synthetic GLips corpus with ``hardness`` > 0
(class overlap + speaker/lighting nuisance + ambiguous cues + label noise —
data/synthetic.py) and trains each pipeline's BASELINE-best model on it.
This is the closest available proxy for reference-scale training dynamics
in a zero-egress image (REALDATA.md): it verifies

- model-family ORDERING is sane (audio strongest unimodal, video weakest,
  fusion >= its components — the BASELINE.md pattern), and
- plateau-LR reductions actually fire mid-run (the logs record lr).

Usage:  python experiments/hard_sweep.py [--clips 200] [--hardness 0.6]
        [--epochs-scale 1.0] [--out experiments/hard_sweep] [--quick]
Writes each run's CSV/TXT logs + a summary.json under --out.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_hardness(spec):
    try:
        return float(spec)
    except ValueError:
        return {k: float(v) for k, v in (kv.split("=") for kv in spec.split(","))}


def build_corpus(root: str, clips: int, hardness, label_noise: float, seed: int,
                 cue_style: str = "slice", with_audio: bool = True,
                 with_lip_regions: bool = True):
    from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips

    if not os.path.exists(os.path.join(root, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(
            root, words=DEFAULT_WORDS, clips_per_split=clips, seed=seed,
            hardness=hardness, label_noise=label_noise, cue_style=cue_style,
            with_audio=with_audio, with_lip_regions=with_lip_regions,
        )
        # recipe sidecar: downstream studies (cues_replicates,
        # conformer_dmodel) stamp their provenance from the corpus THEY
        # read, not from assumed defaults
        with open(os.path.join(root, "corpus_meta.json"), "w") as f:
            json.dump({"seed": seed, "clips": clips, "hardness": hardness,
                       "label_noise": label_noise, "cue_style": cue_style}, f)
        print(f"corpus built in {time.time() - t0:.1f}s: {root}", flush=True)
    return root


def corpus_recipe(root: str) -> "dict | None":
    """The recipe sidecar written at build time, or None (pre-existing or
    foreign corpora — callers must then record the recipe as unknown
    rather than asserting defaults)."""
    try:
        with open(os.path.join(root, "corpus_meta.json")) as f:
            return json.load(f)
    except Exception:
        return None


def provenance(args, hardness) -> dict:
    """Per-row provenance stamp (VERDICT r4 weak #2: rows measured under
    superseded code were indistinguishable from fresh ones — staleness was
    invisible by construction). Captures everything that round 4 proved can
    shift a row: the code (commit), the training RNG stream (rng_impl), and
    the corpus recipe (params + generator hash)."""
    import hashlib
    import subprocess
    from datetime import date

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        status = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.splitlines()
        # Exclusions that never affect training math: PROGRESS.jsonl is
        # appended by the round driver while sweeps run, and the sweep
        # WRITES ITS OWN tracked outputs (metrics/plots/summary under
        # args.out) — a resumed sweep must not stamp its remaining rows
        # '-dirty' because of its own first-half artifacts.
        out_dir = getattr(args, "out", None) or os.path.join(REPO, "experiments", "hard_sweep")
        out_rel = os.path.relpath(os.path.abspath(out_dir), REPO)

        def _ignorable(line: str) -> bool:
            path = line[3:] if len(line) > 3 else line
            return path.endswith("PROGRESS.jsonl") or path.startswith(out_rel + "/")

        dirty = any(not _ignorable(l) for l in status if l.strip())
    except Exception:
        commit, dirty = "unknown", False
    from multimodal_lipread_tpu.train.trainer import TrainerConfig

    gen = os.path.join(REPO, "multimodal_lipread_tpu", "data", "synthetic.py")
    with open(gen, "rb") as f:
        gen_sha = hashlib.sha256(f.read()).hexdigest()[:12]
    return {
        "commit": commit + ("-dirty" if dirty else ""),
        "rng_impl": TrainerConfig(model_name="_", num_classes=1).dropout_rng_impl,
        "corpus": {
            "seed": args.seed, "clips": args.clips, "hardness": hardness,
            "label_noise": args.label_noise, "cue_style": args.cue_style,
            "generator_sha": gen_sha,
        },
        "date": date.today().isoformat(),
    }


def run_pipeline(name: str, cfg_dict: dict, out_dir: str):
    """Run one pipeline main() and return (final_test_acc, history)."""
    import importlib

    from multimodal_lipread_tpu.config import Config

    mod = importlib.import_module(f"multimodal_lipread_tpu.pipelines.{name}")
    t0 = time.time()
    result = mod.main(Config.from_dict(cfg_dict))
    dt = time.time() - t0
    acc = result.get("final_test_acc")
    if acc is None:  # cues logs val-only, like the reference
        acc = max(h["val_acc"] for h in result["history"])
    lrs = [h.get("lr") for h in result["history"]]
    reduced = len({round(l, 10) for l in lrs if l is not None}) > 1
    print(
        f"[{name}:{cfg_dict['model']['name']}] test/val acc {acc:.2f}% "
        f"({dt:.0f}s, lr reduced: {reduced})",
        flush=True,
    )
    return {
        "pipeline": name,
        "model": cfg_dict["model"]["name"],
        "acc": acc,
        "seconds": round(dt, 1),
        "lr_reduced": reduced,
        "epochs": len(result["history"]),
        "history": result["history"],
    }


def zoo_runs(dataset: dict, base_train: dict, E) -> list:
    """Full-registry sweep: every model BASELINE.md publishes a number for,
    plus the conformer extensions. One hyperparameter set per family — the
    reference's own methodology (one shared yaml per subsystem, e.g.
    audio/configs/audio_config.yaml trains all seven audio models).

    Ordered cheapest-family-first so an interrupted sweep still yields
    complete per-family tables; combine with --skip-existing to resume.
    Skipped: `test_model` entries (reference debug stubs), bert/bert_lite
    (random-init tiny in this zero-egress image — accuracy meaningless),
    linear/tfidf (no reference number), av early_fusion_resnet (in the
    registry but no published reference log)."""
    CUES = ["dense_nn", "minilm_lstm", "minilm_lstm_attn", "multi_attn",
            "transformer", "minilm_cnn_lstm", "minilm_cnn_bilstm_attn",
            "lstm_multi_attn"]
    AUDIO = ["resnet", "resnet_lstm", "vgg", "vgg_lstm", "lstm_resnet",
             "lstm_resnet_attn", "lstm_resnet_trans", "conformer"]
    VIDEO = ["cnn", "resnet_lstm", "shufflenet_lstm", "mobilenet_lstm",
             "vgg_lstm", "resnet_attn", "resnet_trans", "conformer"]
    CV = ["early_fusion_mobile", "middle_fusion_mobile", "late_fusion_mobile",
          "early_fusion_resnet", "middle_fusion_resnet", "late_fusion_resnet"]
    AV = ["early_fusion_fast", "late_fusion_fast", "middle_fusion_fast",
          "early_fusion_mobilenet", "late_fusion_mobilenet",
          "middle_fusion_mobilenet"]
    TRIPLE = ["early_fusion_mobile", "early_fusion_resnet",
              "middle_fusion_resnet", "late_fusion_mobile"]
    AC = ["early_fusion_mobile", "middle_fusion_mobile", "late_fusion_mobile"]

    # device_resident is pure throughput: on-device index gather reproduces
    # the host batching path's trajectories exactly (tests/test_trainer.py::
    # test_device_resident_matches_host_batching) while dropping the
    # per-step H2D of video batches — the round-3 video walls (2000+ s per
    # row at <1% step time) were host-loader-bound, not compute-bound.
    DR = {"device_resident": True}
    runs = []
    for n in CUES:
        runs.append(("cues", n, {
            "dataset": dataset, "model": {"name": n},
            "training": {**base_train, **DR, "batch_size": 64,
                         "learning_rate": 1e-3, "epochs": E(15)},
        }))
    for n in AUDIO:
        model = {"name": n, "dtype": "bfloat16"}
        if n.startswith("vgg"):
            model["version"] = 16
        runs.append(("audio", n, {
            "dataset": dataset, "model": model,
            "training": {**base_train, **DR, "learning_rate": 5e-4,
                         "weight_decay": 1e-4, "epochs": E(15)},
        }))
    for n in VIDEO:
        runs.append(("video", n, {
            "dataset": dataset, "model": {"name": n, "dtype": "bfloat16"},
            "training": {**base_train, **DR,
                         "learning_rate": 1e-4 if n == "conformer" else 5e-5,
                         "weight_decay": 1e-5, "epochs": E(12)},
        }))
    for n in CV:
        runs.append(("cues_video", n, {
            "dataset": dataset, "model": {"name": n, "dtype": "bfloat16"},
            "training": {**DR, "batch_size": 128, "learning_rate": 1e-4,
                         "weight_decay": 1e-4, "epochs": E(12), "seed": 0},
        }))
    for n in AV:
        runs.append(("audio_video", n, {
            "dataset": dataset, "model": {"name": n, "dtype": "bfloat16"},
            "training": {**base_train, **DR, "learning_rate": 1e-4,
                         "epochs": E(12)},
        }))
    for n in TRIPLE:
        runs.append(("audio_cues_video", n, {
            "dataset": dataset, "model": {"name": n, "dtype": "bfloat16"},
            "train": {"batch": 128, "lr": 1e-4, "epochs": E(12), "seed": 0},
            "training": DR,  # trainer_extras reads training.* in every pipeline
        }))
    for n in AC:
        runs.append(("audio_cues", n, {
            "dataset": dataset, "model": {"name": n, "dtype": "bfloat16"},
            "train": {"batch": 128, "lr": 1e-3, "epochs": E(12), "seed": 0},
            "training": DR,
        }))
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=200, help="clips per word per split")
    ap.add_argument(
        "--hardness", default="audio=0.55,video=0.8,cues=0.7",
        help="float, or per-modality 'audio=0.55,video=0.8,cues=0.7' "
        "(calibrated to the BASELINE.md accuracy ordering)",
    )
    ap.add_argument("--label-noise", type=float, default=0.05)
    ap.add_argument(
        "--cue-style", default="slice", choices=["slice", "compositional"],
        help="description generator for the cue corpus: 'slice' (round-2/3 "
        "adjective-slice law — every embedding classifier saturates at the "
        "same Bayes cap) or 'compositional' (late pair-coded class signal "
        "after token 32; separates reader capacity like the reference "
        "corpus — see data/synthetic.py)",
    )
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--corpus", default="/tmp/hardsynth/GLips_4")
    ap.add_argument("--out", default=os.path.join(REPO, "experiments", "hard_sweep"))
    ap.add_argument("--only", nargs="*", help="subset of pipeline names")
    ap.add_argument(
        "--zoo", action="store_true",
        help="sweep the FULL model registries (every model the reference "
        "publishes a number for in BASELINE.md, plus the conformer "
        "extensions) instead of only each pipeline's best; combine with "
        "--skip-existing to reuse completed runs",
    )
    ap.add_argument(
        "--skip-existing", action="store_true",
        help="skip runs whose TXT log already has a Final Test footer "
        "(watchdog retries after a wedged remote session)",
    )
    args = ap.parse_args()

    hardness = parse_hardness(args.hardness)
    # --only lets a partial sweep skip synthesizing modalities it won't read
    # (a cues-only re-run on a fresh corpus needs neither wavs nor lip .npys)
    pipes = ({s.split(":")[0] for s in args.only} if args.only else None)
    need_audio = pipes is None or bool(
        pipes & {"audio", "audio_video", "audio_cues", "audio_cues_video"})
    need_video = pipes is None or bool(
        pipes & {"video", "audio_video", "cues_video", "audio_cues_video"})
    root = build_corpus(args.corpus, args.clips, hardness, args.label_noise,
                        args.seed, args.cue_style, need_audio, need_video)
    cache = "/tmp/hardsynth/cue_cache"
    os.makedirs(args.out, exist_ok=True)

    def E(n):  # epochs, scaled
        return max(2, int(round(n * args.epochs_scale)))

    base_train = {"batch_size": 128, "seed": 0}
    dataset = {"root_dir": root, "cue_root": root, "input_size": 117,
               "cue_mode": "emotion", "embed_model": "mpnet",
               "cache_dir": cache, "num_classes": 4}

    # pipeline → (model under test, config). Models: each pipeline's
    # BASELINE-best (BASELINE.md highlights) + the conformer extensions.
    runs = [
        ("audio", "vgg_lstm", {
            "dataset": dataset, "model": {"name": "vgg_lstm", "version": 16, "dtype": "bfloat16"},
            "training": {**base_train, "learning_rate": 5e-4, "weight_decay": 1e-4,
                         "epochs": E(15)},
        }),
        ("audio", "conformer", {
            "dataset": dataset, "model": {"name": "conformer", "dtype": "bfloat16"},
            "training": {**base_train, "learning_rate": 5e-4, "weight_decay": 1e-4,
                         "epochs": E(15)},
        }),
        ("video", "resnet_trans", {
            "dataset": dataset, "model": {"name": "resnet_trans", "dtype": "bfloat16"},
            "training": {**base_train, "learning_rate": 5e-5, "weight_decay": 1e-5,
                         "epochs": E(12)},
        }),
        ("video", "conformer", {
            "dataset": dataset, "model": {"name": "conformer", "dtype": "bfloat16"},
            "training": {**base_train, "learning_rate": 1e-4, "weight_decay": 1e-5,
                         "epochs": E(12)},
        }),
        ("audio_video", "middle_fusion_mobilenet", {
            "dataset": dataset, "model": {"name": "middle_fusion_mobilenet", "dtype": "bfloat16"},
            "training": {**base_train, "learning_rate": 1e-4, "epochs": E(12)},
        }),
        ("cues", "multi_attn", {
            "dataset": dataset, "model": {"name": "multi_attn"},
            "training": {**base_train, "batch_size": 64, "learning_rate": 1e-3,
                         "epochs": E(15)},
        }),
        ("audio_cues", "middle_fusion_mobile", {
            "dataset": dataset, "model": {"name": "middle_fusion_mobile", "dtype": "bfloat16"},
            "train": {"batch": 128, "lr": 1e-3, "epochs": E(12), "seed": 0},
        }),
        ("cues_video", "middle_fusion_resnet", {
            "dataset": dataset, "model": {"name": "middle_fusion_resnet", "dtype": "bfloat16"},
            "training": {"batch_size": 128, "learning_rate": 1e-4,
                         "weight_decay": 1e-4, "epochs": E(12), "seed": 0},
        }),
        ("audio_cues_video", "late_fusion_mobile", {
            "dataset": dataset, "model": {"name": "late_fusion_mobile", "dtype": "bfloat16"},
            "train": {"batch": 128, "lr": 1e-4, "epochs": E(12), "seed": 0},
        }),
    ]
    if args.zoo:
        runs = zoo_runs(dataset, base_train, E)
    if args.only:
        runs = [r for r in runs if r[0] in args.only or f"{r[0]}:{r[1]}" in args.only]

    def _done(out_dir, model):
        import glob

        for p in glob.glob(os.path.join(out_dir, "metrics", "*_training_log.txt")):
            with open(p) as f:
                if "Final Test" in f.read():
                    return True
        return False

    def _row_from_logs(out_dir, pipeline, model):
        """Reconstruct a summary row for a finished run that has a Final
        Test footer but no prior summary row (sweep killed between the
        footer write and the summary flush)."""
        import csv
        import glob
        import re

        for p in glob.glob(os.path.join(out_dir, "metrics", "*_training_log.txt")):
            with open(p) as f:
                m = re.search(r"Final Test Acc: ([\d.]+)%", f.read())
            if not m:
                continue
            epochs = 0
            csv_path = p.replace(".txt", ".csv")
            if os.path.exists(csv_path):
                with open(csv_path) as f:
                    epochs = sum(1 for _ in csv.reader(f)) - 1
            return {"pipeline": pipeline, "model": model,
                    "acc": float(m.group(1)), "seconds": None,
                    "lr_reduced": None, "epochs": epochs,
                    "recovered_from_log": True}
        return None

    # prior results (from either summary file) let --skip-existing reuse
    # completed runs without losing their rows in the new summary
    prior = {}
    for fname in ("summary.json", "summary_zoo.json"):
        try:
            with open(os.path.join(args.out, fname)) as f:
                for r in json.load(f)["results"]:
                    prior[(r["pipeline"], r["model"])] = r
        except (OSError, ValueError, KeyError):
            pass
    summary_name = "summary_zoo.json" if args.zoo else "summary.json"

    def flush_summary(results, checks):
        # merge: this invocation's rows override prior rows for the same
        # (pipeline, model); every other prior row is RETAINED, so a partial
        # re-run (--only cues on a new corpus) can't erase the other families
        merged = dict(prior)
        for r in results:
            merged[(r["pipeline"], r["model"])] = r
        summary = {
            "hardness": hardness, "label_noise": args.label_noise,
            "clips_per_split": args.clips, "seed": args.seed,
            "results": [{k: v for k, v in r.items() if k != "history"}
                        for r in merged.values()],
            "ordering_checks": checks,
        }
        # atomic: a watchdog kill mid-write must not corrupt the prior-row
        # file that --skip-existing resumes from
        path = os.path.join(args.out, summary_name)
        with open(path + ".tmp", "w") as f:
            json.dump(summary, f, indent=2)
        os.replace(path + ".tmp", path)
        return summary

    prov = provenance(args, hardness)
    print("provenance:", json.dumps(prov), flush=True)
    results = []
    for pipeline, model, cfg in runs:
        out_dir = os.path.join(args.out, f"{pipeline}_{model}")
        # complete = a successful row in a prior summary (flushed only after
        # a run finishes), or a Final Test footer in the metrics log. The
        # footer alone misses the cues family, whose reference log format is
        # train/val-only with no test footer — without the prior-row check a
        # relaunched sweep re-trains all 8 cues models every time.
        prior_ok = (pipeline, model) in prior and "error" not in prior[(pipeline, model)]
        if args.skip_existing and (prior_ok or _done(out_dir, model)):
            print(f"[{pipeline}:{model}] already complete, skipping", flush=True)
            if (pipeline, model) in prior:
                results.append(prior[(pipeline, model)])
            else:
                row = _row_from_logs(out_dir, pipeline, model)
                if row is not None:
                    results.append(row)
            continue
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg["output"] = {"base_dir": out_dir, "plots": True}
        try:
            row = run_pipeline(pipeline, cfg, out_dir)
            row["cue_style"] = args.cue_style  # corpus provenance per row
            row["provenance"] = prov
            results.append(row)
        except Exception as e:  # keep sweeping; report at the end
            print(f"[{pipeline}:{model}] FAILED: {e}", flush=True)
            results.append({"pipeline": pipeline, "model": model, "error": str(e)})
        flush_summary(results, {})  # incremental: a killed sweep keeps its rows

    acc = {f"{r['pipeline']}:{r['model']}": r.get("acc") for r in results}
    checks = {}
    if acc.get("audio:vgg_lstm") and acc.get("video:resnet_trans"):
        checks["audio_beats_video"] = acc["audio:vgg_lstm"] > acc["video:resnet_trans"]
    if acc.get("audio_cues_video:late_fusion_mobile") and acc.get("video:resnet_trans"):
        checks["triple_beats_video"] = (
            acc["audio_cues_video:late_fusion_mobile"] > acc["video:resnet_trans"]
        )
    if acc.get("audio_video:middle_fusion_mobilenet") and acc.get("video:resnet_trans"):
        checks["av_beats_video"] = (
            acc["audio_video:middle_fusion_mobilenet"] > acc["video:resnet_trans"]
        )
    summary = flush_summary(results, checks)
    print(json.dumps(summary["results"], indent=2))
    print("ordering checks:", checks, flush=True)


if __name__ == "__main__":
    main()
