"""Audio-family rank-agreement root cause: why do vgg/vgg_lstm rank 5th/6th
here when the reference ranks them #2/#1?

Round 3's zoo sweep measured audio Spearman rho = +0.50 vs the reference
record, driven entirely by the VGG pair (the non-VGG subfamily ordering —
resnet > resnet_lstm > lstm_resnet_attn > lstm_resnet_trans — matches the
reference EXACTLY; rho = +1.0 on that 4-model subset). The competing
hypotheses this driver separates:

H1 (learning-rate sensitivity): VGG16-bn (134M params) is simply mistuned
    at the family lr (5e-4) and would rank top-2 at some other lr.
H2 (init confound): every reference audio model trains FROM ImAGENET-
    PRETRAINED backbones (vgg_model.py:33-39, vgg_lstm_model.py:45-51,
    resnet_model.py:12, lstm_resnet_model.py:21 — all
    `weights=...DEFAULT/IMAGENET1K_V1`), and VGG-from-scratch is the
    classically hardest of these to train (the original VGG paper trained
    it in stages); a structured prior should lift the VGG pair
    disproportionately vs resnet.

Instruments:
  A. LR sweep: vgg + vgg_lstm at lr {1e-4, 1e-3} under the otherwise-
     unchanged family protocol (zoo used 5e-4).
  B. Structured prior: pretrain AudioVGG / AudioResNet on the DISJOINT
     100-class hard-audio corpus (scale100_hard_audio.py's corpus: words
     wort000..wort099, seed 23 — no overlap with the 4 family words), then
     graft the backbone (`arch: checkpoint` pretrained spec,
     pipelines/common.py) into the family-protocol run. The reference's
     ImageNet prior is likewise out-of-task; this is the closest realizable
     analogue in a zero-egress image.

Outputs: experiments/audio_rank_study/summary.jsonl (one row per run) +
per-run metric logs. Render conclusions with --report into
experiments/audio_rank_study/REPORT.md.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/audio_rank_study.py
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "experiments", "audio_rank_study")

FAMILY_CORPUS = "/tmp/hardsynth/GLips_4"
PRIOR_CORPUS = "/tmp/hard100a/GLips_100h"

# round-3 zoo rows (experiments/hard_sweep/ZOO.md "audio") — the baseline
# this study explains; family protocol: lr 5e-4, wd 1e-4, 15 ep, batch 128
ZOO_BASELINE = {"resnet": 83.75, "resnet_lstm": 80.12, "vgg": 79.62,
                "vgg_lstm": 79.62, "lstm_resnet": 81.38,
                "lstm_resnet_attn": 78.88, "lstm_resnet_trans": 76.88,
                "conformer": 84.12}
REFERENCE = {"resnet": 87.50, "resnet_lstm": 85.00, "vgg": 89.00,
             "vgg_lstm": 90.00, "lstm_resnet_attn": 82.50,
             "lstm_resnet_trans": 82.50}


def build_family_corpus():
    """Rebuild round 3's calibrated hard corpus bit-identically (same args
    and seed as hard_sweep.py defaults)."""
    from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips

    if not os.path.exists(os.path.join(FAMILY_CORPUS, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(
            FAMILY_CORPUS, words=DEFAULT_WORDS, clips_per_split=200, seed=11,
            hardness={"audio": 0.55, "video": 0.8, "cues": 0.7},
            label_noise=0.05)
        print(f"family corpus rebuilt in {time.time() - t0:.0f}s", flush=True)


def build_prior_corpus():
    from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips

    words = tuple(f"wort{i:03d}" for i in range(100))
    if not os.path.exists(os.path.join(PRIOR_CORPUS, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(
            PRIOR_CORPUS, words=words, clips_per_split=30, seed=23,
            with_cues=False, with_lip_regions=False,
            hardness={"audio": 0.55}, label_noise=0.05)
        print(f"prior corpus built in {time.time() - t0:.0f}s", flush=True)


def run_audio(tag, model_name, lr, out_dir, pretrained=None, epochs=15):
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    model = {"name": model_name, "dtype": "bfloat16"}
    if model_name.startswith("vgg"):
        model["version"] = 16
    if pretrained:
        model["pretrained"] = pretrained
    cfg = Config.from_dict({
        "dataset": {"root_dir": FAMILY_CORPUS, "num_classes": 4,
                    "input_size": 117},
        "model": model,
        "training": {"batch_size": 128, "learning_rate": lr,
                     "weight_decay": 1e-4, "epochs": epochs, "seed": 0},
        "output": {"base_dir": out_dir, "plots": False},
    })
    t0 = time.time()
    r = audio_main(cfg)
    row = {"tag": tag, "model": model_name, "lr": lr,
           "pretrained": bool(pretrained),
           "final_test_acc": round(r["final_test_acc"], 2),
           "best_val_acc": round(max(h["val_acc"] for h in r["history"]), 2),
           "epochs": len(r["history"]), "seconds": round(time.time() - t0, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def pretrain_prior(model_name, epochs=12):
    """Train the backbone-owning audio model on the 100-class prior corpus;
    returns the best-val checkpoint path."""
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    out_dir = os.path.join("/tmp/prior_runs", model_name)
    ckpt = os.path.join(out_dir, "models_trained", f"{model_name}_best.msgpack")
    if os.path.exists(ckpt):
        print(f"prior {model_name}: reusing {ckpt}", flush=True)
        return ckpt
    model = {"name": model_name, "dtype": "bfloat16"}
    if model_name.startswith("vgg"):
        model["version"] = 16
    cfg = Config.from_dict({
        "dataset": {"root_dir": PRIOR_CORPUS, "num_classes": 100,
                    "input_size": 117},
        "model": model,
        "training": {"batch_size": 128, "learning_rate": 5e-4,
                     "weight_decay": 1e-4, "epochs": epochs, "seed": 0},
        "output": {"base_dir": out_dir, "plots": False},
    })
    t0 = time.time()
    r = audio_main(cfg)
    row = {"tag": f"prior_{model_name}", "model": model_name,
           "task": "hard100_audio",
           "final_test_acc": round(r["final_test_acc"], 2),
           "seconds": round(time.time() - t0, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return ckpt


def done(tag):
    path = os.path.join(OUT, "summary.jsonl")
    if not os.path.exists(path):
        return False
    return any(json.loads(l).get("tag") == tag for l in open(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-existing", action="store_true")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    build_family_corpus()
    build_prior_corpus()

    # A. LR sensitivity for the VGG pair (5e-4 = the family protocol point,
    # re-run to confirm the round-3 zoo rows reproduce on the rebuilt corpus)
    for model_name in ("vgg_lstm", "vgg"):
        for lr in (1e-4, 5e-4, 1e-3):
            tag = f"{model_name}_lr{lr:g}"
            if args.skip_existing and done(tag):
                print(f"{tag}: done, skipping", flush=True)
                continue
            run_audio(tag, model_name, lr,
                      os.path.join("/tmp/rank_runs", tag))

    # B. structured prior (backbone graft from a 100-class run)
    subs = {"vgg_lstm": "vgg", "vgg": "vgg", "resnet": "resnet",
            "resnet_lstm": "resnet"}
    prior_src = {"vgg_lstm": "vgg", "vgg": "vgg", "resnet": "resnet",
                 "resnet_lstm": "resnet"}
    for model_name in ("vgg_lstm", "vgg", "resnet", "resnet_lstm"):
        tag = f"{model_name}_prior"
        if args.skip_existing and done(tag):
            print(f"{tag}: done, skipping", flush=True)
            continue
        ckpt = pretrain_prior(prior_src[model_name])
        spec = {"arch": "checkpoint", "path": ckpt,
                "source_submodule": [subs[model_name]],
                "submodule": [subs[model_name]]}
        run_audio(tag, model_name, 5e-4,
                  os.path.join("/tmp/rank_runs", tag), pretrained=spec)
    print("study complete", flush=True)


if __name__ == "__main__":
    main()
