"""cues_video rank-agreement root cause: why does middle_fusion_mobile land
at 27.75% (family rank 6) when the reference ranks it #2 at 53%?

Round 3's zoo sweep measured cues_video Spearman rho = +0.26. The three
MOBILE variants freeze their MobileNetV2 per-frame backbone to match the
reference (cues_video/models/middle_fusion_mobile.py:70 — frozen
`pretrained=True` ImageNet features, only BiLSTM + fusion train). In this
zero-egress image no ImageNet weights exist, so the frozen backbone is a
RANDOM projection: the reference's design assumption (frozen features are
*informative*) is silently violated, and the variant that depends most on
the video stream (middle fusion concatenates the BiLSTM-over-features last
step into its fusion MLP) degrades the most, inverting the family order.

Instruments (family protocol otherwise unchanged: batch 128, lr 1e-4,
wd 1e-4, 12 epochs, seed 0, bf16, round-3 slice corpus):

  A. Causal control: middle_fusion_mobile with model.freeze_backbone=false
     — if the deficit is frozen-randomness (not capacity/fusion design),
     letting the MobileNet train should recover most of the gap.
  B. Structured prior (the realizable analogue of ImageNet): pretrain
     video mobilenet_lstm on the DISJOINT 100-class hard-video corpus
     (scale100_hard_video.py's corpus, words wort000..099, seed 29), then
     graft its 'mobilenet' subtree into each mobile variant's frozen
     ('video_encoder','cnn') slot via the arch:checkpoint pretrained spec
     and re-run all three — reference semantics restored (frozen,
     *informative* features).

Outputs: experiments/cues_video_rank_study/summary.jsonl; conclusions are
folded into experiments/hard_sweep/ZOO.md's cues_video note.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/cues_video_rank_study.py --skip-existing
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "experiments", "cues_video_rank_study")

FAMILY_CORPUS = "/tmp/hardsynth/GLips_4"
PRIOR_CORPUS = "/tmp/hard100v/GLips_100vh"

REFERENCE = {"early_fusion_mobile": 39.00, "middle_fusion_mobile": 53.00,
             "late_fusion_mobile": 48.00, "early_fusion_resnet": 49.00,
             "middle_fusion_resnet": 55.00, "late_fusion_resnet": 42.00}
ZOO_BASELINE = {"early_fusion_mobile": 30.12, "middle_fusion_mobile": 27.75,
                "late_fusion_mobile": 43.75, "early_fusion_resnet": 52.12,
                "middle_fusion_resnet": 51.75, "late_fusion_resnet": 50.00}


def build_corpora():
    from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips

    if not os.path.exists(os.path.join(FAMILY_CORPUS, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(
            FAMILY_CORPUS, words=DEFAULT_WORDS, clips_per_split=200, seed=11,
            hardness={"audio": 0.55, "video": 0.8, "cues": 0.7},
            label_noise=0.05)
        print(f"family corpus rebuilt in {time.time() - t0:.0f}s", flush=True)
    if not os.path.exists(PRIOR_CORPUS + "_lip_regions"):
        words = tuple(f"wort{i:03d}" for i in range(100))
        t0 = time.time()
        make_synthetic_glips(
            PRIOR_CORPUS, words=words, clips_per_split=30, seed=29,
            with_cues=False, with_audio=False,
            hardness={"video": 0.5}, label_noise=0.05)
        print(f"prior corpus built in {time.time() - t0:.0f}s", flush=True)


def pretrain_mobilenet(epochs=12):
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.video import main as video_main

    out_dir = "/tmp/prior_runs/video_mobilenet_lstm"
    ckpt = os.path.join(out_dir, "models_trained", "mobilenet_lstm_best.msgpack")
    if os.path.exists(ckpt):
        print(f"prior: reusing {ckpt}", flush=True)
        return ckpt
    cfg = Config.from_dict({
        "dataset": {"root_dir": PRIOR_CORPUS, "num_classes": 100},
        "model": {"name": "mobilenet_lstm", "dtype": "bfloat16"},
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-5, "epochs": epochs, "seed": 0},
        "output": {"base_dir": out_dir, "plots": False},
    })
    t0 = time.time()
    r = video_main(cfg)
    row = {"tag": "prior_mobilenet_lstm", "task": "hard100_video",
           "final_test_acc": round(r["final_test_acc"], 2),
           "seconds": round(time.time() - t0, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return ckpt


def pretrain_frame_donor(epochs=6):
    """Stronger donor than the LSTM-wrapped video run: MobileNetV2 trained
    DIRECTLY as a per-frame classifier (the synthetic video law is
    per-frame: brightness level + stripe period), so the conv trunk gets a
    clean dense gradient instead of one diluted through 29 timesteps of a
    from-scratch BiLSTM. Same donor corpus, same graftable `cnn` subtree."""
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from multimodal_lipread_tpu.data.glips import scan_lip_regions
    from multimodal_lipread_tpu.models.backbones import MobileNetV2
    from multimodal_lipread_tpu.train.trainer import (
        ArrayDataset, Trainer, TrainerConfig)

    out_dir = "/tmp/prior_runs/frame_donor"
    ckpt = os.path.join(out_dir, "ckpt", "frame_donor_best.msgpack")
    if os.path.exists(ckpt):
        print(f"strong donor: reusing {ckpt}", flush=True)
        return ckpt

    class _FrameClassifier(nn.Module):
        num_classes: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            feats = MobileNetV2(dtype=jnp.bfloat16, name="cnn")(x, train)
            return nn.Dense(self.num_classes, dtype=jnp.float32,
                            name="head")(feats)

    index = scan_lip_regions(PRIOR_CORPUS + "_lip_regions")
    words = list(index.classes)
    wid = index.class_to_idx

    def frames_of(split, per_clip=(0, 7, 14, 21, 28)):
        xs, ys = [], []
        for entry in sorted(index.entries, key=lambda e: e.key):
            if entry.split != split:
                continue
            clip = np.load(entry.path)
            for f in per_clip:
                xs.append(clip[f])
            ys.extend([wid[entry.word]] * len(per_clip))
        return ArrayDataset(inputs=(np.stack(xs),),
                            labels=np.asarray(ys, np.int32))

    train_ds, val_ds = frames_of("train"), frames_of("val", per_clip=(14,))
    trainer = Trainer(
        _FrameClassifier(len(words)),
        TrainerConfig(
            model_name="frame_donor", num_classes=len(words),
            batch_size=256, epochs=epochs, learning_rate=1e-3,
            weight_decay=1e-4, metrics_dir=os.path.join(out_dir, "metrics"),
            checkpoints_dir=os.path.join(out_dir, "ckpt"),
            test_every_epoch=False,
        ),
    )
    t0 = time.time()
    result = trainer.fit(train_ds, val_ds, progress=print)
    row = {"tag": "prior_frame_donor", "task": "hard100_video_frames",
           "best_val_acc": round(result["best_val_acc"], 2),
           "seconds": round(time.time() - t0, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return ckpt


def run_cv(tag, model_name, out_dir, pretrained=None, freeze=None, epochs=12):
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.cues_video import main as cv_main

    model = {"name": model_name, "dtype": "bfloat16"}
    if pretrained:
        model["pretrained"] = pretrained
    if freeze is not None:
        model["freeze_backbone"] = freeze
    cfg = Config.from_dict({
        "dataset": {"root_dir": FAMILY_CORPUS, "cue_root": FAMILY_CORPUS,
                    "cue_mode": "emotion", "embed_model": "mpnet",
                    "cache_dir": "/tmp/hardsynth/cue_cache", "num_classes": 4},
        "model": model,
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-4, "epochs": epochs, "seed": 0},
        "output": {"base_dir": out_dir, "plots": False},
    })
    t0 = time.time()
    r = cv_main(cfg)
    row = {"tag": tag, "model": model_name,
           "pretrained": bool(pretrained), "freeze_backbone": freeze,
           "final_test_acc": round(r["final_test_acc"], 2),
           "best_val_acc": round(max(h["val_acc"] for h in r["history"]), 2),
           "epochs": len(r["history"]), "seconds": round(time.time() - t0, 1)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def done(tag):
    path = os.path.join(OUT, "summary.jsonl")
    if not os.path.exists(path):
        return False
    return any(json.loads(l).get("tag") == tag for l in open(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-existing", action="store_true")
    ap.add_argument(
        "--strong", action="store_true",
        help="run only the strong per-frame donor + the three "
        "strong-prior-grafted mobile rows (tags *_strongprior)")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    build_corpora()

    if args.strong:
        ckpt = pretrain_frame_donor()
        spec = {"arch": "checkpoint", "path": ckpt,
                "source_submodule": ["cnn"],
                "submodule": ["video_encoder", "cnn"]}
        for name in ("middle_fusion_mobile", "late_fusion_mobile",
                     "early_fusion_mobile"):
            tag = f"{name}_strongprior"
            if args.skip_existing and done(tag):
                print(f"{tag}: done, skipping", flush=True)
                continue
            run_cv(tag, name, f"/tmp/cv_runs/{tag}", pretrained=spec)
        print("strong-donor study complete", flush=True)
        return

    # A. causal control: trainable backbone on the worst offender
    if not (args.skip_existing and done("middle_fusion_mobile_unfrozen")):
        run_cv("middle_fusion_mobile_unfrozen", "middle_fusion_mobile",
               "/tmp/cv_runs/mfm_unfrozen", freeze=False)

    # B. frozen structured-prior features for all three mobile variants
    ckpt = pretrain_mobilenet()
    spec = {"arch": "checkpoint", "path": ckpt,
            "source_submodule": ["mobilenet"],
            "submodule": ["video_encoder", "cnn"]}
    for name in ("middle_fusion_mobile", "late_fusion_mobile",
                 "early_fusion_mobile"):
        tag = f"{name}_prior"
        if args.skip_existing and done(tag):
            print(f"{tag}: done, skipping", flush=True)
            continue
        run_cv(tag, name, f"/tmp/cv_runs/{name}_prior", pretrained=spec)
    print("study complete", flush=True)


if __name__ == "__main__":
    main()
