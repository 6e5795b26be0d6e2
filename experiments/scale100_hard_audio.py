"""100-class HARD audio benchmark: realistic difficulty × class scale.

The hard-corpus sweep (hard_sweep.py) calibrated per-modality ``hardness``
at 20 words; the class-scale drivers (scale500.py, scale100_video.py) run
many classes at hardness 0. This driver combines the two axes for the
audio pipeline: 100 words × audio hardness 0.55 (the sweep's calibrated
value) + 5% label noise, so the 100-way problem neither saturates nor
collapses — the closest available proxy to real-GLips difficulty at real
class scale in this zero-egress image (reference only ever trains 4 words:
audio/configs/audio_config.yaml num_classes; BASELINE.md).

Trains the reference's best audio model (vgg_lstm) and the Conformer
extension under the reference protocol (Adam + plateau-min LR, best-val
checkpoint, final test on best).

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/scale100_hard_audio.py
"""
import argparse
import json
import os
import time

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips
from multimodal_lipread_tpu.pipelines.audio import main as audio_main

WORDS = tuple(f"wort{i:03d}" for i in range(100))


def run(root: str, epochs: int, clips_per_split: int) -> None:
    if not os.path.exists(os.path.join(root, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(
            root, words=WORDS, clips_per_split=clips_per_split, seed=23,
            with_cues=False, with_lip_regions=False,
            hardness={"audio": 0.55}, label_noise=0.05,
        )
        print(f"corpus built in {time.time() - t0:.0f}s "
              f"({100 * clips_per_split * 3} clips)", flush=True)

    out_base = os.path.join(os.path.dirname(root), "out")
    for name in ("vgg_lstm", "conformer"):
        cfg = Config.from_dict({
            "dataset": {"root_dir": root, "num_classes": 100, "input_size": 117},
            "model": {"name": name, "version": 16, "dtype": "bfloat16"},
            "training": {"batch_size": 128, "learning_rate": 5e-4,
                         "weight_decay": 1e-4, "epochs": epochs, "seed": 0},
            "output": {"base_dir": f"{out_base}_{name}", "plots": False},
        })
        r = audio_main(cfg)
        secs = [round(h["seconds"], 1) for h in r["history"]]
        lrs = sorted({h["lr"] for h in r["history"]})
        print(json.dumps({
            "tag": f"hard100_{name}",
            "num_classes": 100,
            "hardness": 0.55, "label_noise": 0.05,
            "epoch_seconds": secs,
            "steady_epoch_s": secs[-1],
            "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
            "final_test_acc": round(r["final_test_acc"], 2),
            "best_val_acc": round(max(h["val_acc"] for h in r["history"]), 2),
            "plateau_lr_fired": len(lrs) > 1,
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hard100a/GLips_100h")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--clips-per-split", type=int, default=50)
    a = ap.parse_args()
    run(a.root, a.epochs, a.clips_per_split)
