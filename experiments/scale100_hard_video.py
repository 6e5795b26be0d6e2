"""100-class HARD video benchmark: realistic difficulty × class scale.

Video counterpart of ``scale100_hard_audio.py``: 100 words of synthetic
lips with a nonzero video ``hardness``. The 20-class sweep calibrated
video hardness at 0.8 with 200 clips/class/split (hard_sweep/README.md);
at 100 classes this corpus has 30 clips/class/split (6.7× less data per
class, which is itself a difficulty axis), so hardness is set to 0.5 to
keep the task in the informative mid-band rather than at chance.

Trains video resnet_lstm (the class-scale driver's model, so the
100-class compile is cache-warm) under the reference protocol.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/scale100_hard_video.py
"""
import argparse
import json
import os
import time

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips
from multimodal_lipread_tpu.pipelines.video import main as video_main

WORDS = tuple(f"wort{i:03d}" for i in range(100))


def run(root: str, epochs: int, clips_per_split: int, hardness: float) -> None:
    if not os.path.exists(root + "_lip_regions"):
        t0 = time.time()
        make_synthetic_glips(
            root, words=WORDS, clips_per_split=clips_per_split, seed=29,
            with_cues=False, with_audio=False,
            hardness={"video": hardness}, label_noise=0.05,
        )
        print(f"corpus built in {time.time() - t0:.0f}s "
              f"({100 * clips_per_split * 3} clips)", flush=True)

    out_base = os.path.join(os.path.dirname(root), "out")
    name = "resnet_lstm"
    cfg = Config.from_dict({
        "dataset": {"root_dir": root, "num_classes": 100},
        "model": {"name": name, "dtype": "bfloat16"},
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-5, "epochs": epochs, "seed": 0},
        "output": {"base_dir": f"{out_base}_{name}", "plots": False},
    })
    r = video_main(cfg)
    secs = [round(h["seconds"], 1) for h in r["history"]]
    lrs = sorted({h["lr"] for h in r["history"]})
    print(json.dumps({
        "tag": f"hard100v_{name}",
        "num_classes": 100,
        "hardness": hardness, "label_noise": 0.05,
        "epoch_seconds": secs,
        "steady_epoch_s": secs[-1],
        "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
        "final_test_acc": round(r["final_test_acc"], 2),
        "best_val_acc": round(max(h["val_acc"] for h in r["history"]), 2),
        "plateau_lr_fired": len(lrs) > 1,
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hard100v/GLips_100vh")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--clips-per-split", type=int, default=30)
    ap.add_argument("--hardness", type=float, default=0.5)
    a = ap.parse_args()
    run(a.root, a.epochs, a.clips_per_split, a.hardness)
