"""Video class scale: 100-word lip-reading training, materialized + streaming.

Companion to ``scale500.py`` (audio at the full 500-word GLips class scale):
this driver is the CLASS-SCALE evidence for the VIDEO path — the many-class
lip-sequence grid code (data/synthetic.py ``_synth_lip_sequence``), the
uint8 NTHWC loader contract, the 100-way softmax head, and the native
out-of-core lip streaming (C++ prefetcher over ~600 MB of `.npy` lips) all
working far beyond the reference's 4-word subset (reference:
video/config/visual_config.yaml num_classes; real GLips has 500 words).

100 words (not 500) keeps the corpus at ~600 MB of lips — the same
per-class clip budget as scale500 at a size this rig can also materialize,
so the streaming-vs-materialized comparison stays honest.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/scale100_video.py
"""
import argparse
import json
import os
import time

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips
from multimodal_lipread_tpu.pipelines.video import main as video_main

WORDS = tuple(f"wort{i:03d}" for i in range(100))


def run(root: str, epochs: int, clips_per_split: int) -> None:
    # with_audio=False ⇒ only the mirror tree <root>_lip_regions exists
    if not os.path.exists(root + "_lip_regions"):
        t0 = time.time()
        make_synthetic_glips(
            root, words=WORDS, clips_per_split=clips_per_split, seed=13,
            with_cues=False, with_audio=False,
        )
        print(f"corpus built in {time.time() - t0:.0f}s "
              f"({100 * clips_per_split * 3} clips)", flush=True)

    common = {
        "model": {"name": "resnet_lstm", "dtype": "bfloat16"},
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-5, "epochs": epochs, "seed": 0},
    }
    out_base = os.path.join(os.path.dirname(root), "out")
    for tag, ds in (
        ("materialized", {"root_dir": root, "num_classes": 100}),
        ("native_stream", {"root_dir": root, "num_classes": 100,
                           "streaming": True, "loader_backend": "native"}),
    ):
        cfg = Config.from_dict({
            **common, "dataset": ds,
            "output": {"base_dir": f"{out_base}_{tag}", "plots": False},
        })
        r = video_main(cfg)
        secs = [round(h["seconds"], 1) for h in r["history"]]
        print(json.dumps({
            "tag": tag,
            "num_classes": 100,
            "epoch_seconds": secs,
            "steady_epoch_s": secs[-1],
            "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
            "final_test_acc": round(r["final_test_acc"], 2),
            "best_val_acc": round(max(h["val_acc"] for h in r["history"]), 2),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/scale100v/GLips_100v")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--clips-per-split", type=int, default=12)
    a = ap.parse_args()
    run(a.root, a.epochs, a.clips_per_split)
