"""Native video streaming vs materialized epoch time.

Round-2 measured 19 s streaming vs 12 s materialized (2,400-clip corpus,
resnet_lstm, bf16 — docs/PERFORMANCE.md "Streaming"); round 3 replaced the
per-batch ``float(loss)`` fetch with the bounded async-metrics window
(`train/trainer.py::_AsyncMetrics`), which lets H2D of batch k+1 overlap
step k on every path. This driver reproduces the comparison.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/stream_bench.py
"""
import argparse
import json
import os
import time

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips
from multimodal_lipread_tpu.pipelines.video import main as video_main


def run(root: str, epochs: int) -> None:
    if not os.path.exists(os.path.join(root, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(root, words=DEFAULT_WORDS, clips_per_split=200,
                             seed=11, with_cues=False, with_audio=False)
        print(f"corpus built in {time.time() - t0:.0f}s", flush=True)

    common = {
        "model": {"name": "resnet_lstm", "dtype": "bfloat16"},
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-5, "epochs": epochs, "seed": 0},
    }
    out_base = os.path.join(os.path.dirname(root), "out")
    for tag, ds in (
        ("materialized", {"root_dir": root, "num_classes": 4}),
        ("native_stream", {"root_dir": root, "num_classes": 4,
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
            "epoch_seconds": secs,
            "steady_epoch_s": secs[-1],
            "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/streambench/GLips_4")
    ap.add_argument("--epochs", type=int, default=3)
    a = ap.parse_args()
    run(a.root, a.epochs)
