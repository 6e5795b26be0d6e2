"""Preproc-included video streaming: device-side crop vs host cv2 crop.

The north-star layout ("host video-decode stage feeding device-side
crop/resize/normalize kernels", BASELINE.json) vs the reference's layout
(every stage on host: /root/reference/video/data_utils/visual_preprocessing.py:111-162).
Three measured rows, same synthetic .mp4 corpus, same model/epochs:

- ``materialized``: the offline layout — precomputed .npy lip tensors
  loaded once (the zoo-sweep default; no per-epoch preproc at all). The
  upper bound.
- ``host_crop_stream``: ONLINE preprocessing, reference layout — per epoch
  each clip is decoded and cropped/resized/padded in host cv2, the 44x44
  uint8 crops ship to device.
- ``device_crop_stream``: ONLINE preprocessing, north-star layout — host
  decodes + detects only; FULL uint8 frames + int32 boxes ship once and
  crop/resize/pad/normalize fuse into the train step on device
  (ops/crop_resize.py via TrainerConfig.device_preproc;
  ``dataset.device_crop`` in the video pipeline).

On a 1-core host the decode+detect half is shared by both streaming rows;
the measured delta isolates what moving the crop to the device buys
(host cv2 arithmetic off the critical path vs a larger H2D copy).

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/device_crop_bench.py
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "experiments", "device_crop_bench")


def run(root: str, epochs: int, clips: int):
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.data.synthetic import make_synthetic_glips
    from multimodal_lipread_tpu.pipelines.video import main as video_main

    if not os.path.exists(os.path.join(root, "lipread_files")):
        t0 = time.time()
        make_synthetic_glips(root, clips_per_split=clips, seed=11,
                             with_cues=False, with_audio=False,
                             with_lip_regions=True, with_video=True)
        print(f"corpus built in {time.time() - t0:.0f}s", flush=True)

    common = {
        "model": {"name": "resnet_lstm", "dtype": "bfloat16"},
        "training": {"batch_size": 128, "learning_rate": 1e-4,
                     "weight_decay": 1e-5, "epochs": epochs, "seed": 0},
    }
    rows = []
    for tag, ds in (
        ("materialized", {"root_dir": root, "num_classes": 4}),
        ("host_crop_stream", {"root_dir": root, "num_classes": 4,
                              "host_crop_streaming": True,
                              "landmark_backend": "center"}),
        ("device_crop_stream", {"root_dir": root, "num_classes": 4,
                                "device_crop": True,
                                "landmark_backend": "center"}),
    ):
        cfg = Config.from_dict({
            **common, "dataset": ds,
            "output": {"base_dir": os.path.join(os.path.dirname(root), f"out_{tag}"),
                       "plots": False},
        })
        r = video_main(cfg)
        secs = [round(h["seconds"], 1) for h in r["history"]]
        row = {
            "tag": tag, "epoch_seconds": secs, "steady_epoch_s": secs[-1],
            "clips_per_sec": round(r["history"][-1]["clips_per_sec"], 1),
            "final_val_acc": r["history"][-1]["val_acc"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    host = next(r for r in rows if r["tag"] == "host_crop_stream")
    dev = next(r for r in rows if r["tag"] == "device_crop_stream")
    dev["speedup_vs_host_crop"] = round(
        host["steady_epoch_s"] / dev["steady_epoch_s"], 2)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print("written", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dcbench/GLips_4")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--clips", type=int, default=100)
    a = ap.parse_args()
    run(a.root, a.epochs, a.clips)
