"""Metric plotting: per-model loss/accuracy PNGs + cue-classifier comparison.

Equivalent of the reference's per-subsystem ``visualize_metrics.py`` scripts
(reference: audio/visualize_metrics.py:5-59 and 6 near-identical copies) and
the cue comparison bar chart (plotting/cues_compare.py:8-47), consolidated
into one module that reads the Trainer's CSV logs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def plot_logs(metrics_dir: str, plots_dir: Optional[str] = None) -> list:
    """For every ``*_training_log.csv`` write ``<model>_loss.png`` and
    ``<model>_accuracy.png``. Returns the list of written paths."""
    plots_dir = plots_dir or os.path.join(os.path.dirname(metrics_dir.rstrip("/")), "plots")
    os.makedirs(plots_dir, exist_ok=True)
    written = []
    for name in sorted(os.listdir(metrics_dir)):
        if not name.endswith("_training_log.csv"):
            continue
        model = name[: -len("_training_log.csv")]
        df = pd.read_csv(os.path.join(metrics_dir, name))
        if df.empty:
            continue

        for kind in ("loss", "acc"):
            fig, ax = plt.subplots(figsize=(8, 5))
            for split in ("train", "val", "test"):
                col = f"{split}_{kind}"
                if col in df.columns and df[col].notna().any():
                    ax.plot(df["epoch"], df[col], marker="o", label=split)
            ax.set_xlabel("Epoch")
            ax.set_ylabel("Loss" if kind == "loss" else "Accuracy (%)")
            ax.set_title(f"{model} {'Loss' if kind == 'loss' else 'Accuracy'}")
            ax.legend()
            ax.grid(True, alpha=0.3)
            suffix = "loss" if kind == "loss" else "accuracy"
            out = os.path.join(plots_dir, f"{model}_{suffix}.png")
            fig.savefig(out, dpi=100, bbox_inches="tight")
            plt.close(fig)
            written.append(out)
    return written


def plot_cue_comparison(
    accuracies: Dict[str, Sequence[float]],
    out_path: str,
    labels: Sequence[str] = ("Emotion", "Environment"),
) -> str:
    """Grouped bar chart of cue-classifier test accuracies
    (reference: plotting/cues_compare.py:8-47).

    ``accuracies``: model name → per-mode accuracy list.
    """
    import numpy as np

    models = list(accuracies)
    n_groups = len(labels)
    x = np.arange(len(models))
    width = 0.8 / n_groups
    fig, ax = plt.subplots(figsize=(10, 6))
    for g, label in enumerate(labels):
        vals = [accuracies[m][g] for m in models]
        ax.bar(x + g * width, vals, width, label=label)
    ax.set_xticks(x + width * (n_groups - 1) / 2)
    ax.set_xticklabels(models, rotation=20, ha="right")
    ax.set_ylabel("Test Accuracy (%)")
    ax.set_title("Cue classifier comparison")
    ax.legend()
    ax.grid(True, axis="y", alpha=0.3)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def collect_final_accuracies(metrics_dir: str) -> Dict[str, float]:
    """model → final accuracy from a metrics dir.

    Prefers the ``Final Test`` TXT footer; falls back to the last CSV row's
    val accuracy (the cue classifiers log train/val only)."""
    import re

    out: Dict[str, float] = {}
    for name in sorted(os.listdir(metrics_dir)):
        if not name.endswith("_training_log.txt"):
            continue
        model = name[: -len("_training_log.txt")]
        text = open(os.path.join(metrics_dir, name)).read()
        m = re.findall(r"Final Test Acc:\s*([\d.]+)%", text)
        if m:
            out[model] = float(m[-1])
            continue
        csv_path = os.path.join(metrics_dir, f"{model}_training_log.csv")
        if os.path.exists(csv_path):
            df = pd.read_csv(csv_path)
            if not df.empty and "val_acc" in df.columns:
                out[model] = float(df["val_acc"].iloc[-1])
    return out


def cues_compare_from_logs(
    emotion_metrics_dir: str, environment_metrics_dir: str, out_path: str
) -> str:
    """Reference plotting/cues_compare.py, but computed from the actual logs
    instead of a hard-coded table."""
    emo = collect_final_accuracies(emotion_metrics_dir)
    env = collect_final_accuracies(environment_metrics_dir)
    models = sorted(set(emo) | set(env))
    acc = {m: [emo.get(m, 0.0), env.get(m, 0.0)] for m in models}
    return plot_cue_comparison(acc, out_path)


def plot_lip_sequence_grid(
    lip_sequence, out_path: str, rows: int = 3, cols: int = 10
) -> str:
    """Save a rows×cols frame grid PNG of a (T, H, W, 3) lip sequence —
    the eyeball check the reference ships as
    video/data_utils/test_visual_preprocessing.py:15-71."""
    import numpy as np

    seq = np.asarray(lip_sequence)
    n = min(rows * cols, seq.shape[0])
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.2, rows * 1.4))
    for i, ax in enumerate(np.asarray(axes).ravel()):
        ax.axis("off")
        if i < n:
            frame = seq[i]
            if frame.dtype != "uint8":
                frame = (np.clip(frame, 0, 1) * 255).astype("uint8")
            ax.imshow(frame)
            ax.set_title(str(i), fontsize=6)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Plot training-log CSVs")
    parser.add_argument("--metrics-dir", required=True)
    parser.add_argument("--plots-dir")
    args = parser.parse_args()
    written = plot_logs(args.metrics_dir, args.plots_dir)
    print(f"Wrote {len(written)} plots")


if __name__ == "__main__":
    main()
