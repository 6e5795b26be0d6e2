"""Frame extraction for cue generation: 3 evenly-spaced JPEGs per video.

Equivalent of ``cues/extract_frames.py`` (reference: cues/extract_frames.py:5-69):
writes ``<out_dir>/<split>/<word>/<stem>_frame{K}.jpg`` for each .mp4 under
the GLips tree.
"""

from __future__ import annotations

import os
from typing import Tuple


from multimodal_lipread_tpu.data.glips import SPLITS, lipread_files_dir


def extract_frames_from_video(video_path: str, out_dir: str, stem: str, num_frames: int = 3) -> int:
    import cv2

    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        return 0
    # exact reference selection and naming (cues/extract_frames.py:17,29):
    # indices int(i*total/num_frames) — thirds, NOT endpoints — and 1-based
    # _frame{K}.jpg names, so repo- and reference-extracted trees interleave
    idxs = [int(i * total / num_frames) for i in range(num_frames)]
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for k, idx in enumerate(idxs):
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ok, frame = cap.read()
        if not ok:
            continue
        cv2.imwrite(os.path.join(out_dir, f"{stem}_frame{k + 1}.jpg"), frame)
        written += 1
    cap.release()
    return written


def extract_dataset_frames(root_dir: str, out_root: str, num_frames: int = 3) -> Tuple[int, int]:
    """Walk the GLips tree, write JPEG frames grouped by split/word.
    Returns (videos_processed, frames_written)."""
    base = lipread_files_dir(root_dir)
    n_videos = n_frames = 0
    for word in sorted(os.listdir(base)):
        wdir = os.path.join(base, word)
        if not os.path.isdir(wdir):
            continue
        for split in SPLITS:
            sdir = os.path.join(wdir, split)
            if not os.path.isdir(sdir):
                continue
            for name in sorted(os.listdir(sdir)):
                if not name.lower().endswith(".mp4"):
                    continue
                stem = os.path.splitext(name)[0]
                out_dir = os.path.join(out_root, split, word)
                n_frames += extract_frames_from_video(
                    os.path.join(sdir, name), out_dir, stem, num_frames
                )
                n_videos += 1
    return n_videos, n_frames


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Extract JPEG frames for cue generation")
    parser.add_argument("--root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--num-frames", type=int, default=3)
    args = parser.parse_args()
    nv, nf = extract_dataset_frames(args.root, args.out, args.num_frames)
    print(f"Extracted {nf} frames from {nv} videos → {args.out}")


if __name__ == "__main__":
    main()
