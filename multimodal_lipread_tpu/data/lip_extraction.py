"""Offline lip-region extraction: videos → (29, 44, 44, 3) uint8 .npy mirror tree.

Host-CPU preprocessing stage, same contract as the reference
(video/data_utils/visual_preprocessing.py:21-279): 29 evenly-spaced frames
(duplicate-last when short), per-frame lip crop with 40% margin,
aspect-preserving resize + average-color padding to 44x44, blank frame when
detection fails or a frame can't be read, output written to the
``<root>_lip_regions`` mirror tree. This never runs on the TPU hot path —
training consumes the .npy store (SURVEY.md §2.9 mediapipe row).

Landmark backends (auto-selected, best available first):

- ``mediapipe``: FaceMesh with the reference's 22 lip landmark indices
  (visual_preprocessing.py:54-57) — bit-compatible crops when installed.
- ``haar``: OpenCV Haar frontal-face detector; the mouth box is estimated
  from face-box geometry (lower third, central half) with the same 40% margin
  — a dependency-light approximation for environments without mediapipe.
- ``center``: fixed central crop (lower-middle of the frame) — deterministic
  last resort so the pipeline stays runnable anywhere.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import lip_regions_root

# Reference lip landmark set (visual_preprocessing.py:54-57)
LIP_LANDMARK_INDICES = [
    61, 146, 91, 181, 84, 17, 314, 405, 321, 375, 291,  # outer
    78, 95, 88, 178, 87, 14, 317, 402, 318, 324, 308,   # inner
]

MARGIN = 0.4
TARGET_SIZE = (44, 44)
NUM_FRAMES = 29


def resize_and_pad(
    image: Optional[np.ndarray],
    target_size: Tuple[int, int] = TARGET_SIZE,
    padding_mode: str = "average",
) -> np.ndarray:
    """Aspect-preserving resize + padding (visual_preprocessing.py:111-162)."""
    th, tw = target_size
    if image is None or image.size == 0:
        return np.zeros((th, tw, 3), dtype=np.uint8)
    import cv2

    h, w = image.shape[:2]
    aspect = w / h
    target_aspect = tw / th
    if aspect > target_aspect:
        new_w, new_h = tw, int(tw / aspect)
    else:
        new_h, new_w = th, int(th * aspect)
    new_w, new_h = max(new_w, 1), max(new_h, 1)
    resized = cv2.resize(image, (new_w, new_h))
    if padding_mode == "average":
        avg = np.mean(resized, axis=(0, 1)).astype(np.uint8)
        canvas = np.full((th, tw, 3), avg, dtype=np.uint8)
    else:
        canvas = np.zeros((th, tw, 3), dtype=np.uint8)
    ph, pw = (th - new_h) // 2, (tw - new_w) // 2
    canvas[ph : ph + new_h, pw : pw + new_w] = resized
    return canvas


def _expand_box(x_min, y_min, x_max, y_max, frame_h, frame_w, margin=MARGIN):
    """40% margin around the lip bbox (visual_preprocessing.py:92-103)."""
    h, w = y_max - y_min, x_max - x_min
    mh, mw = int(h * margin), int(w * margin)
    return (
        max(0, x_min - mw), max(0, y_min - mh),
        min(frame_w, x_max + mw), min(frame_h, y_max + mh),
    )


class _MediaPipeBackend:
    def __init__(self):
        import mediapipe as mp

        self.face_mesh = mp.solutions.face_mesh.FaceMesh(
            static_image_mode=False, max_num_faces=1,
            min_detection_confidence=0.5, min_tracking_confidence=0.5,
        )

    def lip_box(self, frame_rgb: np.ndarray):
        results = self.face_mesh.process(frame_rgb)
        if not results.multi_face_landmarks:
            return None
        h, w = frame_rgb.shape[:2]
        pts = [
            (int(lm.x * w), int(lm.y * h))
            for i, lm in enumerate(results.multi_face_landmarks[0].landmark)
            if i in LIP_LANDMARK_INDICES
        ]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        return _expand_box(min(xs), min(ys), max(xs), max(ys), h, w)


class _HaarBackend:
    def __init__(self):
        import cv2

        path = os.path.join(cv2.data.haarcascades, "haarcascade_frontalface_default.xml")
        self.cascade = cv2.CascadeClassifier(path)
        if self.cascade.empty():
            raise RuntimeError("Haar cascade unavailable")

    def lip_box(self, frame_rgb: np.ndarray):
        import cv2

        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
        faces = self.cascade.detectMultiScale(gray, 1.1, 4)
        if len(faces) == 0:
            return None
        x, y, w, h = max(faces, key=lambda f: f[2] * f[3])
        # mouth region: central half horizontally, lower third vertically
        x_min, x_max = x + w // 4, x + 3 * w // 4
        y_min, y_max = y + 2 * h // 3, y + h
        fh, fw = frame_rgb.shape[:2]
        return _expand_box(x_min, y_min, x_max, y_max, fh, fw)


class _CenterBackend:
    def lip_box(self, frame_rgb: np.ndarray):
        h, w = frame_rgb.shape[:2]
        return _expand_box(w // 3, h // 2, 2 * w // 3, 5 * h // 6, h, w)


def _make_backend(name: str):
    if name == "mediapipe":
        return _MediaPipeBackend()
    if name == "haar":
        return _HaarBackend()
    if name == "center":
        return _CenterBackend()
    raise ValueError(f"Unknown landmark backend: {name}")


class LipRegionExtractor:
    """Video → (num_frames, 44, 44, 3) uint8 lip-region sequence."""

    def __init__(
        self,
        target_size: Tuple[int, int] = TARGET_SIZE,
        padding_mode: str = "average",
        backend: str = "auto",
    ):
        self.target_size = target_size
        self.padding_mode = padding_mode
        if backend == "auto":
            for name in ("mediapipe", "haar", "center"):
                try:
                    self.backend = _make_backend(name)
                    self.backend_name = name
                    break
                except Exception:
                    continue
        else:
            self.backend = _make_backend(backend)
            self.backend_name = backend

    def extract_lip_region(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        box = self.backend.lip_box(frame_rgb)
        if box is None:
            return None
        x_min, y_min, x_max, y_max = box
        crop = frame_rgb[y_min:y_max, x_min:x_max]
        return resize_and_pad(crop, self.target_size, self.padding_mode)

    def extract_lip_sequence(self, video_path: str, num_frames: int = NUM_FRAMES) -> np.ndarray:
        """29 evenly-spaced frames; duplicate-last when the video is short;
        blank frames on read/detect failure (visual_preprocessing.py:164-211)."""
        import cv2

        cap = cv2.VideoCapture(video_path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        th, tw = self.target_size
        if total <= 0:
            cap.release()
            return np.zeros((num_frames, th, tw, 3), dtype=np.uint8)
        if total <= num_frames:
            idxs = np.concatenate([np.arange(total), np.full(num_frames - total, total - 1)])
        else:
            idxs = np.linspace(0, total - 1, num_frames).astype(int)

        seq: List[np.ndarray] = []
        for idx in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, frame_bgr = cap.read()
            if not ok:
                seq.append(np.zeros((th, tw, 3), dtype=np.uint8))
                continue
            frame_rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            region = self.extract_lip_region(frame_rgb)
            seq.append(region if region is not None else np.zeros((th, tw, 3), dtype=np.uint8))
        cap.release()
        return np.asarray(seq, dtype=np.uint8)

    def extract_full_frame_sequence(
        self, video_path: str, num_frames: int = NUM_FRAMES
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Decode + detect only — the device-crop streaming stage's host half.

        Returns (frames uint8 (num_frames, H, W, 3), boxes int32
        (num_frames, 4)): the same 29-evenly-spaced frame selection and the
        same margin-expanded lip boxes as :meth:`extract_lip_sequence`, but
        WITHOUT cropping — crop/resize/pad run on device
        (ops/crop_resize.py). Unreadable frames / failed detections carry a
        degenerate (0, 0, 0, 0) box, which the device kernel turns into the
        reference's blank frame.
        """
        import cv2

        cap = cv2.VideoCapture(video_path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if total <= 0:
            cap.release()
            return (
                np.zeros((num_frames, 1, 1, 3), np.uint8),
                np.zeros((num_frames, 4), np.int32),
            )
        if total <= num_frames:
            idxs = np.concatenate([np.arange(total), np.full(num_frames - total, total - 1)])
        else:
            idxs = np.linspace(0, total - 1, num_frames).astype(int)
        # the buffer shape comes from the first DECODED frame, not the
        # container header (CAP_PROP_FRAME_* can be absent or disagree with
        # the decoded size — rotation metadata, corrupt headers); frames
        # decoding at a different size are treated as unreadable (blank
        # frame + degenerate box), matching the host path's failure mode
        frames = boxes = None
        for k, idx in enumerate(idxs):
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, frame_bgr = cap.read()
            if not ok:
                continue
            frame_rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            if frames is None:
                h, w = frame_rgb.shape[:2]
                frames = np.zeros((num_frames, h, w, 3), np.uint8)
                boxes = np.zeros((num_frames, 4), np.int32)
            if frame_rgb.shape != frames.shape[1:]:
                continue
            frames[k] = frame_rgb
            box = self.backend.lip_box(frame_rgb)
            if box is not None:
                boxes[k] = box  # already margin-expanded + frame-clipped
        cap.release()
        if frames is None:  # no frame ever decoded
            frames = np.zeros((num_frames, 1, 1, 3), np.uint8)
            boxes = np.zeros((num_frames, 4), np.int32)
        return frames, boxes


def process_dataset(
    root_dir: str,
    output_root: Optional[str] = None,
    backend: str = "auto",
    padding_mode: str = "average",
    num_frames: int = NUM_FRAMES,
    overwrite: bool = False,
) -> Tuple[int, int]:
    """Walk every .mp4 under ``root_dir``, write the .npy mirror tree
    (visual_preprocessing.py:220-279). Returns (processed, failed)."""
    if output_root is None:
        output_root = lip_regions_root(root_dir)
    extractor = LipRegionExtractor(padding_mode=padding_mode, backend=backend)
    processed = failed = 0
    for dirpath, _dirs, files in os.walk(root_dir):
        for name in sorted(files):
            if not name.lower().endswith(".mp4"):
                continue
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, root_dir)
            dst = os.path.join(output_root, os.path.splitext(rel)[0] + ".npy")
            if os.path.exists(dst) and not overwrite:
                continue
            try:
                seq = extractor.extract_lip_sequence(src, num_frames=num_frames)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                np.save(dst, seq)
                processed += 1
            except Exception as e:  # keep going, like the reference (:267-274)
                print(f"Failed on {src}: {e}")
                failed += 1
    return processed, failed


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Extract lip regions to a .npy mirror tree")
    parser.add_argument("--config", required=False)
    parser.add_argument("--root", required=False, help="GLips root (overrides config)")
    parser.add_argument("--backend", default="auto", choices=["auto", "mediapipe", "haar", "center"])
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()
    root = args.root
    padding = "average"
    if args.config:
        cfg = Config(args.config)
        root = root or cfg.get("dataset.root_dir")
        padding = cfg.get("preprocessing.padding_mode", "average")
    if not root:
        parser.error("--root or --config with dataset.root_dir required")
    n_ok, n_fail = process_dataset(root, backend=args.backend, padding_mode=padding,
                                   overwrite=args.overwrite)
    print(f"Processed {n_ok} videos ({n_fail} failures) → {lip_regions_root(root)}")


if __name__ == "__main__":
    main()
