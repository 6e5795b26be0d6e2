"""Device-side crop/resize/pad kernel vs the host cv2 path.

The device kernel (ops/crop_resize.py) must reproduce the host
lip-extraction geometry (data/lip_extraction.py::resize_and_pad — the
reference's visual_preprocessing.py:111-162 contract): same letterbox, same
centered average-color padding, bilinear samples within 1 LSB of
cv2.resize's fixed-point arithmetic. Degenerate boxes yield the blank
frame. The letterbox size itself uses exact integer arithmetic on device
((th*w)//h) where the host uses float64 int(th*w/h) — at exact-ratio
boundaries the float path is itself one-ULP unstable, so geometry is
allowed to differ on a small fraction of random boxes (counted, bounded).
"""

import numpy as np
import pytest

from multimodal_lipread_tpu.data.lip_extraction import (
    _expand_box,
    resize_and_pad,
)
from multimodal_lipread_tpu.ops.crop_resize import (
    crop_resize_pad,
    crop_resize_pad_normalize,
    expand_boxes,
)


def _random_frames_boxes(n, H=72, W=96, seed=0):
    r = np.random.default_rng(seed)
    frames = r.integers(0, 256, size=(n, H, W, 3), dtype=np.uint8)
    x0 = r.integers(0, W - 8, size=n)
    y0 = r.integers(0, H - 8, size=n)
    x1 = x0 + r.integers(4, W // 2, size=n)
    y1 = y0 + r.integers(4, H // 2, size=n)
    boxes = np.stack([x0, y0, np.minimum(x1, W), np.minimum(y1, H)], -1)
    return frames, boxes.astype(np.int32)


def _host_reference(frame, box):
    x0, y0, x1, y1 = box
    return resize_and_pad(frame[y0:y1, x0:x1])


def test_matches_cv2_path_on_random_boxes():
    frames, boxes = _random_frames_boxes(64)
    out = np.asarray(crop_resize_pad(frames, boxes))
    geometry_mismatch = 0
    for i in range(len(frames)):
        ref = _host_reference(frames[i], boxes[i])
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        if diff.max() > 1:
            # letterbox geometry differs by one row/col (float64-vs-integer
            # truncation at an exact-ratio boundary) — bounded, not silent
            geometry_mismatch += 1
            continue
        assert diff.max() <= 1
    assert geometry_mismatch <= 2, (
        f"{geometry_mismatch}/64 boxes exceeded 1 LSB — kernel geometry "
        "disagrees with the cv2 path beyond exact-ratio boundary cases"
    )


def test_square_crop_exact_geometry():
    # square crops have aspect exactly 1.0 in every arithmetic — geometry
    # must match and every pixel stays within cv2's fixed-point LSB
    frames, _ = _random_frames_boxes(8, seed=1)
    boxes = np.array([[10, 5, 54, 49]] * 8, np.int32)  # 44x44 → identity-ish
    out = np.asarray(crop_resize_pad(frames, boxes))
    for i in range(8):
        ref = _host_reference(frames[i], boxes[i])
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


def test_exact_size_crop_is_identity():
    # a 44x44 box needs no resize and no pad: output == input crop exactly
    frames, _ = _random_frames_boxes(4, seed=2)
    box = np.array([7, 3, 51, 47], np.int32)
    out = np.asarray(crop_resize_pad(frames, np.tile(box, (4, 1))))
    for i in range(4):
        np.testing.assert_array_equal(out[i], frames[i][3:47, 7:51])


def test_degenerate_box_blank_frame():
    frames, boxes = _random_frames_boxes(3)
    boxes[0] = (10, 10, 10, 20)  # zero width
    boxes[1] = (30, 12, 20, 40)  # negative width
    out = np.asarray(crop_resize_pad(frames, boxes))
    assert (out[0] == 0).all() and (out[1] == 0).all()
    assert out[2].any()


def test_batch_axes_and_video_shape():
    frames, boxes = _random_frames_boxes(12, seed=3)
    video = frames.reshape(3, 4, 72, 96, 3)
    vboxes = boxes.reshape(3, 4, 4)
    out = np.asarray(crop_resize_pad(video, vboxes))
    assert out.shape == (3, 4, 44, 44, 3)
    flat = np.asarray(crop_resize_pad(frames, boxes))
    np.testing.assert_array_equal(out.reshape(12, 44, 44, 3), flat)


def test_expand_boxes_matches_host():
    r = np.random.default_rng(4)
    H, W = 72, 96
    for _ in range(50):
        x0, y0 = int(r.integers(0, 60)), int(r.integers(0, 40))
        x1, y1 = x0 + int(r.integers(2, 30)), y0 + int(r.integers(2, 30))
        host = _expand_box(x0, y0, min(x1, W), min(y1, H), H, W)
        dev = np.asarray(
            expand_boxes(
                np.array([[x0, y0, min(x1, W), min(y1, H)]], np.int32), H, W
            )
        )[0]
        assert tuple(dev) == host


def test_fused_normalize():
    frames, boxes = _random_frames_boxes(4, seed=5)
    u8 = np.asarray(crop_resize_pad(frames, boxes))
    f32 = np.asarray(crop_resize_pad_normalize(frames, boxes))
    assert f32.dtype == np.float32
    np.testing.assert_allclose(f32, u8.astype(np.float32) / 255.0, atol=1e-7)


# --------------------------------------------------------------------------
# End-to-end: host decode+detect half → device crop vs the all-host cv2 path


def _write_video(path, n_frames=12, size=(96, 96)):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, 25.0, size)
    r = np.random.default_rng(7)
    for i in range(n_frames):
        frame = r.integers(0, 256, (size[1], size[0], 3), np.uint8)
        w.write(frame)
    w.release()
    return str(path)


def test_full_frame_sequence_plus_device_crop_matches_host_extraction(tmp_path):
    """The split layout (host decode+detect, device crop/resize/pad) must
    reproduce extract_lip_sequence's all-host output: same 29-frame
    selection, same boxes, crops within the kernel's 1-LSB envelope."""
    from multimodal_lipread_tpu.data.lip_extraction import LipRegionExtractor

    video = _write_video(tmp_path / "clip_0001-0001.mp4")
    ex = LipRegionExtractor(backend="center")  # deterministic boxes
    host = ex.extract_lip_sequence(video)
    frames, boxes = ex.extract_full_frame_sequence(video)
    assert frames.shape == (29, 96, 96, 3) and boxes.shape == (29, 4)
    dev = np.asarray(crop_resize_pad(frames, boxes))
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_full_frame_sequence_blank_on_detect_failure(tmp_path):
    """Degenerate (0,0,0,0) boxes from failed detections must become the
    reference's blank frames on device — like the host path does."""

    class _NeverDetect:
        def lip_box(self, frame_rgb):
            return None

    from multimodal_lipread_tpu.data.lip_extraction import LipRegionExtractor

    video = _write_video(tmp_path / "clip_0001-0002.mp4", n_frames=5)
    ex = LipRegionExtractor(backend="center")
    ex.backend = _NeverDetect()
    host = ex.extract_lip_sequence(video)
    frames, boxes = ex.extract_full_frame_sequence(video)
    assert (boxes == 0).all()
    dev = np.asarray(crop_resize_pad(frames, boxes))
    np.testing.assert_array_equal(dev, host)  # both all-blank
    assert (dev == 0).all()


def test_trainer_device_preproc_hook(tmp_path):
    """Trainer with device_preproc on (frames, boxes) inputs must produce
    the SAME trajectory as the plain trainer fed the device-cropped lips."""
    from flax import linen as nn

    from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig
    from multimodal_lipread_tpu.ops.crop_resize import crop_resize_pad as _crp

    class Tiny(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(16)(x)
            x = nn.relu(x)
            return nn.Dense(self.num_classes)(x)

    r = np.random.default_rng(11)
    n, T = 24, 4
    frames = r.integers(0, 256, (n, T, 72, 96, 3), np.uint8)
    boxes = np.tile(np.array([10, 5, 54, 49], np.int32), (n, T, 1))
    labels = r.integers(0, 3, size=n).astype(np.int32)
    # class-separable signal inside the crop region so training moves
    for i, l in enumerate(labels):
        frames[i, :, 5 + l * 10 : 15 + l * 10, 10:54] = 255

    lips = np.asarray(_crp(frames, boxes))  # what the model should see

    def cfg(**kw):
        return TrainerConfig(
            model_name="tiny", num_classes=3, batch_size=8, epochs=2,
            learning_rate=1e-3, metrics_dir=str(tmp_path / "m"),
            checkpoints_dir=str(tmp_path / "c"), test_every_epoch=False,
            **kw,
        )

    ds_raw = ArrayDataset(inputs=(frames, boxes), labels=labels)
    ds_lips = ArrayDataset(inputs=(lips,), labels=labels)

    t1 = Trainer(Tiny(), cfg(device_preproc=lambda f, b: (_crp(f, b),)))
    r1 = t1.fit(ds_raw, ds_raw, ds_raw)
    t2 = Trainer(Tiny(), cfg())
    r2 = t2.fit(ds_lips, ds_lips, ds_lips)

    h1 = [(e["train_loss"], e["val_acc"]) for e in r1["history"]]
    h2 = [(e["train_loss"], e["val_acc"]) for e in r2["history"]]
    np.testing.assert_allclose(h1, h2, rtol=1e-6)
