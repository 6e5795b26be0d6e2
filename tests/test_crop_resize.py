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
