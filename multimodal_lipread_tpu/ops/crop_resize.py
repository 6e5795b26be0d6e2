"""Device-side lip-crop kernels: bbox crop + aspect-preserving resize +
average-color pad, batched over frames, inside jit.

The reference runs this per frame in host cv2
(/root/reference/video/data_utils/visual_preprocessing.py:111-162: bbox
crop, aspect-preserving ``cv2.resize``, centered average-color padding to
44x44); this module is the TPU-native equivalent the north-star layout
names ("host video-decode stage feeding device-side crop/resize/normalize
kernels", BASELINE.json): the host decodes FULL frames and ships uint8 +
int32 boxes over PCIe once, and the crop/resize/pad/normalize all happen on
device as one fused XLA program:

- every output pixel's source coordinate is an affine function of the box,
  so the dynamic-size crop/resize becomes a static-shape bilinear GATHER
  over the (44, 44) target grid — no dynamic shapes, fully batchable,
  vmapped over frames and fused with the /255 normalize;
- the average-pad color is the masked mean over the valid (letterboxed)
  region of the resized image, matching ``np.mean(resized)`` in the
  reference;
- coordinate mapping matches ``cv2.resize`` INTER_LINEAR
  (``src = (dst + 0.5) * scale - 0.5``, edge-clamped), and the integer
  contract matches the host path (``int()`` truncation for the letterbox
  size, truncating ``astype(uint8)`` for the average color) — parity with
  the cv2 path is pinned to <=1 LSB in tests/test_crop_resize.py.

Degenerate boxes (w <= 0 or h <= 0 — detection failures) produce the
reference's blank frame (all zeros).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

TARGET_SIZE = (44, 44)
MARGIN = 0.4


def expand_boxes(
    boxes: jax.Array, frame_h: int, frame_w: int, margin: float = MARGIN
) -> jax.Array:
    """40% margin around lip bboxes, clipped to the frame — the device
    version of data/lip_extraction._expand_box
    (visual_preprocessing.py:92-103). ``boxes`` is int32 (..., 4) as
    (x_min, y_min, x_max, y_max); margins truncate like ``int()``."""
    x_min, y_min, x_max, y_max = (boxes[..., i] for i in range(4))
    h, w = y_max - y_min, x_max - x_min
    mh = (h.astype(jnp.float32) * margin).astype(jnp.int32)
    mw = (w.astype(jnp.float32) * margin).astype(jnp.int32)
    return jnp.stack(
        [
            jnp.maximum(0, x_min - mw),
            jnp.maximum(0, y_min - mh),
            jnp.minimum(frame_w, x_max + mw),
            jnp.minimum(frame_h, y_max + mh),
        ],
        axis=-1,
    )


def _crop_resize_pad_one(frame, box, th: int, tw: int):
    """One frame (H, W, C) uint8 + one box → (th, tw, C) uint8."""
    H, W = frame.shape[0], frame.shape[1]
    x_min, y_min, x_max, y_max = (box[i].astype(jnp.float32) for i in range(4))
    cw, ch = x_max - x_min, y_max - y_min
    valid_box = (cw > 0) & (ch > 0)
    cw_s, ch_s = jnp.maximum(cw, 1.0), jnp.maximum(ch, 1.0)

    # letterbox size, truncating like the reference's int() (host path
    # resize_and_pad: aspect > target_aspect → (tw, int(tw/aspect))) —
    # computed in EXACT integer arithmetic (aspect > tw/th ⟺ cw*th > ch*tw;
    # floor(tw/aspect) = (tw*ch)//cw), where the host's float64 is one-ULP
    # unstable at exact-ratio boundaries
    cwi = jnp.maximum(box[2] - box[0], 1)
    chi = jnp.maximum(box[3] - box[1], 1)
    wide = cwi * th > chi * tw
    new_w = jnp.where(wide, tw, (th * cwi) // chi).astype(jnp.int32)
    new_h = jnp.where(wide, (tw * chi) // cwi, th).astype(jnp.int32)
    new_w = jnp.maximum(new_w, 1)
    new_h = jnp.maximum(new_h, 1)
    ph = (th - new_h) // 2
    pw = (tw - new_w) // 2

    # cv2 INTER_LINEAR mapping over the crop: src = (dst + 0.5)*scale - 0.5,
    # then edge-clamped to the crop (cv2 sees only the cropped image, so its
    # border replication clamps at the crop boundary, not the frame's)
    ii = jnp.arange(th, dtype=jnp.float32)[:, None]  # output row
    jj = jnp.arange(tw, dtype=jnp.float32)[None, :]  # output col
    ri = ii - ph.astype(jnp.float32)  # in-region coords
    rj = jj - pw.astype(jnp.float32)
    in_region = (
        (ri >= 0) & (ri < new_h.astype(jnp.float32))
        & (rj >= 0) & (rj < new_w.astype(jnp.float32))
    )
    scale_y = ch_s / new_h.astype(jnp.float32)
    scale_x = cw_s / new_w.astype(jnp.float32)
    src_y = jnp.clip((ri + 0.5) * scale_y - 0.5, 0.0, ch_s - 1.0) + y_min
    src_x = jnp.clip((rj + 0.5) * scale_x - 0.5, 0.0, cw_s - 1.0) + x_min
    src_y = jnp.clip(src_y, 0.0, H - 1.0)
    src_x = jnp.clip(src_x, 0.0, W - 1.0)

    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    # bilinear neighbours clamp at the crop's last row/col (cv2 border)
    y1 = jnp.minimum(y0 + 1, jnp.minimum((y_min + ch_s).astype(jnp.int32) - 1, H - 1))
    x1 = jnp.minimum(x0 + 1, jnp.minimum((x_min + cw_s).astype(jnp.int32) - 1, W - 1))
    wy = (src_y - y0.astype(jnp.float32))[..., None]
    wx = (src_x - x0.astype(jnp.float32))[..., None]

    f = frame.astype(jnp.float32)
    # broadcasting gather: (th, 1) rows x (1, tw) cols → (th, tw, C)
    p00 = f[y0, x0]
    p01 = f[y0, x1]
    p10 = f[y1, x0]
    p11 = f[y1, x1]
    sampled = (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )
    resized_u8 = jnp.clip(jnp.round(sampled), 0, 255)

    # average color over the valid region of the ROUNDED resized image,
    # truncated to uint8 exactly like np.mean(...).astype(uint8)
    m = in_region[..., None].astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    avg = jnp.floor(jnp.sum(resized_u8 * m, axis=(0, 1)) / count)

    canvas = jnp.where(in_region[..., None], resized_u8, avg)
    canvas = jnp.where(valid_box, canvas, 0.0)
    return canvas.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("target_size",))
def crop_resize_pad(
    frames: jax.Array,
    boxes: jax.Array,
    target_size: Tuple[int, int] = TARGET_SIZE,
) -> jax.Array:
    """Batched device crop/resize/pad: ``frames`` uint8 (..., H, W, C) +
    ``boxes`` int32 (..., 4) → uint8 (..., th, tw, C).

    Any number of leading batch axes (e.g. (B, T) video). Boxes are
    (x_min, y_min, x_max, y_max) in frame pixels, already margin-expanded
    (:func:`expand_boxes`); degenerate boxes yield blank frames.
    """
    th, tw = target_size
    lead = frames.shape[:-3]
    fl = frames.reshape((-1,) + frames.shape[-3:])
    bl = boxes.reshape(-1, 4)
    out = jax.vmap(lambda f, b: _crop_resize_pad_one(f, b, th, tw))(fl, bl)
    return out.reshape(lead + (th, tw, frames.shape[-1]))


def crop_resize_pad_normalize(
    frames: jax.Array,
    boxes: jax.Array,
    target_size: Tuple[int, int] = TARGET_SIZE,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Fused variant for the train step: crop/resize/pad then /255 in one
    program — the output feeds the video models' device-normalized input
    contract (train/trainer.py cast stage)."""
    return crop_resize_pad(frames, boxes, target_size).astype(dtype) / 255.0
