"""Grain-based streaming loaders for datasets too large to materialize.

The default pipelines materialize the whole (small) GLips_4 subset as device
arrays — the fastest layout for that scale. For the full 500-word GLips (or
any corpus that doesn't fit in host RAM), this module provides the scalable
path the BASELINE north star calls for: multi-worker host loading with
per-host sharding via Grain, replacing the reference's
``DataLoader(num_workers=4)`` (reference: audio/train.py:112-114,
video/data_utils/dataset_loader.py:158-180).

Sources decode on the host (WAV via the native threaded decoder when
available) and yield fixed-shape numpy records; ``make_loader`` wraps them in
a ``grain.DataLoader`` with shuffling, worker processes, and
shard-by-process options. Device placement/sharding stays in the Trainer.

Invocation constraint with ``worker_count > 0``: Grain worker processes use
multiprocessing *spawn*, which re-imports the parent's ``__main__`` from its
module spec/argv. Launch pipelines through the real CLI (``python -m
multimodal_lipread_tpu.pipelines.<name>`` or the ``mlt-*`` console scripts)
— driving them via ``runpy`` with a synthetic ``sys.argv`` makes spawn
reconstruct a bogus module name and the workers die on import (observed:
``No module named multimodal_lipread_tpu.pipelines.--config``). pytest
runs are fine (pytest owns ``__main__``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from multimodal_lipread_tpu.data.audio_io import load_waveform
from multimodal_lipread_tpu.data.glips import ClipEntry


@dataclasses.dataclass
class AudioClipSource:
    """RandomAccessDataSource: GLips audio entries → (waveform, label)."""

    entries: Sequence[ClipEntry]
    class_to_idx: Dict[str, int]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[int(idx)]
        return {
            "waveform": load_waveform(e.path),
            "label": np.int32(self.class_to_idx[e.word]),
        }


@dataclasses.dataclass
class LipClipSource:
    """RandomAccessDataSource: lip-region .npy entries → (lips, label)."""

    entries: Sequence[ClipEntry]
    class_to_idx: Dict[str, int]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[int(idx)]
        # stays uint8: the Trainer normalizes to [0,1] ON DEVICE, so the
        # host→device copy is 4x smaller than float32
        return {
            "lip_regions": np.load(e.path),
            "label": np.int32(self.class_to_idx[e.word]),
        }


@dataclasses.dataclass
class FullFrameClipSource:
    """RandomAccessDataSource: raw GLips .mp4 entries → (frames, boxes, label).

    The host half of the device-crop layout (BASELINE north star: "host
    video-decode stage feeding device-side crop/resize/normalize kernels"):
    per clip, decode 29 evenly-spaced FULL frames and run lip detection
    only — the crop/resize/pad/normalize happen on device
    (ops/crop_resize.crop_resize_pad via the Trainer's ``device_preproc``
    hook). Replaces both the offline .npy mirror tree AND the reference's
    per-frame host cv2 crop (visual_preprocessing.py:111-162).

    Frames in one batch must share (H, W) — true for GLips (uniform
    256×256 clips); pass ``frame_shape`` to pin/verify it.
    """

    entries: Sequence[ClipEntry]
    class_to_idx: Dict[str, int]
    backend: str = "auto"
    frame_shape: Optional[tuple] = None  # (H, W) to enforce across clips

    @property
    def _ex(self):
        # lazy per-process construction: the detector backends hold
        # unpicklable native handles (cv2 cascade / mediapipe graph), and
        # grain worker_count>0 pickles the source into spawn workers —
        # each worker builds its own extractor on first use
        ex = getattr(self, "_extractor", None)
        if ex is None:
            from multimodal_lipread_tpu.data.lip_extraction import LipRegionExtractor

            ex = self._extractor = LipRegionExtractor(backend=self.backend)
        return ex

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if k != "_extractor"}

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[int(idx)]
        frames, boxes = self._ex.extract_full_frame_sequence(e.path)
        if self.frame_shape is not None and frames.shape[1:3] != tuple(self.frame_shape):
            raise ValueError(
                f"{e.path}: frame size {frames.shape[1:3]} != required "
                f"{tuple(self.frame_shape)} — device-crop batches need a "
                "uniform frame size"
            )
        return {
            "frames": frames,  # uint8 (29, H, W, 3)
            "boxes": boxes,    # int32 (29, 4), margin-expanded
            "label": np.int32(self.class_to_idx[e.word]),
        }


@dataclasses.dataclass
class HostCropClipSource:
    """RandomAccessDataSource: raw .mp4 entries → (lips, label), ALL on host.

    The reference's online layout for comparison against
    :class:`FullFrameClipSource` + device crop: decode, detect, AND
    crop/resize/pad per frame in host cv2
    (visual_preprocessing.py:111-162), shipping only the 44×44 crops.
    Used by experiments/device_crop_bench.py and the video pipeline's
    ``dataset.host_crop_streaming`` knob.
    """

    entries: Sequence[ClipEntry]
    class_to_idx: Dict[str, int]
    backend: str = "auto"

    @property
    def _ex(self):
        # lazy, per-process — see FullFrameClipSource._ex (spawn pickling)
        ex = getattr(self, "_extractor", None)
        if ex is None:
            from multimodal_lipread_tpu.data.lip_extraction import LipRegionExtractor

            ex = self._extractor = LipRegionExtractor(backend=self.backend)
        return ex

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if k != "_extractor"}

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[int(idx)]
        return {
            "lip_regions": self._ex.extract_lip_sequence(e.path),
            "label": np.int32(self.class_to_idx[e.word]),
        }


class StreamingDataset:
    """Per-epoch streaming view of a random-access source, for Trainer.fit.

    This is the full-GLips-scale path: instead of materializing every clip as
    one giant host array (ArrayDataset), each epoch is read through a
    ``grain.DataLoader`` with host worker processes and per-host sharding —
    the TPU-native replacement for the reference's
    ``DataLoader(num_workers=4)`` (reference: audio/train.py:112-114).

    - ``input_keys`` orders the record-dict fields into the Trainer's model
      inputs tuple; ``label_key`` names the integer label field.
    - ``shard_index``/``shard_count`` default to this process's
      ``jax.process_index()``/``jax.process_count()``, so under multi-host
      ``jax.distributed`` each host automatically reads a disjoint 1/hosts
      slice of every epoch.
    - epochs reshuffle deterministically: epoch ``e`` uses sampler seed
      ``seed + e``.
    """

    def __init__(
        self,
        source,
        input_keys: Sequence[str],
        label_key: str = "label",
        seed: int = 0,
        worker_count: int = 0,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
    ):
        import jax

        self.source = source
        self.input_keys = tuple(input_keys)
        self.label_key = label_key
        self.seed = seed
        self.worker_count = worker_count
        self.shard_index = jax.process_index() if shard_index is None else shard_index
        self.shard_count = jax.process_count() if shard_count is None else shard_count

    def __len__(self) -> int:
        """Examples THIS shard sees per epoch (ceil split like grain's
        drop_remainder=False sharding)."""
        n, c, i = len(self.source), self.shard_count, self.shard_index
        return (n - i + c - 1) // c

    def global_batches(self, per_host: int) -> int:
        """Per-epoch step count EVERY host must execute (largest shard's
        batch count). Hosts whose shard is smaller pad with weight-0
        batches so all processes run the same number of collective steps."""
        largest_shard = -(-len(self.source) // self.shard_count)
        return max(1, -(-largest_shard // max(1, per_host)))

    def example_inputs(self, n: int) -> tuple:
        """First record tiled n times — shape/dtype template for init."""
        rec = self.source[0]
        return tuple(
            np.broadcast_to(rec[k][None], (n,) + np.asarray(rec[k]).shape).copy()
            for k in self.input_keys
        )

    def epoch_batches(self, epoch: int, shuffle: bool, batch_size: int):
        """Yield (inputs_tuple, labels) numpy batches for one epoch."""
        loader = make_loader(
            self.source,
            batch_size=batch_size,
            shuffle=shuffle,
            seed=self.seed + epoch,
            num_epochs=1,
            worker_count=self.worker_count,
            shard_index=self.shard_index,
            shard_count=self.shard_count,
        )
        for batch in loader:
            yield (
                tuple(np.asarray(batch[k]) for k in self.input_keys),
                np.asarray(batch[self.label_key]).astype(np.int32),
            )


def make_loader(
    source,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """Grain DataLoader over a random-access source.

    ``shard_index``/``shard_count`` give per-host sharding for multi-host
    training (each host loads 1/shard_count of every epoch); ``worker_count``
    spawns host loader processes like the reference's num_workers=4.
    """
    import grain.python as gp

    sampler = gp.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=False
        ),
    )
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=worker_count,
    )


class NativeStreamingDataset:
    """Trainer-compatible streaming dataset on the native C++ prefetcher.

    Same duck-typed interface as :class:`StreamingDataset`
    (``__len__`` / ``example_inputs`` / ``epoch_batches``), but the host
    loading runs on ``native/mlt_io.cpp``'s thread pool + bounded in-order
    ring instead of Grain worker processes: no multiprocessing spawn (works
    under any launcher), no per-record Python, disk reads overlap both
    compute and the host→device copies. Single modality per dataset: raw
    uint8 lip ``.npy`` records or PCM16 WAV → f32 waveforms.

    Per-epoch order is ``default_rng(seed + epoch).permutation`` sharded
    ``[shard_index::shard_count]`` — the same per-host splitting contract as
    the Grain path, so multi-host jobs read disjoint epoch slices.
    """

    def __init__(
        self,
        entries: Sequence[ClipEntry],
        class_to_idx: Dict[str, int],
        kind: str,  # 'npy_u8' (lips) or 'wav'
        record_shape: Sequence[int],
        sample_rate: int = 16000,
        seed: int = 0,
        n_threads: Optional[int] = None,
        capacity: int = 256,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
        wire_dtype: Optional[str] = None,
    ):
        import jax

        from multimodal_lipread_tpu.data.native_io import DEFAULT_THREADS, NativePrefetcher

        self.entries = list(entries)
        if kind == "wav":
            bad = [e.path for e in self.entries if not e.path.lower().endswith(".wav")]
            if bad:
                raise ValueError(
                    f"loader_backend 'native' decodes PCM16 WAV only; found "
                    f"{len(bad)} non-WAV clips (e.g. {bad[0]}) — transcode "
                    "them or use the grain backend (ffmpeg decode path)"
                )
        self.labels = np.asarray(
            [class_to_idx[e.word] for e in self.entries], np.int32
        )
        self.seed = seed
        # wire_dtype='int16' (wav only): ship waveforms host→device as
        # int16 — EXACT for PCM16 sources (decode is a plain int16→f32
        # cast, data/audio_io.py:44) at HALF the H2D bytes; the Trainer
        # casts back to f32 on device, like the uint8-lips contract.
        # scale500 measured the f32 wave stream H2D-bound on the tunneled
        # chip (docs/PERFORMANCE.md "500-class streaming").
        if wire_dtype not in (None, "int16"):
            raise ValueError(f"unsupported wire_dtype {wire_dtype!r}")
        if wire_dtype == "int16" and kind != "wav":
            raise ValueError("wire_dtype='int16' only applies to kind='wav'")
        self.wire_dtype = wire_dtype
        self.shard_index = jax.process_index() if shard_index is None else shard_index
        self.shard_count = jax.process_count() if shard_count is None else shard_count
        self._prefetcher = NativePrefetcher(
            [e.path for e in self.entries], kind, record_shape,
            sample_rate=sample_rate, capacity=capacity,
            n_threads=n_threads or DEFAULT_THREADS,
        )

    def __len__(self) -> int:
        n, c, i = len(self.entries), self.shard_count, self.shard_index
        return (n - i + c - 1) // c

    def global_batches(self, per_host: int) -> int:
        """Same contract as StreamingDataset.global_batches."""
        largest_shard = -(-len(self.entries) // self.shard_count)
        return max(1, -(-largest_shard // max(1, per_host)))

    def example_inputs(self, n: int) -> tuple:
        dtype = np.int16 if self.wire_dtype == "int16" else self._prefetcher.dtype
        rec = np.zeros(self._prefetcher.record_shape, dtype)
        return (np.broadcast_to(rec[None], (n,) + rec.shape).copy(),)

    def _epoch_order(self, epoch: int, shuffle: bool) -> np.ndarray:
        n = len(self.entries)
        order = (
            np.random.default_rng(self.seed + epoch).permutation(n)
            if shuffle else np.arange(n)
        )
        return order[self.shard_index::self.shard_count]

    def epoch_batches(self, epoch: int, shuffle: bool, batch_size: int):
        order = self._epoch_order(epoch, shuffle).astype(np.int64)
        self._prefetcher.start_epoch(order)
        consumed = 0
        while True:
            batch = self._prefetcher.next_batch(batch_size)
            if batch is None:
                break
            err = self._prefetcher.first_error
            if err >= 0:
                # zero-filled records would train silently on garbage —
                # surface the bad file like the reference's loaders do
                raise RuntimeError(
                    f"native prefetcher failed to read {self.entries[err].path} "
                    "(corrupt file, wrong shape, or unsupported format)"
                )
            labels = self.labels[order[consumed:consumed + len(batch)]]
            consumed += len(batch)
            if self.wire_dtype == "int16":
                # PCM16 values are integral in f32: the cast is exact
                batch = batch.astype(np.int16)
            yield (batch,), labels

    def close(self) -> None:
        self._prefetcher.close()
