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
        return {
            "lip_regions": np.load(e.path).astype(np.float32) / 255.0,
            "label": np.int32(self.class_to_idx[e.word]),
        }


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
