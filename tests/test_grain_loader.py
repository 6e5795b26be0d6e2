"""Grain streaming-loader tests on the synthetic GLips tree."""

import numpy as np

from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips, scan_lip_regions, lip_regions_root
from multimodal_lipread_tpu.data.grain_loader import AudioClipSource, LipClipSource, make_loader


def test_audio_grain_loader(glips_root):
    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    src = AudioClipSource(index.by_split("train"), index.class_to_idx)
    loader = make_loader(src, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4  # 16 train clips / 4
    b = batches[0]
    assert b["waveform"].shape == (4, 20000)
    assert b["label"].shape == (4,)
    labels = np.concatenate([b["label"] for b in batches])
    assert set(labels.tolist()) == {0, 1, 2, 3}


def test_grain_loader_sharding(glips_root):
    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    src = AudioClipSource(index.by_split("train"), index.class_to_idx)
    seen = []
    for shard in range(2):
        loader = make_loader(src, batch_size=4, shuffle=False, seed=0,
                             shard_index=shard, shard_count=2)
        for b in loader:
            seen.extend(b["label"].tolist())
    assert len(seen) == 16  # two shards cover the epoch exactly once


def test_lip_grain_loader(glips_root):
    import os

    lip_root = os.path.join(lip_regions_root(glips_root), "lipread_files")
    index = scan_lip_regions(lip_root)
    src = LipClipSource(index.by_split("val"), index.class_to_idx)
    loader = make_loader(src, batch_size=8, shuffle=False)
    b = next(iter(loader))
    assert b["lip_regions"].shape == (8, 29, 44, 44, 3)
    assert b["lip_regions"].dtype == np.uint8  # device-side normalize
