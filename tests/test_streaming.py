"""Streaming (grain-backed) training-path tests on the 8-device CPU mesh."""

import hashlib
import os

import numpy as np
import pytest

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips
from multimodal_lipread_tpu.data.grain_loader import AudioClipSource, StreamingDataset
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def test_streaming_shards_cover_epoch_exactly_once(glips_root):
    """worker_count>0 + shard_count=2: the two shards' batches partition the
    epoch — every record appears exactly once across both shards."""
    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    entries = index.by_split("train")
    src = AudioClipSource(entries, index.class_to_idx)

    all_hashes = set()
    for e in entries:
        from multimodal_lipread_tpu.data.audio_io import load_waveform

        all_hashes.add(hashlib.md5(load_waveform(e.path).tobytes()).hexdigest())
    assert len(all_hashes) == len(entries)  # synthetic clips are distinct

    seen = []
    lens = []
    for shard in range(2):
        ds = StreamingDataset(
            src, input_keys=("waveform",), seed=0, worker_count=1,
            shard_index=shard, shard_count=2,
        )
        lens.append(len(ds))
        for (waves,), labels in ds.epoch_batches(epoch=0, shuffle=True, batch_size=4):
            for row in waves:
                seen.append(hashlib.md5(np.ascontiguousarray(row).tobytes()).hexdigest())
    assert sum(lens) == len(entries)
    assert len(seen) == len(entries)
    assert set(seen) == all_hashes


class _DictSource:
    """Minimal random-access source of separable records for Trainer tests."""

    def __init__(self, n=64, num_classes=4, seed=0):
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, num_classes, size=n).astype(np.int32)
        self.x = rng.standard_normal((n, 80, 32)).astype(np.float32) * 0.1
        for i, l in enumerate(self.labels):
            self.x[i, l * 10 : l * 10 + 10, :] += 2.0

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx):
        i = int(idx)
        return {"x": self.x[i], "label": self.labels[i]}


def _tiny_model():
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x.reshape(x.shape[0], -1))

    return Tiny()


def test_fit_streaming_learns(tmp_path):
    """Trainer.fit over a StreamingDataset: same pad-to-static + weight-0
    contract, epochs reshuffle, logs/checkpoints written, model learns."""
    train_src, val_src = _DictSource(96, seed=0), _DictSource(32, seed=1)
    train_ds = StreamingDataset(train_src, input_keys=("x",), seed=0)
    val_ds = StreamingDataset(val_src, input_keys=("x",), seed=0)

    trainer = Trainer(
        _tiny_model(),
        TrainerConfig(
            model_name="tinystream", num_classes=4, batch_size=16, epochs=5,
            learning_rate=1e-2, weight_decay=0.0, test_every_epoch=False,
            metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
        ),
    )
    result = trainer.fit(train_ds, val_ds, progress=None)
    assert result["history"][-1]["train_acc"] > 80.0
    assert result["best_val_acc"] > 80.0
    assert os.path.exists(tmp_path / "c" / "tinystream_best.msgpack")


def test_fit_streaming_matches_materialized(tmp_path):
    """A short streaming run and a materialized run over identical data both
    converge (not bit-identical — batch order differs — but both learn)."""
    src = _DictSource(64, seed=0)
    stream = StreamingDataset(src, input_keys=("x",), seed=0)
    arrays = ArrayDataset(inputs=(src.x,), labels=src.labels)

    def run(ds, tag):
        t = Trainer(
            _tiny_model(),
            TrainerConfig(
                model_name=tag, num_classes=4, batch_size=16, epochs=4,
                learning_rate=1e-2, test_every_epoch=False,
                metrics_dir=str(tmp_path / tag / "m"),
                checkpoints_dir=str(tmp_path / tag / "c"),
            ),
        )
        return t.fit(ds, ds, progress=None)["history"][-1]["train_acc"]

    assert run(stream, "st") > 75.0
    assert run(arrays, "ar") > 75.0


def test_audio_pipeline_streaming_e2e(glips_root, tmp_path):
    """dataset.streaming: true — raw waveforms stream through grain, the
    fused log-mel runs on device inside the jitted step."""
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4,
                        "input_size": 117, "streaming": True, "num_workers": 0},
            "model": {"name": "resnet"},
            "training": {"batch_size": 16, "epochs": 2, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "audio_stream")},
        }
    )
    result = audio_main(cfg)
    assert "final_test_acc" in result
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["train_loss"])
    assert os.path.exists(tmp_path / "audio_stream" / "metrics" / "resnet_training_log.csv")


def test_audio_pipeline_native_backend_e2e(glips_root, tmp_path):
    """dataset.loader_backend: native — the C++ prefetcher feeds the same
    streaming path (WAV decode on the native thread pool, log-mel on
    device)."""
    pytest.importorskip("ctypes")
    from multimodal_lipread_tpu.data.native_io import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4,
                        "input_size": 117, "streaming": True,
                        "loader_backend": "native", "num_workers": 2},
            "model": {"name": "resnet"},
            "training": {"batch_size": 16, "epochs": 2, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "audio_native")},
        }
    )
    result = audio_main(cfg)
    assert "final_test_acc" in result
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["train_loss"])


def test_stream_batches_align_across_shards(tmp_path):
    """Ceil-split shards can differ by one record; every host must still
    execute the SAME number of (collective) steps per epoch — short shards
    pad with all-weight-0 batches."""
    src = _DictSource(33, seed=0)  # 2 shards: 17 and 16 records
    counts = []
    for shard in range(2):
        ds = StreamingDataset(
            src, input_keys=("x",), seed=0, shard_index=shard, shard_count=2
        )
        trainer = Trainer(
            _tiny_model(),
            TrainerConfig(
                model_name=f"align{shard}", num_classes=4, batch_size=8,
                epochs=1, test_every_epoch=False,
                metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
            ),
        )
        trainer.ensure_initialized(ds)
        batches = list(trainer._stream_batches(ds, epoch=0, shuffle=True))
        counts.append(len(batches))
        # padding batches are all-weight-0
        if shard == 1:
            assert float(np.asarray(batches[-1][2]).sum()) == 0.0
    # shard 0: ceil(17/8)=3 batches; shard 1: ceil(16/8)=2 real + 1 pad
    assert counts == [3, 3]


def test_native_int16_wire_matches_f32(glips_root, tmp_path):
    """dataset.wire_dtype: int16 must produce the IDENTICAL trajectory as
    the f32 wire — PCM16 values are integral, so the int16 round trip and
    the on-device cast are exact."""
    from multimodal_lipread_tpu.data.native_io import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    def run(tag, wire):
        ds = {"root_dir": glips_root, "num_classes": 4, "input_size": 117,
              "streaming": True, "loader_backend": "native"}
        if wire:
            ds["wire_dtype"] = wire
        cfg = Config.from_dict(
            {
                "dataset": ds,
                "model": {"name": "resnet"},
                "training": {"batch_size": 16, "epochs": 2,
                             "learning_rate": 1e-3, "weight_decay": 1e-4,
                             "seed": 0},
                "output": {"base_dir": str(tmp_path / tag)},
            }
        )
        return audio_main(cfg)["history"]

    h32 = run("f32", None)
    h16 = run("i16", "int16")
    for a, b in zip(h32, h16):
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=1e-6)
        assert b["val_acc"] == a["val_acc"]
