"""Native host-IO library tests: parity with the pure-Python loaders."""

import os

import numpy as np
import pytest

from multimodal_lipread_tpu.data.audio_io import load_waveform, write_wav
from multimodal_lipread_tpu.data.native_io import get_lib, load_npy_u8_batch, load_wav_batch


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_native_wav_matches_python(lib, tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        wave = (rng.standard_normal(15000 + 2000 * i) * 5000).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, wave)
        paths.append(p)

    native = load_wav_batch(paths, target_samples=20000)
    assert native is not None and native.shape == (4, 20000)
    python = np.stack([load_waveform(p) for p in paths])
    np.testing.assert_allclose(native, python, atol=0.51)  # int16 write rounding only


def test_native_wav_pad_and_truncate(lib, tmp_path):
    long_wave = np.arange(30000, dtype=np.float32) % 1000
    p = str(tmp_path / "long.wav")
    write_wav(p, long_wave)
    out = load_wav_batch([p], target_samples=20000)
    assert out.shape == (1, 20000)

    short = np.ones(100, np.float32) * 100
    p2 = str(tmp_path / "short.wav")
    write_wav(p2, short)
    out2 = load_wav_batch([p2], target_samples=20000)
    assert out2[0, 100:].sum() == 0  # zero-padded tail


def test_native_wav_bad_file_returns_none(lib, tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav at all")
    assert load_wav_batch([p]) is None


def test_native_npy_matches_numpy(lib, tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    ref = []
    for i in range(3):
        arr = rng.integers(0, 256, size=(29, 44, 44, 3), dtype=np.uint8)
        p = str(tmp_path / f"l{i}.npy")
        np.save(p, arr)
        paths.append(p)
        ref.append(arr.astype(np.float32) / 255.0)

    native = load_npy_u8_batch(paths, (29, 44, 44, 3))
    assert native is not None
    np.testing.assert_allclose(native, np.stack(ref), rtol=1e-6)


def test_native_npy_wrong_dtype_returns_none(lib, tmp_path):
    p = str(tmp_path / "f32.npy")
    np.save(p, np.zeros((2, 2), np.float32))
    assert load_npy_u8_batch([p], (2, 2)) is None


def test_native_wav_rejects_wrong_sample_rate(lib, tmp_path):
    """A 44.1 kHz WAV must be rejected (caller resamples via ffmpeg path)."""
    p = str(tmp_path / "hi_rate.wav")
    write_wav(p, np.ones(1000, np.float32) * 100, sample_rate=44100)
    assert load_wav_batch([p], sample_rate=16000) is None
    # and accepted when the expected rate matches
    out = load_wav_batch([p], sample_rate=44100)
    assert out is not None and out.shape == (1, 20000)


def test_native_npy_rejects_wrong_shape(lib, tmp_path):
    """A differently-shaped array with enough bytes must be rejected, not
    silently reinterpreted."""
    p = str(tmp_path / "wrong_shape.npy")
    np.save(p, np.zeros((29, 48, 48, 3), np.uint8))  # bigger than expected
    assert load_npy_u8_batch([p], (29, 44, 44, 3)) is None


def test_native_npy_truncated_file_safe(lib, tmp_path):
    p = str(tmp_path / "trunc.npy")
    with open(p, "wb") as f:
        f.write(b"\x93NUMPY\x02\x00\x10\x00")  # 10-byte v2 header stub
    assert load_npy_u8_batch([p], (2, 2)) is None


# ---------------------------------------------------------------- prefetcher


def _write_npy_records(tmp_path, n, shape=(4, 6)):
    paths = []
    arrays = []
    for i in range(n):
        a = (np.arange(int(np.prod(shape)), dtype=np.uint8) + i).reshape(shape)
        p = str(tmp_path / f"rec{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_prefetcher_npy_in_order(lib, tmp_path):
    from multimodal_lipread_tpu.data.native_io import NativePrefetcher

    paths, arrays = _write_npy_records(tmp_path, 13)
    pf = NativePrefetcher(paths, "npy_u8", (4, 6), capacity=4, n_threads=3)
    try:
        order = np.array([5, 0, 12, 7, 1, 9, 3, 11, 2, 8, 10, 4, 6], np.int64)
        pf.start_epoch(order)
        got = []
        while True:
            b = pf.next_batch(4)
            if b is None:
                break
            got.append(b)
        out = np.concatenate(got)
        assert out.shape == (13, 4, 6)
        for k, idx in enumerate(order):
            np.testing.assert_array_equal(out[k], arrays[idx])
        assert pf.first_error == -1
        # a second epoch on the same handle works (ring resets)
        pf.start_epoch(np.arange(13, dtype=np.int64))
        out2 = pf.next_batch(13)
        assert out2 is not None and len(out2) == 13
        np.testing.assert_array_equal(out2[3], arrays[3])
    finally:
        pf.close()


def test_prefetcher_wav_matches_batch_loader(lib, tmp_path):
    from multimodal_lipread_tpu.data.native_io import NativePrefetcher

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, rng.standard_normal(3000).astype(np.float32) * 1000)
        paths.append(p)
    expected = load_wav_batch(paths, target_samples=20000, sample_rate=16000)
    pf = NativePrefetcher(paths, "wav", (20000,), capacity=3, n_threads=2)
    try:
        pf.start_epoch(np.arange(5, dtype=np.int64))
        out = pf.next_batch(5)
        np.testing.assert_allclose(out, expected)
    finally:
        pf.close()


def test_prefetcher_bad_file_zero_filled(lib, tmp_path):
    from multimodal_lipread_tpu.data.native_io import NativePrefetcher

    paths, arrays = _write_npy_records(tmp_path, 3)
    (tmp_path / "rec1.npy").write_bytes(b"garbage")
    pf = NativePrefetcher(paths, "npy_u8", (4, 6), capacity=2, n_threads=2)
    try:
        pf.start_epoch(np.arange(3, dtype=np.int64))
        out = pf.next_batch(3)
        np.testing.assert_array_equal(out[0], arrays[0])
        assert np.all(out[1] == 0)
        np.testing.assert_array_equal(out[2], arrays[2])
        assert pf.first_error == 1
    finally:
        pf.close()


def test_native_streaming_dataset_trains(lib, glips_root, tmp_path):
    """NativeStreamingDataset drives a real Trainer.fit on the synthetic
    lip tree — the native in-process replacement for grain workers."""
    from flax import linen as nn

    from multimodal_lipread_tpu.data.glips import scan_lip_regions, lip_regions_root
    from multimodal_lipread_tpu.data.grain_loader import NativeStreamingDataset
    from multimodal_lipread_tpu.train.trainer import Trainer, TrainerConfig

    index = scan_lip_regions(lip_regions_root(glips_root))

    class TinyVideo(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            # mean-pool to (B, 3): the synthetic classes separate by
            # brightness, and a low-dim head keeps Adam's per-weight step
            # from swamping the logits on a 12-clip dataset
            x = (x.mean(axis=(1, 2, 3)) - 0.5) * 20.0
            x = nn.relu(nn.Dense(16)(x))
            return nn.Dense(4)(x)

    def make_ds(split):
        return NativeStreamingDataset(
            index.by_split(split), index.class_to_idx,
            kind="npy_u8", record_shape=(29, 44, 44, 3),
            capacity=8, n_threads=2,
        )

    train_ds, val_ds = make_ds("train"), make_ds("val")
    try:
        trainer = Trainer(
            TinyVideo(),
            TrainerConfig(
                model_name="nativestream", num_classes=4, batch_size=8,
                epochs=12, learning_rate=1e-2, weight_decay=0.0,
                metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
                test_every_epoch=False, half_precision=False,
            ),
        )
        result = trainer.fit(train_ds, val_ds, None, progress=None)
        assert len(result["history"]) == 12
        assert result["history"][-1]["train_acc"] > 40.0  # learns above chance
    finally:
        train_ds.close()
        val_ds.close()


def test_native_streaming_dataset_sharding(lib, glips_root):
    from multimodal_lipread_tpu.data.glips import scan_lip_regions, lip_regions_root
    from multimodal_lipread_tpu.data.grain_loader import NativeStreamingDataset

    index = scan_lip_regions(lip_regions_root(glips_root))
    entries = index.by_split("train")
    shards = []
    for i in range(2):
        ds = NativeStreamingDataset(
            entries, index.class_to_idx, kind="npy_u8",
            record_shape=(29, 44, 44, 3), shard_index=i, shard_count=2,
            capacity=4, n_threads=1,
        )
        try:
            order = ds._epoch_order(epoch=1, shuffle=True)
            shards.append(set(int(x) for x in order))
            assert len(ds) == len(order)
        finally:
            ds.close()
    # the two shards partition the epoch exactly
    assert shards[0] | shards[1] == set(range(len(entries)))
    assert not (shards[0] & shards[1])
