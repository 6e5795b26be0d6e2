"""mlt-transcode: WAV mirror for the native streaming loader.

The image has no ffmpeg/AAC codec (zero egress), so these tests drive the
full transcode plumbing — tree walk, idempotence, atomicity, entry
rewriting, failure surfacing, and the audio pipeline's automatic mirror —
through a fake ``ffmpeg`` executable that performs a python WAV→WAV decode.
On a real deployment the same code invokes real ffmpeg with exactly the
decode flags of the grain path (data/audio_io.py:_load_via_ffmpeg), so the
two backends stay numerically identical by construction.
"""

import os
import stat
import sys

import numpy as np
import pytest

from multimodal_lipread_tpu.data.audio_io import write_wav
from multimodal_lipread_tpu.data.glips import ClipEntry
from multimodal_lipread_tpu.tools import transcode as tc

FAKE_FFMPEG = f"""#!{sys.executable}
# fake ffmpeg: ``ffmpeg -v error -y -i SRC -acodec pcm_s16le -ac 1 -ar R DST``
# decodes a WAV-payload source (any extension) and rewrites it as PCM16 WAV.
import sys, wave, shutil
args = sys.argv[1:]
src = args[args.index("-i") + 1]
dst = args[-1]
if "FAIL" in src:
    sys.stderr.write("fake decode error\\n")
    sys.exit(1)
shutil.copyfile(src, dst)
"""


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(FAKE_FFMPEG)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return str(exe)


def _fake_m4a(path, seed):
    """A WAV payload under an .m4a name — decodable by the fake ffmpeg."""
    rng = np.random.default_rng(seed)
    wave = (rng.normal(0, 3000, 20000)).astype(np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_wav(path, wave)
    # expectation carries the PCM16 quantization write_wav applies
    return np.clip(wave, -32768, 32767).astype("<i2").astype(np.float32)


def test_transcode_paths_idempotent_and_atomic(tmp_path, fake_ffmpeg):
    src = tmp_path / "src" / "clip.m4a"
    dst = tmp_path / "dst" / "clip.wav"
    _fake_m4a(str(src), 0)

    done, skipped, failed = tc.transcode_paths([(str(src), str(dst))])
    assert (done, skipped, failed) == (1, 0, [])
    assert os.path.exists(dst)
    assert not [p for p in os.listdir(dst.parent) if ".tmp." in p]

    # second run: up-to-date → skipped
    done, skipped, failed = tc.transcode_paths([(str(src), str(dst))])
    assert (done, skipped, failed) == (0, 1, [])

    # stale mirror (source newer) → re-transcoded
    os.utime(src, None)
    os.utime(dst, (0, 0))
    done, skipped, failed = tc.transcode_paths([(str(src), str(dst))])
    assert (done, skipped) == (1, 0)


def test_transcode_failure_is_reported(tmp_path, fake_ffmpeg):
    src = tmp_path / "src" / "FAIL.m4a"
    _fake_m4a(str(src), 0)
    done, skipped, failed = tc.transcode_paths(
        [(str(src), str(tmp_path / "dst" / "FAIL.wav"))]
    )
    assert done == 0 and failed == [str(src)]
    assert not os.path.exists(tmp_path / "dst" / "FAIL.wav")


def test_ensure_wav_mirror_rewrites_entries(tmp_path, fake_ffmpeg):
    wavs = {}
    entries = []
    for i, (word, split) in enumerate(
        [("wort", "train"), ("wort", "val"), ("zwei", "train")]
    ):
        p = tmp_path / "glips" / word / split / f"{word}_{i:04d}-0001.m4a"
        wavs[(word, split)] = _fake_m4a(str(p), i)
        entries.append(ClipEntry(word, split, f"{i:04d}-0001", str(p)))
    # one already-WAV entry passes through untouched
    wav_entry_path = tmp_path / "glips" / "drei" / "train" / "drei_0009-0001.wav"
    _fake_m4a(str(wav_entry_path), 9)
    entries.append(ClipEntry("drei", "train", "0009-0001", str(wav_entry_path)))

    out = tc.ensure_wav_mirror(entries, str(tmp_path / "mirror"))
    assert len(out) == 4
    assert out[3].path == str(wav_entry_path)
    for e in out[:3]:
        assert e.path.endswith(".wav") and str(tmp_path / "mirror") in e.path
        assert os.path.exists(e.path)
    # alignment metadata intact
    assert [e.key for e in out] == [e.key for e in entries]


@pytest.mark.slow
def test_native_streaming_over_m4a_tree(tmp_path, fake_ffmpeg):
    """loader_backend 'native' end-to-end over a synthetic .m4a GLips tree:
    the pipeline transcodes into the WAV mirror automatically and the C++
    prefetcher streams records identical to the grain/ffmpeg decode."""
    pytest.importorskip("ctypes")
    from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips
    from multimodal_lipread_tpu.data.grain_loader import NativeStreamingDataset
    from multimodal_lipread_tpu.data.native_io import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")

    words = ["wort", "zwei", "drei", "vier"]
    expect = {}
    for w in words:
        for split, n in (("train", 3), ("val", 1), ("test", 1)):
            for i in range(n):
                sid = f"{i:04d}-0001"
                p = tmp_path / "glips" / "lipread_files" / w / split / f"{w}_{sid}.m4a"
                expect[(w, sid, split)] = _fake_m4a(str(p), hash((w, split, i)) % 1000)

    index = scan_glips(str(tmp_path / "glips"), exts=AUDIO_EXTS)
    entries = index.by_split("train")
    assert len(entries) == 12
    mirrored = tc.ensure_wav_mirror(entries, str(tmp_path / "glips" / "wav_cache"))
    ds = NativeStreamingDataset(
        mirrored, index.class_to_idx, kind="wav", record_shape=(20000,),
        seed=0, shard_index=0, shard_count=1,
    )
    seen = 0
    for (batch,), labels in ds.epoch_batches(0, shuffle=True, batch_size=4):
        for row, lab in zip(batch, labels):
            seen += 1
        assert batch.shape[1:] == (20000,)
    assert seen == 12
    # exact per-clip waveform parity with the source payloads
    order = ds._epoch_order(0, shuffle=False)
    ds2 = iter(ds.epoch_batches(0, shuffle=False, batch_size=12))
    (batch,), labels = next(ds2)
    for k, idx in enumerate(order):
        e = mirrored[idx]
        np.testing.assert_array_equal(batch[k], expect[e.key])
    ds.close()
