"""Parallel m4a→WAV transcoding for the native streaming loader.

Real GLips ships ``.m4a`` audio (reference: audio/data_utils/dataset.py:29-37
pydub/ffmpeg decode, audio/utils/audio_processor.py:26-29). The C++ streaming
prefetcher (native/mlt_io.cpp) reads PCM16 WAV only — re-decoding AAC with a
per-clip ffmpeg subprocess EVERY epoch (as pydub effectively does) costs
orders of magnitude more than a one-time transcode plus ~1 ms native WAV
reads. This tool builds the WAV mirror tree once:

    <dst>/<word>/<split>/<clip>.wav   for every audio clip under <src>

using ``ffmpeg -acodec pcm_s16le -ac 1 -ar 16000`` — the byte-exact decode
pipeline of the grain path (data/audio_io.py:_load_via_ffmpeg), so switching
``loader_backend: native`` changes NOTHING numerically (regression-tested in
tests/test_transcode.py). Transcodes are idempotent (existing up-to-date
WAVs are skipped) and atomic (tmp + rename), so interrupted runs resume.

CLI: ``mlt-transcode --src <GLips root or lipread_files> --dst <mirror>``
The audio pipeline also calls :func:`ensure_wav_mirror` automatically when
``dataset.loader_backend: native`` meets non-WAV clips.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import subprocess
from typing import List, Sequence, Tuple

from multimodal_lipread_tpu.data.audio_io import SAMPLE_RATE, _ffmpeg_available

AUDIO_SRC_EXTS = (".m4a", ".mp4", ".aac", ".ogg", ".flac", ".mp3")


def _transcode_one(src: str, dst: str, sample_rate: int) -> bool:
    """ffmpeg decode → mono s16 PCM WAV at ``sample_rate``; atomic write."""
    import threading

    os.makedirs(os.path.dirname(dst), exist_ok=True)
    # pid+tid: unique per worker THREAD too — pool threads racing one dst
    # (same-stem sources) must never interleave writes or reap each other's
    # in-flight tmp file. .wav suffix so ffmpeg picks the muxer.
    tmp = f"{dst}.tmp.{os.getpid()}.{threading.get_ident()}.wav"
    cmd = [
        "ffmpeg", "-v", "error", "-y", "-i", src,
        "-acodec", "pcm_s16le", "-ac", "1", "-ar", str(sample_rate),
        tmp,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True)
        if proc.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, dst)
        return True
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _is_current(src: str, dst: str) -> bool:
    try:
        return os.path.getsize(dst) > 44 and os.path.getmtime(dst) >= os.path.getmtime(src)
    except OSError:
        return False


def transcode_paths(
    pairs: Sequence[Tuple[str, str]],
    sample_rate: int = SAMPLE_RATE,
    workers: int = 8,
) -> Tuple[int, int, List[str]]:
    """Transcode (src, dst) pairs in parallel; returns (done, skipped, failed).

    ffmpeg is CPU-bound in its own process, so a thread pool suffices to
    keep ``workers`` decoders busy while Python stays single-threaded.
    """
    # dedupe by dst (same-stem sources, e.g. foo.m4a + foo.flac → one
    # foo.wav): first source in input order wins, deterministically —
    # two concurrent transcodes of one dst would race the final rename
    seen = set()
    unique = []
    for s, d in pairs:
        if d not in seen:
            seen.add(d)
            unique.append((s, d))
    todo = [(s, d) for s, d in unique if not _is_current(s, d)]
    skipped = len(pairs) - len(todo)
    if todo and not _ffmpeg_available():
        raise RuntimeError(
            f"{len(todo)} clips need transcoding but ffmpeg is not installed"
        )
    failed: List[str] = []
    if todo:
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            results = ex.map(
                lambda p: (p[0], _transcode_one(p[0], p[1], sample_rate)), todo
            )
            failed = [src for src, ok in results if not ok]
    return len(todo) - len(failed), skipped, failed


def ensure_wav_mirror(
    entries: Sequence,  # ClipEntry-like: .path / .word / .split attributes
    cache_root: str,
    sample_rate: int = SAMPLE_RATE,
    workers: int = 8,
) -> List:
    """Return entries rewritten onto a WAV mirror tree, transcoding as needed.

    Entries already pointing at ``.wav`` files pass through unchanged; the
    rest are mapped to ``<cache_root>/<word>/<split>/<stem>.wav`` and
    transcoded if missing/stale. Raises on any failed clip (zero-filled
    audio would silently train on garbage).
    """
    import dataclasses

    out, pairs = [], []
    for e in entries:
        if e.path.lower().endswith(".wav"):
            out.append(e)
            continue
        stem = os.path.splitext(os.path.basename(e.path))[0]
        dst = os.path.join(cache_root, e.word, e.split, stem + ".wav")
        pairs.append((e.path, dst))
        out.append(dataclasses.replace(e, path=dst))
    done, skipped, failed = transcode_paths(pairs, sample_rate, workers)
    if failed:
        raise RuntimeError(
            f"transcoding failed for {len(failed)} clips (e.g. {failed[0]})"
        )
    return out


def main(argv: Sequence[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", required=True, help="GLips root (or lipread_files dir)")
    ap.add_argument("--dst", required=True, help="output WAV mirror root")
    ap.add_argument("--sample-rate", type=int, default=SAMPLE_RATE)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args(argv)

    pairs = []
    for dirpath, _dirs, files in os.walk(args.src):
        for fname in sorted(files):
            if os.path.splitext(fname)[1].lower() in AUDIO_SRC_EXTS:
                src = os.path.join(dirpath, fname)
                rel = os.path.relpath(src, args.src)
                dst = os.path.join(args.dst, os.path.splitext(rel)[0] + ".wav")
                pairs.append((src, dst))
    done, skipped, failed = transcode_paths(pairs, args.sample_rate, args.workers)
    print(f"transcoded {done}, up-to-date {skipped}, failed {len(failed)}")
    for f in failed[:10]:
        print(f"  FAILED {f}")
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
