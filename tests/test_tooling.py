"""Tests for preprocessing tooling: lip extraction, frame extraction,
cue generation machinery, sanitizer, plotters."""

import json
import os

import numpy as np
import pytest

from multimodal_lipread_tpu.data.lip_extraction import (
    LipRegionExtractor,
    process_dataset,
    resize_and_pad,
)
from multimodal_lipread_tpu.tools.cue_generation import (
    RateLimiter,
    generate_cues_for_word,
    group_frames_by_sequence,
)
from multimodal_lipread_tpu.tools.data_clean import sanitize_descriptions, sanitize_text


def _write_test_video(path, n_frames=10, size=(96, 96)):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, 25.0, size)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), 30 + 5 * i, np.uint8)
        frame[40:70, 30:60] = 200  # bright block = fake face region
        w.write(frame)
    w.release()
    return path


def test_resize_and_pad_average():
    img = np.full((10, 30, 3), 100, np.uint8)  # wide image
    out = resize_and_pad(img, (44, 44), "average")
    assert out.shape == (44, 44, 3)
    # padding rows take the average color
    assert abs(int(out[0, 0, 0]) - 100) <= 2


def test_resize_and_pad_none_gives_blank():
    out = resize_and_pad(None)
    assert out.shape == (44, 44, 3)
    assert out.sum() == 0


def test_lip_sequence_shape(tmp_path):
    video = _write_test_video(str(tmp_path / "v" / "clip_0001-0002.mp4"), n_frames=7)
    ex = LipRegionExtractor(backend="center")
    seq = ex.extract_lip_sequence(video, num_frames=29)
    assert seq.shape == (29, 44, 44, 3)
    assert seq.dtype == np.uint8
    # short video: frames duplicated, sequence non-blank
    assert seq.sum() > 0


def test_process_dataset_mirror_tree(tmp_path):
    root = tmp_path / "GLips"
    _write_test_video(str(root / "lipread_files" / "wort" / "train" / "wort_0001-0002.mp4"))
    ok, fail = process_dataset(str(root), backend="center")
    assert (ok, fail) == (1, 0)
    mirror = tmp_path / "GLips_lip_regions" / "lipread_files" / "wort" / "train" / "wort_0001-0002.npy"
    assert mirror.exists()
    assert np.load(mirror).shape == (29, 44, 44, 3)


def test_frame_extraction(tmp_path):
    from multimodal_lipread_tpu.data.frame_extraction import extract_dataset_frames

    root = tmp_path / "GLips"
    _write_test_video(str(root / "lipread_files" / "wort" / "train" / "wort_0001-0002.mp4"))
    nv, nf = extract_dataset_frames(str(root), str(tmp_path / "cue_data"))
    assert nv == 1 and nf == 3
    files = os.listdir(tmp_path / "cue_data" / "train" / "wort")
    assert sorted(files) == [f"wort_0001-0002_frame{k}.jpg" for k in (1, 2, 3)]  # 1-based, reference naming


def test_group_frames_by_sequence(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for stem in ("abc_0001-0002", "abc_0003-0004"):
        for k in range(3):
            (d / f"{stem}_frame{k}.jpg").write_bytes(b"x")
    groups = group_frames_by_sequence(str(d))
    assert set(groups) == {"abc_0001-0002", "abc_0003-0004"}
    assert all(len(v) == 3 for v in groups.values())


def test_cue_generation_with_fake_client(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for stem in ("wort_0001-0002", "wort_0003-0004"):
        for k in range(3):
            (d / f"{stem}_frame{k}.jpg").write_bytes(b"jpg")

    calls = []

    def fake_client(prompt, paths):
        calls.append((prompt, tuple(paths)))
        return f"a calm description ({len(paths)} frames)"

    out = tmp_path / "out.json"
    sleeps = []
    results = generate_cues_for_word(
        str(d), str(out), "wort", mode="emotion", client=fake_client,
        rate_limiter=RateLimiter(min_interval=0.0), sleep=sleeps.append,
    )
    assert len(results) == 2
    data = json.loads(out.read_text())
    assert {r["sequence_id"] for r in data} == {"0001-0002", "0003-0004"}
    assert all(r["word"] == "wort" for r in data)
    assert len(calls) == 2


def test_cue_generation_retries_on_rate_limit(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for k in range(2):
        (d / f"w_0001-0002_frame{k}.jpg").write_bytes(b"jpg")
    attempts = []

    def flaky(prompt, paths):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("429 rate limit")
        return "ok"

    results = generate_cues_for_word(
        str(d), str(tmp_path / "o.json"), "w", client=flaky,
        rate_limiter=RateLimiter(0.0), sleep=lambda s: None,
    )
    assert len(results) == 1 and len(attempts) == 3


def test_sanitize_text_quoted_and_case():
    out, n = sanitize_text("aufgaben", 'The speaker says "Aufgaben" and aufgaben twice.')
    assert n == 2
    assert "aufgaben" not in out.lower()
    assert '"target word"' in out


def test_sanitize_descriptions_file(tmp_path):
    inp = tmp_path / "in.json"
    inp.write_text(json.dumps([
        {"word": "sein", "sequence_id": "0001-0002", "description": "He mouths 'sein' clearly."},
        {"word": "sein", "sequence_id": "0003-0004", "description": "No leak here."},
    ]))
    out = tmp_path / "out.json"
    modified = sanitize_descriptions(str(inp), str(out))
    assert modified == 1
    data = json.loads(out.read_text())
    assert "sein" not in data[0]["description"]


def test_plot_logs(tmp_path):
    from multimodal_lipread_tpu.utils.visualize import plot_cue_comparison, plot_logs

    metrics = tmp_path / "metrics"
    metrics.mkdir()
    (metrics / "m1_training_log.csv").write_text(
        "epoch,train_loss,train_acc,val_loss,val_acc,test_loss,test_acc\n"
        "1,1.0,50,1.1,45,1.2,44\n2,0.8,60,0.9,55,1.0,54\n"
    )
    written = plot_logs(str(metrics), str(tmp_path / "plots"))
    assert len(written) == 2
    assert all(os.path.exists(p) for p in written)

    bar = plot_cue_comparison({"dense": [54.4, 40.6], "attn": [65.0, 39.4]},
                              str(tmp_path / "plots" / "cues_compare.png"))
    assert os.path.exists(bar)


def test_plot_lip_sequence_grid(tmp_path):
    from multimodal_lipread_tpu.utils.visualize import plot_lip_sequence_grid

    seq = np.random.default_rng(0).integers(0, 255, (29, 44, 44, 3), dtype=np.uint8)
    out = plot_lip_sequence_grid(seq, str(tmp_path / "grid.png"))
    assert os.path.exists(out)


def test_cues_compare_from_logs(tmp_path):
    from multimodal_lipread_tpu.utils.visualize import (
        collect_final_accuracies,
        cues_compare_from_logs,
    )

    for mode, acc in (("emo", 65.0), ("env", 39.4)):
        d = tmp_path / mode
        d.mkdir()
        (d / "multi_attn_training_log.csv").write_text(
            "epoch,train_loss,train_acc,val_loss,val_acc\n1,1.0,50,1.1,%s\n" % acc
        )
        (d / "multi_attn_training_log.txt").write_text("Epoch 1\n")
    got = collect_final_accuracies(str(tmp_path / "emo"))
    assert got == {"multi_attn": 65.0}
    out = cues_compare_from_logs(str(tmp_path / "emo"), str(tmp_path / "env"),
                                 str(tmp_path / "cmp.png"))
    assert os.path.exists(out)
