import numpy as np

from multimodal_lipread_tpu.data import glips
from multimodal_lipread_tpu.data.audio_io import TARGET_SAMPLES, load_waveform
from multimodal_lipread_tpu.data.glips import (
    align_modalities,
    extract_sequence_id,
    lip_regions_root,
    scan_glips,
    scan_lip_regions,
)


def test_sequence_id_regex():
    assert extract_sequence_id("abend_0001-0002.wav") == "0001-0002"
    assert extract_sequence_id("/a/b/cirka_1234-5678.mp4") == "1234-5678"
    assert extract_sequence_id("nomatch.wav") is None


def test_scan_audio(glips_root):
    ix = scan_glips(glips_root)
    assert ix.classes == sorted(ix.classes)
    assert len(ix.classes) == 4
    # 4 words x 3 splits x 4 clips
    assert len(ix.entries) == 48
    assert len(ix.by_split("train")) == 16
    e = ix.entries[0]
    assert e.path.endswith(".wav")
    assert ix.class_to_idx[e.word] == 0


def test_load_waveform_fixed_length(glips_root):
    ix = scan_glips(glips_root)
    w = load_waveform(ix.entries[0].path)
    assert w.shape == (TARGET_SAMPLES,)
    assert w.dtype == np.float32
    assert np.abs(w).max() > 100  # int16-range scaling like pydub


def test_scan_lip_regions_and_alignment(glips_root):
    audio_ix = scan_glips(glips_root)
    lip_root = lip_regions_root(glips_root)
    lip_ix = scan_lip_regions(lip_root)
    assert len(lip_ix.entries) == 48
    arr = np.load(lip_ix.entries[0].path)
    assert arr.shape == (29, 44, 44, 3)
    assert arr.dtype == np.uint8

    pairs = align_modalities(audio_ix, lip_ix, split="train")
    assert len(pairs) == 16
    for a, v in pairs:
        assert a.key == v.key


def test_alignment_respects_missing(glips_root, tmp_path):
    audio_ix = scan_glips(glips_root)
    # lip index with one entry dropped
    lip_ix = scan_lip_regions(lip_regions_root(glips_root))
    lip_ix.entries = lip_ix.entries[1:]
    pairs = align_modalities(audio_ix, lip_ix)
    assert len(pairs) == 47
