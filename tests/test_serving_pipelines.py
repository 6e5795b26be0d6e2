"""Serving for the non-audio pipelines: video + fusion predict, CLI, export.

Extends tests/test_serving.py (audio-only) to the round-3 serving surface:
``predict_clips`` for every pipeline, the ``--pipeline``/``--export`` CLI,
and StableHLO export of fusion graphs.
"""

import json
import os
import sys

import numpy as np
import pytest

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import lip_regions_root, scan_glips
from multimodal_lipread_tpu.serving import predict_clips


def _cue_txt(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


@pytest.mark.slow
def test_video_serving_and_export(glips_root, tmp_path):
    """Train the light video model, then: predict .npy lips via the video
    pipeline predictor + export its StableHLO and re-run it."""
    from multimodal_lipread_tpu.pipelines.video import main as video_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4},
            "model": {"name": "cnn"},
            "training": {"batch_size": 16, "epochs": 1, "learning_rate": 1e-3,
                         "weight_decay": 1e-5, "seed": 0},
            "output": {"base_dir": str(tmp_path / "video")},
        }
    )
    video_main(cfg)
    ckpt = str(tmp_path / "video" / "models_trained" / "cnn_best.msgpack")
    assert os.path.exists(ckpt)

    lip_root = os.path.join(lip_regions_root(glips_root), "lipread_files")
    index = scan_glips(lip_root, exts=(".npy",))
    clips = [e.path for e in index.by_split("test")][:3]
    results = predict_clips(cfg, ckpt, "video", [[p] for p in clips], batch_size=2)
    assert len(results) == 3
    for r in results:
        assert len(r["logits"]) == 4
        assert r["word"] in index.classes

    # --export via the CLI, then deserialize + execute the artifact
    out = str(tmp_path / "video_cnn.stablehlo")
    import runpy

    argv = sys.argv
    cfg_path = tmp_path / "video_cfg.yaml"
    cfg_path.write_text(
        "dataset:\n  root_dir: %s\n  num_classes: 4\nmodel:\n  name: cnn\n" % glips_root
    )
    try:
        sys.argv = [
            "serving", "--pipeline", "video", "--config", str(cfg_path),
            "--checkpoint", ckpt, "--export", out, "--batch-size", "2",
        ]
        runpy.run_module("multimodal_lipread_tpu.serving", run_name="__main__")
    finally:
        sys.argv = argv
    assert os.path.getsize(out) > 1000

    from jax import export as jexport

    fn = jexport.deserialize((tmp_path / "video_cnn.stablehlo").read_bytes())
    lips = np.stack([np.load(p) for p in clips[:2]]).astype(np.float32) / 255.0
    logits = np.asarray(fn.call(lips))
    assert logits.shape == (2, 4)
    assert np.isfinite(logits).all()


@pytest.mark.slow
def test_fusion_serving_audio_cues(glips_root, tmp_path):
    """Multi-input serving: (audio clip, cue text file) groups through a
    trained audio_cues fusion checkpoint."""
    from multimodal_lipread_tpu.pipelines.audio_cues import main as ac_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root,
                        "input_size": 117, "cue_mode": "emotion",
                        "embed_model": "mpnet",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            "model": {"name": "late_fusion_resnet"},
            "train": {"batch": 8, "lr": 1e-3, "epochs": 1, "seed": 0},
            "output": {"base_dir": str(tmp_path / "ac")},
        }
    )
    ac_main(cfg)
    ckpt = str(tmp_path / "ac" / "models_trained" / "late_fusion_resnet_best.msgpack")
    assert os.path.exists(ckpt)

    index = scan_glips(glips_root)
    clips = [e.path for e in index.by_split("test")][:3]
    cue = _cue_txt(tmp_path, "cue.txt", "the speaker looks calm and focused")
    results = predict_clips(
        cfg, ckpt, "audio_cues", [[c, cue] for c in clips], batch_size=2
    )
    assert len(results) == 3
    for r in results:
        assert len(r["logits"]) == 4
        assert r["word"] in index.classes
        assert np.isfinite(r["logits"]).all()


def test_group_arity_is_validated(tmp_path):
    cfg = Config.from_dict({"dataset": {"num_classes": 4}})
    with pytest.raises(ValueError, match="2 files per clip"):
        from multimodal_lipread_tpu.serving import _featurize_modalities

        _featurize_modalities("audio_cues", cfg, [["only_audio.wav"]])


def test_tfidf_cue_model_refuses_serving(tmp_path):
    cfg = Config.from_dict({"dataset": {"num_classes": 4}, "model": {"name": "linear"}})
    cue = _cue_txt(tmp_path, "c.txt", "text")
    from multimodal_lipread_tpu.serving import _featurize_modalities

    with pytest.raises(ValueError, match="TF-IDF"):
        _featurize_modalities("cues", cfg, [[cue]])


def test_example_inputs_follow_model_kind():
    """Export example shapes: cue dims come from the MODEL's featurization
    kind (ensemble=1152, token-level=(B,32,D), bert=token ids), and fusion
    pipelines honor dataset.embed_model via EMBED_DIMS."""
    from multimodal_lipread_tpu.serving import _example_inputs

    def cfg(**kw):
        d = {"dataset": {"num_classes": 4}}
        d.update(kw)
        return Config.from_dict(d)

    (cue,) = _example_inputs("cues", cfg(model={"name": "transformer"}), 2)
    assert cue.shape == (2, 1152)  # ensemble = minilm 384 + mpnet 768

    (cue,) = _example_inputs("cues", cfg(model={"name": "minilm_cnn_lstm"}), 2)
    assert cue.shape == (2, 32, 768) and cue.dtype == np.float32

    (cue,) = _example_inputs("cues", cfg(model={"name": "bert"}), 2)
    assert cue.shape == (2, 32) and cue.dtype == np.int32

    with pytest.raises(ValueError, match="TF-IDF"):
        _example_inputs("cues", cfg(model={"name": "linear"}), 2)

    mel, cue = _example_inputs("audio_cues", cfg(dataset={"embed_model": "minilm"}), 2)
    assert cue.shape == (2, 384)
