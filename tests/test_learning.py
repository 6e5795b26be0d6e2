"""Generalization tests: the training stack must actually learn.

The synthetic fixtures are class-conditional (per-class pitch for audio,
per-class phrasing for cues), so trained models must beat chance (25%) by a
wide margin on held-out splits — this guards the whole path end to end
(features → model → optimizer → checkpointing → best-checkpoint test).
"""

import pytest

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips


@pytest.mark.slow
def test_audio_model_generalizes(tmp_path):
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    root = tmp_path / "GLips_gen"
    make_synthetic_glips(str(root), words=DEFAULT_WORDS, clips_per_split=16, seed=1,
                         with_lip_regions=False, with_cues=False)
    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": str(root), "num_classes": 4, "input_size": 117},
            "model": {"name": "resnet"},
            # from-scratch ResNet18 on a 64-clip fixture: eval (BN running
            # stats) lags train (batch stats) by several epochs, and the
            # exact catch-up epoch shifts with the dropout trajectory (e.g.
            # the rbg-vs-threefry default change moved it 4 → 7); 8 epochs
            # clears it with margin for either RNG impl
            "training": {"batch_size": 16, "epochs": 8, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "run")},
        }
    )
    result = audio_main(cfg)
    assert result["final_test_acc"] >= 70.0, result


def test_cue_classifier_generalizes(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.cues import main as cues_main

    cfg = Config.from_dict(
        {
            "dataset": {"cue_root": glips_root, "cue_mode": "emotion",
                        "cache_dir": str(tmp_path / "cache")},
            "model": {"name": "dense_nn"},
            "training": {"batch_size": 8, "epochs": 12, "learning_rate": 1e-3},
            "output": {"base_dir": str(tmp_path / "cues")},
        }
    )
    result = cues_main(cfg)
    assert result["best_val_acc"] >= 75.0, result


@pytest.mark.slow
def test_video_model_generalizes(tmp_path):
    """The video path (uint8 lips → device normalize → CNN) must learn the
    class-conditional synthetic lip textures."""
    from multimodal_lipread_tpu.pipelines.video import main as video_main

    root = tmp_path / "GLips_vid"
    make_synthetic_glips(str(root), words=DEFAULT_WORDS, clips_per_split=12, seed=2,
                         with_audio=False, with_cues=False)
    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": str(root), "num_classes": 4},
            "model": {"name": "cnn"},
            # BatchNorm running stats need several epochs to settle on this
            # tiny fixture; held-out accuracy reaches 75% around epoch 5-6
            "training": {"batch_size": 16, "epochs": 8, "learning_rate": 1e-3,
                         "weight_decay": 1e-5, "seed": 0},
            "output": {"base_dir": str(tmp_path / "run"), "plots": False},
        }
    )
    result = video_main(cfg)
    assert result["final_test_acc"] >= 70.0, result
