"""End-to-end tests for the audio_cues, cues_video, and triple pipelines."""

import pytest

import os

from multimodal_lipread_tpu.config import Config


@pytest.mark.slow
def test_audio_cues_pipeline(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.audio_cues import main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root, "input_size": 117,
                        "cue_mode": "emotion", "embed_model": "mpnet",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            "model": {"name": "late_fusion_resnet"},
            "train": {"batch": 8, "lr": 1e-3, "epochs": 1, "seed": 0},
            "output": {"base_dir": str(tmp_path / "ac")},
        }
    )
    result = main(cfg)
    assert "final_test_acc" in result
    assert os.path.exists(tmp_path / "ac" / "models_trained" / "late_fusion_resnet_best.msgpack")


@pytest.mark.slow
def test_cues_video_pipeline(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.cues_video import main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root,
                        "cue_mode": "emotion", "embed_model": "mpnet",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            # frozen-backbone variant: conv backward is stop_gradient'd, which
            # keeps the CPU compile of the 29-frame encoder tractable in CI
            "model": {"name": "early_fusion_mobile"},
            "training": {"batch_size": 8, "learning_rate": 1e-3, "weight_decay": 1e-5,
                         "epochs": 1, "seed": 0},
            "output": {"base_dir": str(tmp_path / "cv")},
        }
    )
    result = main(cfg)
    assert "final_test_acc" in result


@pytest.mark.slow
def test_triple_pipeline(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.audio_cues_video import main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root, "input_size": 117,
                        "cue_mode": "emotion", "embed_model": "mpnet",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            # early_fusion_mobile freezes both heavy encoders (reference
            # semantics) → no conv backward → tractable CPU compile
            "model": {"name": "early_fusion_mobile"},
            "training": {"batch_size": 8, "learning_rate": 1e-3, "weight_decay": 1e-5,
                         "epochs": 1, "seed": 0},
            "output": {"base_dir": str(tmp_path / "acv")},
        }
    )
    result = main(cfg)
    assert "final_test_acc" in result
    # rolling + best checkpoints, like the reference triple trainer
    ckpts = os.listdir(tmp_path / "acv" / "models_trained")
    assert "early_fusion_mobile_best.msgpack" in ckpts
    assert "early_fusion_mobile_checkpoint.msgpack" in ckpts
