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
def test_audio_cues_early_fusion_mobile_survives_family_lr(glips_root, tmp_path):
    """Non-collapse guard for the round-3 failure mode: at the reference's
    family lr (1e-3, ac_config.yaml:14) Adam's first steps killed the
    MelMobileNet encoder (dead ReLU6 → logits pinned at ln num_classes from
    epoch 1, ZOO.md footnote). The shipped 2-epoch warmup default must keep
    the model alive: the LR ramps (history lr < base early on) and the model
    ends clearly above the 25% collapse floor on the class-separable fixture."""
    from multimodal_lipread_tpu.pipelines.audio_cues import main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root, "input_size": 117,
                        "cue_mode": "emotion", "embed_model": "mpnet",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            "model": {"name": "early_fusion_mobile"},
            "train": {"batch": 8, "lr": 1e-3, "epochs": 4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "ac_efm")},
        }
    )
    result = main(cfg)
    # warmup default active: the epoch-1 recorded LR sits on the ramp
    assert result["history"][0]["lr"] < 1e-3
    # alive: a dead encoder trains at exactly 25% with loss pinned at ln 4
    # (1.386); the fixture's cue channel alone separates the classes
    assert result["history"][-1]["train_acc"] > 40.0, result["history"]
    assert result["history"][-1]["train_loss"] < 1.3, result["history"]


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
