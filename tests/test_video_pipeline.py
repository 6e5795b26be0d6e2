"""End-to-end video pipeline test on the synthetic lip-region mirror tree."""

import pytest

import os

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import lip_regions_root
from multimodal_lipread_tpu.pipelines.common import load_video_datasets
from multimodal_lipread_tpu.pipelines.video import main as video_main, resolve_lip_root


def _lip_root(glips_root):
    return os.path.join(lip_regions_root(glips_root), "lipread_files")


def test_load_video_datasets(glips_root):
    datasets, index = load_video_datasets(_lip_root(glips_root))
    assert len(index.classes) == 4
    ds = datasets["train"]
    assert ds.inputs[0].shape == (16, 29, 44, 44, 3)
    # uint8 on host: the Trainer normalizes to [0,1] on device (4x less H2D)
    assert ds.inputs[0].dtype == np.uint8


def test_resolve_lip_root_derivation(glips_root):
    cfg = Config.from_dict({"dataset": {"root_dir": glips_root}})
    assert resolve_lip_root(cfg) == _lip_root(glips_root)


@pytest.mark.slow
def test_video_pipeline_end_to_end(glips_root, tmp_path):
    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4},
            "model": {"name": "cnn"},
            "training": {"batch_size": 16, "epochs": 2, "learning_rate": 1e-3,
                         "weight_decay": 1e-5, "seed": 0},
            "output": {"base_dir": str(tmp_path / "video")},
        }
    )
    result = video_main(cfg)
    assert "final_test_acc" in result
    ckpt_dir = tmp_path / "video" / "models_trained"
    assert os.path.exists(ckpt_dir / "cnn_best.msgpack")
    assert os.path.exists(ckpt_dir / "cnn_checkpoint.msgpack")  # rolling
    # exact reference test_results.txt schema (video/train.py:277-280)
    results_txt = (ckpt_dir / "test_results.txt").read_text()
    assert "Final Test Loss:" in results_txt
    assert "Final Test Acc:" in results_txt
    assert "Best Val Acc:" in results_txt
    # reference pre-creates the TXT log with a banner (video/train.py:50-52)
    txt_log = (tmp_path / "video" / "metrics" / "cnn_training_log.txt").read_text()
    assert txt_log.startswith("Training Log\n\n")


@pytest.mark.slow
def test_video_pipeline_device_crop_end_to_end(tmp_path):
    """North-star layout e2e: raw .mp4 GLips tree → host decode+detect →
    device crop/resize/pad/normalize inside the train step — no offline
    .npy mirror tree at all."""
    from multimodal_lipread_tpu.data.synthetic import DEFAULT_WORDS, make_synthetic_glips

    root = str(tmp_path / "GLips_4")
    make_synthetic_glips(root, words=DEFAULT_WORDS, clips_per_split=4, seed=0,
                         with_audio=False, with_lip_regions=False,
                         with_cues=False, with_video=True)
    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": root, "num_classes": 4,
                        "device_crop": True, "landmark_backend": "center"},
            "model": {"name": "cnn"},
            "training": {"batch_size": 16, "epochs": 2, "learning_rate": 1e-3,
                         "weight_decay": 1e-5, "seed": 0},
            "output": {"base_dir": str(tmp_path / "video_dc"), "plots": False},
        }
    )
    result = video_main(cfg)
    assert "final_test_acc" in result
    # the class signal lives inside the crop box: the model must learn it
    assert result["history"][-1]["train_acc"] > 40.0
