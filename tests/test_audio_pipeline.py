"""End-to-end audio pipeline test: synthetic GLips → train → logs/checkpoints."""

import pytest

import os

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.pipelines.audio import main as audio_main
from multimodal_lipread_tpu.pipelines.common import load_audio_datasets


def test_load_audio_datasets_shapes(glips_root):
    datasets, index = load_audio_datasets(glips_root, input_size=117)
    assert index.classes == sorted(index.classes) and len(index.classes) == 4
    for split in ("train", "val", "test"):
        ds = datasets[split]
        assert ds.inputs[0].shape == (16, 80, 117)
        assert ds.labels.shape == (16,)
        assert set(np.unique(ds.labels)) == {0, 1, 2, 3}
    # normalized per clip: roughly zero mean, unit std
    mel = datasets["train"].inputs[0]
    assert abs(float(mel.mean())) < 0.35  # sliced after normalization, so not exactly 0
    assert 0.5 < float(mel.std()) < 1.5


@pytest.mark.slow  # ~50 s; the default lane keeps the streaming audio e2e
def test_audio_pipeline_end_to_end(glips_root, tmp_path):
    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4, "input_size": 117},
            "model": {"name": "resnet", "version": 11},
            "training": {"batch_size": 16, "epochs": 2, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "audio")},
        }
    )
    result = audio_main(cfg)
    assert "final_test_acc" in result
    assert len(result["history"]) == 2
    assert os.path.exists(tmp_path / "audio" / "metrics" / "resnet_training_log.csv")
    assert os.path.exists(tmp_path / "audio" / "models_trained" / "resnet_best.msgpack")


@pytest.mark.slow
def test_audio_pipeline_with_pretrained_backbone(glips_root, tmp_path):
    """model.pretrained grafts a converted torch ResNet18 into the trainer."""
    import torch

    from tests.test_torch_import import _TorchResNet18

    pth = tmp_path / "resnet18.pth"
    torch.save(_TorchResNet18().state_dict(), pth)

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4, "input_size": 117},
            "model": {
                "name": "resnet",
                "pretrained": [{"arch": "resnet18", "path": str(pth),
                                "submodule": ["resnet"], "adapt_1ch": True}],
            },
            "training": {"batch_size": 16, "epochs": 1, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "audio_pre")},
        }
    )
    result = audio_main(cfg)
    assert "final_test_acc" in result
