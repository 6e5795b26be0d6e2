"""Shape tests for the 7 audio_video fusion models + AV pipeline e2e."""

import os

import jax
import numpy as np
import pytest

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.models.audio_video import AV_MODEL_NAMES, get_av_model

BATCH, T = 2, 3
NUM_CLASSES = 4


def _inputs(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    audio = rng.standard_normal((BATCH, 80, 117)).astype(np.float32)
    video = rng.random((BATCH, T, 44, 44, 3), np.float32)
    return audio, video


@pytest.mark.parametrize(
    "name",
    [
        # early_fusion_mobilenet's MobileNetV3 init dominates the file's
        # compile time — slow lane
        pytest.param(n, marks=pytest.mark.slow) if n == "early_fusion_mobilenet" else n
        for n in AV_MODEL_NAMES
    ],
)
def test_av_model_output_shape(name):
    model = get_av_model(name, NUM_CLASSES)
    audio, video = _inputs()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, audio, video, train=False)
    out = model.apply(variables, audio, video, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))


def test_late_fusion_alpha_is_scalar_param():
    model = get_av_model("late_fusion_fast", NUM_CLASSES)
    audio, video = _inputs()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, audio, video, train=False)
    assert variables["params"]["alpha"].shape == ()
    assert float(variables["params"]["alpha"]) == 0.5


@pytest.mark.slow
def test_av_pipeline_end_to_end(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.audio_video import main as av_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4, "audio_input_size": 117},
            "model": {"name": "middle_fusion_fast"},
            "training": {"batch_size": 8, "epochs": 1, "learning_rate": 1e-3, "seed": 0},
            "output": {"base_dir": str(tmp_path / "av")},
        }
    )
    result = av_main(cfg)
    assert "final_test_acc" in result
    assert os.path.exists(tmp_path / "av" / "models_trained" / "middle_fusion_fast_best.msgpack")
