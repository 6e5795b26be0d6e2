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


def test_av_model_shapes_traced():
    """All 7 AV models, init+apply under jax.eval_shape — pure tracing (~8 s
    total), so the default lane validates every registry entry's structure
    and output shape without paying any MobileNetV3/ResNet compile."""
    rng = jax.random.PRNGKey(0)
    audio, video = _inputs()
    for name in AV_MODEL_NAMES:
        model = get_av_model(name, NUM_CLASSES)
        variables = jax.eval_shape(
            lambda m=model: m.init({"params": rng, "dropout": rng}, audio, video, train=False)
        )
        out = jax.eval_shape(
            lambda v, m=model: m.apply(v, audio, video, train=False), variables
        )
        assert out.shape == (BATCH, NUM_CLASSES), name


# every AV variant embeds a MobileNetV3/MobileNetV2/ResNet18 video encoder
# whose FIRST eager build costs 15-45 s of CPU op compiles — the numeric
# forwards all ride the slow lane; the traced test above keeps full-zoo
# default coverage
@pytest.mark.slow
@pytest.mark.parametrize("name", AV_MODEL_NAMES)
def test_av_model_output_shape(name):
    model = get_av_model(name, NUM_CLASSES)
    audio, video = _inputs()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, audio, video, train=False)
    out = model.apply(variables, audio, video, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # real init of late_fusion_fast builds MobileNetV3 (~40 s)
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
