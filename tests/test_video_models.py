"""Shape tests for the 7 video models (reference parity: video/train.py registry)."""

import jax
import numpy as np
import pytest

from multimodal_lipread_tpu.models.video import VIDEO_MODEL_NAMES, get_video_model

# T=3 tiny sequences keep CPU compile fast; models are length-agnostic.
BATCH, T, H, W, C = 2, 3, 44, 44, 3
NUM_CLASSES = 4


@pytest.mark.parametrize(
    "name",
    [
        # shufflenet's hand-assembled stages have the heaviest CPU compile
        pytest.param(n, marks=pytest.mark.slow) if n == "shufflenet_lstm" else n
        for n in VIDEO_MODEL_NAMES
    ],
)
def test_video_model_output_shape(name):
    model = get_video_model(name, NUM_CLASSES)
    x = np.random.default_rng(0).random((BATCH, T, H, W, C), np.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))


def test_video_model_train_mode_mutates_bn():
    model = get_video_model("cnn", NUM_CLASSES)
    x = np.random.default_rng(0).random((BATCH, T, H, W, C), np.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
    )
    assert out.shape == (BATCH, NUM_CLASSES)
    assert "batch_stats" in mutated
