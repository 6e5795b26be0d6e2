"""Model I/O shape checks for the audio zoo — the TPU-native analogue of
the reference's audio/input_output_test.py:30-61 (all models on a synthetic
(B, 80, 117) batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_lipread_tpu.models.audio import AUDIO_MODEL_NAMES, get_audio_model

NUM_CLASSES = 4
BATCH = 2


@pytest.mark.parametrize("name", AUDIO_MODEL_NAMES)
def test_audio_model_shapes(name):
    model = get_audio_model(name, NUM_CLASSES, input_size=117, version=11)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, 80, 117)), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_updates_batch_stats():
    model = get_audio_model("resnet", NUM_CLASSES)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((BATCH, 80, 117)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (BATCH, NUM_CLASSES)
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_no_batchnorm_variant_has_no_stats():
    model = get_audio_model("resnet", NUM_CLASSES, use_batchnorm=True)
    x = jnp.zeros((BATCH, 80, 117), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    # classifier BN exists in regularized variant
    assert "classifier" in variables["params"]
    noreg = get_audio_model("resnet", NUM_CLASSES, use_batchnorm=False)
    v2 = noreg.init({"params": jax.random.key(0)}, x, train=False)
    assert "bn" not in v2["params"]["classifier"]


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_audio_model("nope", NUM_CLASSES)
