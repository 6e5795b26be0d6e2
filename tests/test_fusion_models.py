"""Shape tests for the audio_cues, cues_video, and triple-fusion zoos."""

import jax
import numpy as np
import pytest

from multimodal_lipread_tpu.models.audio_cues import (
    AUDIO_CUES_MODEL_NAMES,
    get_audio_cues_model,
)
from multimodal_lipread_tpu.models.audio_cues_video import (
    TRIPLE_MODEL_NAMES,
    get_triple_model,
)
from multimodal_lipread_tpu.models.cues_video import (
    CUES_VIDEO_MODEL_NAMES,
    get_cues_video_model,
)

BATCH, T = 2, 3
NUM_CLASSES = 4
CUE_DIM = 768


def _mel():
    return np.random.default_rng(0).standard_normal((BATCH, 80, 117)).astype(np.float32)


def _cue():
    return np.random.default_rng(1).standard_normal((BATCH, CUE_DIM)).astype(np.float32)


def _video():
    return np.random.default_rng(2).random((BATCH, T, 44, 44, 3), np.float32)


def _check(model, *inputs):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))
    return variables


def _mark_mobile_slow(names):
    # the *_fusion_mobile variants build MobileNetV2 encoders; whichever test
    # FIRST builds one eagerly pays ~30 s of per-op CPU compiles (later ones
    # hit jax's in-process op cache) — all of them ride the slow lane, and
    # the default lane covers MobileNetV2 once via the video zoo
    return [
        pytest.param(n, marks=pytest.mark.slow) if n.endswith("_mobile") else n
        for n in names
    ]


def test_fusion_model_shapes_traced():
    """Every model in all three fusion zoos, init+apply under jax.eval_shape —
    tracing-only full-registry coverage for the default lane (the numeric
    forwards of the MobileNet variants ride the slow lane)."""
    rng = jax.random.PRNGKey(0)
    zoos = [
        (AUDIO_CUES_MODEL_NAMES, get_audio_cues_model, (_mel(), _cue())),
        (CUES_VIDEO_MODEL_NAMES, get_cues_video_model, (_cue(), _video())),
        (TRIPLE_MODEL_NAMES, get_triple_model, (_mel(), _cue(), _video())),
    ]
    for names, factory, inputs in zoos:
        for name in names:
            model = factory(name, NUM_CLASSES)
            variables = jax.eval_shape(
                lambda m=model: m.init({"params": rng, "dropout": rng}, *inputs, train=False)
            )
            out = jax.eval_shape(
                lambda v, m=model: m.apply(v, *inputs, train=False), variables
            )
            assert out.shape == (BATCH, NUM_CLASSES), name


@pytest.mark.parametrize("name", _mark_mobile_slow(AUDIO_CUES_MODEL_NAMES))
def test_audio_cues_model_shapes(name):
    _check(get_audio_cues_model(name, NUM_CLASSES), _mel(), _cue())


@pytest.mark.parametrize("name", _mark_mobile_slow(CUES_VIDEO_MODEL_NAMES))
def test_cues_video_model_shapes(name):
    _check(get_cues_video_model(name, NUM_CLASSES), _cue(), _video())


@pytest.mark.parametrize("name", _mark_mobile_slow(TRIPLE_MODEL_NAMES))
def test_triple_model_shapes(name):
    _check(get_triple_model(name, NUM_CLASSES), _mel(), _cue(), _video())


def test_modality_attention_weights_sum_to_one():
    from multimodal_lipread_tpu.models.audio_cues_video import ModalityAttentionFusion

    m = ModalityAttentionFusion()
    feats = [np.ones((BATCH, 8), np.float32) * i for i in range(3)]
    variables = m.init(jax.random.PRNGKey(0), feats)
    fused, weights = m.apply(variables, feats)
    assert fused.shape == (BATCH, 8)
    assert weights.shape == (BATCH, 3)
    np.testing.assert_allclose(np.asarray(weights).sum(axis=1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_frozen_encoders_stop_gradients():
    """Early triple fusion freezes audio+video; their encoder params get zero grads."""
    import jax.numpy as jnp
    import optax

    model = get_triple_model("early_fusion_mobile", NUM_CLASSES)
    mel, cue, video = _mel(), _cue(), _video()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, mel, cue, video, train=False)

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            mel, cue, video, train=False,
        )
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.zeros((BATCH,), jnp.int32)))

    grads = jax.grad(loss_fn)(variables["params"])
    audio_grad = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["audio"], 0.0
    )
    proj_grad = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["ap"], 0.0
    )
    assert audio_grad == 0.0  # frozen
    assert proj_grad > 0.0  # projection still trains


def test_cues_video_freeze_backbone_override():
    """model.freeze_backbone overrides each variant's reference default
    (frozen mobile / trainable resnet) — the causal-control knob of
    experiments/cues_video_rank_study.py."""
    from multimodal_lipread_tpu.models.cues_video import get_cues_video_model

    assert get_cues_video_model("middle_fusion_mobile", 4).freeze_backbone is True
    assert get_cues_video_model(
        "middle_fusion_mobile", 4, freeze_backbone=False).freeze_backbone is False
    assert get_cues_video_model("middle_fusion_resnet", 4).freeze_backbone is False
    assert get_cues_video_model(
        "middle_fusion_resnet", 4, freeze_backbone=True).freeze_backbone is True
