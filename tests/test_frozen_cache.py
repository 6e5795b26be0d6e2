"""Frozen-feature caching: exact-trajectory + FLOP-saving opt-in.

The reference freezes encoder weights in the early/middle fusion variants
but still runs the full frozen forward every step (reference:
audio_cues_video/models/early_fusion_mobile.py:136-152). With
``frozen_bn_eval=True`` the frozen encoders are per-sample deterministic, so
``training.cache_frozen_features`` precomputes them once and trains only the
tail. These tests pin the contract: the cached trajectory is (numerically)
the one the uncached ``frozen_bn_eval`` run produces.
"""

import numpy as np
import pytest

from multimodal_lipread_tpu.models.audio_cues_video import get_triple_model
from multimodal_lipread_tpu.models.cues_video import get_cues_video_model
from multimodal_lipread_tpu.train.frozen_cache import cached_dataset
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig

N = 16
T = 4  # short frame count keeps the CPU conv compiles fast
NUM_CLASSES = 4


def _triple_data(rng):
    mel = rng.normal(0, 1, (N, 80, 117)).astype(np.float32)
    cue = rng.normal(0, 1, (N, 768)).astype(np.float32)
    lip = rng.integers(0, 255, (N, T, 44, 44, 3), dtype=np.uint8)
    labels = (np.arange(N) % NUM_CLASSES).astype(np.int32)
    return ArrayDataset(inputs=(mel, cue, lip), labels=labels)


def _cv_data(rng):
    cue = rng.normal(0, 1, (N, 768)).astype(np.float32)
    lip = rng.integers(0, 255, (N, T, 44, 44, 3), dtype=np.uint8)
    labels = (np.arange(N) % NUM_CLASSES).astype(np.int32)
    return ArrayDataset(inputs=(cue, lip), labels=labels)


def _trainer(model, frozen_prefixes, tmp_path, tag):
    return Trainer(
        model,
        TrainerConfig(
            model_name=f"fc_{tag}",
            num_classes=NUM_CLASSES,
            batch_size=8,
            epochs=2,
            learning_rate=1e-3,
            weight_decay=0.0,
            metrics_dir=str(tmp_path / tag / "metrics"),
            checkpoints_dir=str(tmp_path / tag / "ckpt"),
            test_every_epoch=False,
            frozen_param_prefixes=frozen_prefixes,
            seed=0,
        ),
    )


@pytest.mark.slow
def test_triple_cached_trajectory_matches_uncached(tmp_path):
    from multimodal_lipread_tpu.models.audio_cues_video import FROZEN_PARAM_PREFIXES

    rng = np.random.default_rng(0)
    train = _triple_data(rng)
    val = _triple_data(np.random.default_rng(1))
    prefixes = FROZEN_PARAM_PREFIXES["early_fusion_mobile"]

    # uncached run, frozen encoders pinned to eval-BN
    model = get_triple_model("early_fusion_mobile", NUM_CLASSES, frozen_bn_eval=True)
    t_ref = _trainer(model, prefixes, tmp_path, "uncached")
    t_ref.init_state(train.inputs)
    ref = t_ref.fit(train, val, None, progress=None)

    # cached run: same init (same seed), features precomputed once
    model2 = get_triple_model("early_fusion_mobile", NUM_CLASSES, frozen_bn_eval=True)
    t_c = _trainer(model2, prefixes, tmp_path, "cached")
    t_c.init_state(train.inputs)
    train_c = cached_dataset(t_c, train, lambda raw, f: (f[0], raw[1], f[1]))
    val_c = cached_dataset(t_c, val, lambda raw, f: (f[0], raw[1], f[1]))
    # cached video features are (B, T, D) — the trainable tail sees them
    assert train_c.inputs[0].shape == (N, 512)  # audio ResNet18 output
    assert train_c.inputs[2].shape[:2] == (N, T)
    t_c.set_apply_kwargs(cached_features=True)
    res = t_c.fit(train_c, val_c, None, progress=None)

    for h_ref, h_c in zip(ref["history"], res["history"]):
        assert h_c["train_loss"] == pytest.approx(h_ref["train_loss"], abs=2e-4)
        assert h_c["val_loss"] == pytest.approx(h_ref["val_loss"], abs=2e-4)
        assert h_c["train_acc"] == h_ref["train_acc"]

    # the frozen encoders' batch_stats must survive cached training intact
    # (checkpoints must stay loadable for full-input eval/serving)
    bs = t_c.state["batch_stats"]
    assert "resnet" in bs["audio"]
    assert "cnn" in bs["video"]
    # and the frozen stats are untouched: eval-mode BN never updates
    bs0 = t_ref.state["batch_stats"]
    a = np.asarray(list(jax_leaves(bs["audio"]["resnet"]))[0])
    b = np.asarray(list(jax_leaves(bs0["audio"]["resnet"]))[0])
    np.testing.assert_allclose(a, b)


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


@pytest.mark.slow
def test_cues_video_cached_trajectory_matches_uncached(tmp_path):
    from multimodal_lipread_tpu.models.cues_video import FROZEN_PARAM_PREFIXES

    rng = np.random.default_rng(0)
    train = _cv_data(rng)
    val = _cv_data(np.random.default_rng(1))
    prefixes = FROZEN_PARAM_PREFIXES["middle_fusion_mobile"]

    model = get_cues_video_model("middle_fusion_mobile", NUM_CLASSES, frozen_bn_eval=True)
    t_ref = _trainer(model, prefixes, tmp_path, "cv_uncached")
    t_ref.init_state(train.inputs)
    ref = t_ref.fit(train, val, None, progress=None)

    model2 = get_cues_video_model("middle_fusion_mobile", NUM_CLASSES, frozen_bn_eval=True)
    t_c = _trainer(model2, prefixes, tmp_path, "cv_cached")
    t_c.init_state(train.inputs)
    train_c = cached_dataset(t_c, train, lambda raw, f: (raw[0], f[0]))
    val_c = cached_dataset(t_c, val, lambda raw, f: (raw[0], f[0]))
    assert train_c.inputs[1].shape[:2] == (N, T)
    t_c.set_apply_kwargs(cached_features=True)
    res = t_c.fit(train_c, val_c, None, progress=None)

    for h_ref, h_c in zip(ref["history"], res["history"]):
        assert h_c["train_loss"] == pytest.approx(h_ref["train_loss"], abs=2e-4)
        assert h_c["val_loss"] == pytest.approx(h_ref["val_loss"], abs=2e-4)


@pytest.mark.slow
def test_triple_cached_composes_with_device_resident_and_scan(tmp_path):
    """The full throughput stack — cache_frozen_features + device_resident +
    steps_per_dispatch — must reproduce the plain cached trajectory
    (experiments/frozen_cache_bench.py measures the speed; this pins the
    math)."""
    from multimodal_lipread_tpu.models.audio_cues_video import FROZEN_PARAM_PREFIXES

    rng = np.random.default_rng(0)
    train = _triple_data(rng)
    val = _triple_data(np.random.default_rng(1))
    prefixes = FROZEN_PARAM_PREFIXES["early_fusion_mobile"]

    def run(tag, **extra):
        model = get_triple_model("early_fusion_mobile", NUM_CLASSES, frozen_bn_eval=True)
        t = Trainer(
            model,
            TrainerConfig(
                model_name=f"fc_{tag}", num_classes=NUM_CLASSES, batch_size=8,
                epochs=2, learning_rate=1e-3, weight_decay=0.0,
                metrics_dir=str(tmp_path / tag / "m"),
                checkpoints_dir=str(tmp_path / tag / "c"),
                test_every_epoch=False, frozen_param_prefixes=prefixes,
                seed=0, **extra,
            ),
        )
        t.init_state(train.inputs)
        train_c = cached_dataset(t, train, lambda raw, f: (f[0], raw[1], f[1]))
        val_c = cached_dataset(t, val, lambda raw, f: (f[0], raw[1], f[1]))
        t.set_apply_kwargs(cached_features=True)
        return t.fit(train_c, val_c, None, progress=None)["history"]

    plain = run("plain")
    stacked = run("stacked", device_resident=True, steps_per_dispatch=4)
    for a, b in zip(plain, stacked):
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=1e-5)
        assert b["val_loss"] == pytest.approx(a["val_loss"], rel=1e-5)
        assert b["train_acc"] == a["train_acc"]
