"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import pytest

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def _tiny_ds(n=32, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    for i, l in enumerate(labels):
        x[i, l * 4 : l * 4 + 4] += 2.0
    return ArrayDataset(inputs=(x,), labels=labels)


def test_frozen_param_prefixes_receive_no_updates(tmp_path):
    """Frozen subtrees must stay bit-identical through training (incl. decay)."""
    import jax
    from flax import linen as nn

    class TwoPart(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Dense(8, name="frozen_enc")(x)
            h = jax.lax.stop_gradient(h)
            return nn.Dense(4, name="head")(h)

    ds = _tiny_ds()
    trainer = Trainer(
        TwoPart(),
        TrainerConfig(
            model_name="frz", num_classes=4, batch_size=16, epochs=2,
            learning_rate=1e-2, weight_decay=1e-2,  # aggressive decay
            frozen_param_prefixes=(("frozen_enc",),),
            test_every_epoch=False,
            metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
        ),
    )
    trainer.init_state(ds.inputs)
    before = np.asarray(trainer.state["params"]["frozen_enc"]["kernel"]).copy()
    head_before = np.asarray(trainer.state["params"]["head"]["kernel"]).copy()
    trainer.fit(ds, ds, progress=None)
    after = np.asarray(trainer.state["params"]["frozen_enc"]["kernel"])
    head_after = np.asarray(trainer.state["params"]["head"]["kernel"])
    np.testing.assert_array_equal(before, after)  # frozen: bit-identical
    assert not np.allclose(head_before, head_after)  # head trained


def test_resume_restores_scheduler_plateau_state(tmp_path):
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x)

    ds = _tiny_ds()

    def make(epochs):
        return Trainer(
            Tiny(),
            TrainerConfig(
                model_name="sched", num_classes=4, batch_size=16, epochs=epochs,
                learning_rate=1e-3, weight_decay=0.0, rolling_checkpoint=True,
                scheduler_patience=3, test_every_epoch=False,
                metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
            ),
        )

    t1 = make(3)
    t1.fit(ds, ds, progress=None)
    saved_bad = t1.scheduler.num_bad_epochs
    saved_best = t1.scheduler.best

    t2 = make(4)
    t2.fit(ds, ds, resume=True, progress=None)
    # after resume, scheduler continued from the saved plateau state: the
    # restored pre-epoch-4 values must match what t1 ended with
    assert t2.scheduler.best is not None
    # t2 ran one more epoch; its restored state must derive from t1's, not a
    # fresh scheduler (fresh would treat epoch 4's metric as first-ever best)
    assert saved_best is not None
    assert t2.scheduler.best <= saved_best or t2.scheduler.num_bad_epochs >= 0


def test_embed_cache_separates_backends(tmp_path):
    from multimodal_lipread_tpu.data.cues import HashingEmbedder, embed_cached

    class FakeST:
        cache_tag = "st"
        dim = 768

        def encode(self, texts):
            return np.ones((len(texts), 768), np.float32)

    descs = ["alpha beta", "gamma delta"]
    hashed = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=HashingEmbedder(768))
    st = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=FakeST())
    assert not np.allclose(hashed, st)  # different backends → different cache entries
    # each backend re-reads its OWN cache entry
    st2 = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=FakeST())
    np.testing.assert_array_equal(st, st2)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 2


def test_canonical_embed_model_names():
    from multimodal_lipread_tpu.data.cues import canonical_embed_model

    assert canonical_embed_model("sentence-transformers/all-mpnet-base-v2") == "mpnet"
    assert canonical_embed_model("sentence-transformers/all-MiniLM-L6-v2") == "minilm"
    assert canonical_embed_model("mpnet") == "mpnet"
    with pytest.raises(ValueError, match="Unknown cue embedding model"):
        canonical_embed_model("no-such-model")


def test_scan_glips_dedups_multi_format(tmp_path):
    from multimodal_lipread_tpu.data.audio_io import write_wav
    from multimodal_lipread_tpu.data.glips import scan_glips

    d = tmp_path / "lipread_files" / "wort" / "train"
    d.mkdir(parents=True)
    write_wav(str(d / "wort_0001-0002.wav"), np.zeros(100, np.float32))
    (d / "wort_0001-0002.m4a").write_bytes(b"fake")  # same clip, other format
    index = scan_glips(str(tmp_path), exts=(".m4a", ".wav", ".flac"))
    assert len(index.entries) == 1  # deduped
    assert index.entries[0].path.endswith(".m4a")  # first ext in list wins


def test_resolve_lip_root_without_wrapper(tmp_path):
    from multimodal_lipread_tpu.pipelines.video import resolve_lip_root

    root = tmp_path / "GLips"
    (root / "wort" / "train").mkdir(parents=True)  # no lipread_files wrapper
    cfg = Config.from_dict({"dataset": {"root_dir": str(root)}})
    assert resolve_lip_root(cfg) == str(tmp_path / "GLips_lip_regions")


@pytest.mark.slow
def test_reference_cv_config_schema_honored(glips_root, tmp_path):
    """A reference-style cv_config (train.batch/lr/epochs/model_name) must
    drive the cues_video pipeline, not be silently ignored."""
    from multimodal_lipread_tpu.pipelines.cues_video import main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "cue_root": glips_root,
                        "cue_mode": "emotion",
                        "embed_model": "sentence-transformers/all-mpnet-base-v2",
                        "cache_dir": str(tmp_path / "cache"), "num_classes": 4},
            "train": {"batch": 8, "lr": 1e-3, "epochs": 1,
                      "model_name": "late_fusion_mobile",
                      "metrics_dir": str(tmp_path / "cv" / "metrics"),
                      "save_dir": str(tmp_path / "cv" / "models_trained")},
            "output": {"plots": False},
        }
    )
    result = main(cfg)
    assert len(result["history"]) == 1  # train.epochs honored
    assert os.path.exists(tmp_path / "cv" / "models_trained" / "late_fusion_mobile_best.msgpack")


def test_frozen_params_zero_update_even_with_nonzero_grads(tmp_path):
    """frozen_param_prefixes must zero the update even when the frozen leaves
    HAVE gradients (optax.masked would pass raw grads through — ascent)."""
    from flax import linen as nn

    class TwoPart(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Dense(8, name="frozen_enc")(x)  # NO stop_gradient
            return nn.Dense(4, name="head")(h)

    ds = _tiny_ds()
    trainer = Trainer(
        TwoPart(),
        TrainerConfig(
            model_name="frz2", num_classes=4, batch_size=16, epochs=1,
            learning_rate=1e-2, weight_decay=1e-2,
            frozen_param_prefixes=(("frozen_enc",),), test_every_epoch=False,
            metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
        ),
    )
    trainer.init_state(ds.inputs)
    before = np.asarray(trainer.state["params"]["frozen_enc"]["kernel"]).copy()
    trainer.fit(ds, ds, progress=None)
    after = np.asarray(trainer.state["params"]["frozen_enc"]["kernel"])
    np.testing.assert_array_equal(before, after)


def test_resume_keeps_true_best_val_acc(tmp_path):
    """best_val_acc must survive resume even when the last epoch was worse."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x)

    ds = _tiny_ds(48)
    val = _tiny_ds(16, seed=1)

    def make(epochs):
        return Trainer(
            Tiny(),
            TrainerConfig(
                model_name="best", num_classes=4, batch_size=16, epochs=epochs,
                learning_rate=5e-2, weight_decay=0.0, rolling_checkpoint=True,
                test_every_epoch=False,
                metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
            ),
        )

    r1 = make(3).fit(ds, val, progress=None)
    t2 = make(4)
    r2 = t2.fit(ds, val, resume=True, progress=None)
    assert r2["best_val_acc"] >= r1["best_val_acc"]  # never forgets the best


def test_embed_cache_key_includes_max_length(tmp_path):
    from multimodal_lipread_tpu.data.cues import HashingEmbedder, embed_cached

    descs = ["alpha beta gamma"]
    e = HashingEmbedder(64)
    a = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=e,
                     token_level=True, max_length=8)
    b = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=e,
                     token_level=True, max_length=16)
    assert a.shape[1] == 8 and b.shape[1] == 16  # no cache collision


def test_embed_cache_key_delimits_descriptions(tmp_path):
    from multimodal_lipread_tpu.data.cues import HashingEmbedder, embed_cached

    e = HashingEmbedder(32)
    a = embed_cached(["ab", "c"], "mpnet", cache_dir=str(tmp_path), embedder=e)
    b = embed_cached(["a", "bc"], "mpnet", cache_dir=str(tmp_path), embedder=e)
    assert not np.allclose(a, b)  # distinct cache entries, correct contents


def test_token_only_model_rejected_for_sentence_embedding():
    from multimodal_lipread_tpu.data.cues import get_embedder

    with pytest.raises(ValueError, match="not a sentence-embedding model"):
        get_embedder("distilbert")


def test_trainer_extras_reach_every_pipeline():
    """docs/MIGRATION.md documents training.{remat,checkpoint_backend,
    profile_dir,half_precision,mixup_alpha,...} as YAML knobs; they must be
    plumbed into TrainerConfig by ALL 7 pipelines, not silently ignored."""
    import dataclasses
    import inspect

    from multimodal_lipread_tpu.pipelines.common import trainer_extras

    extras = trainer_extras(Config.from_dict({"training": {
        "remat": True, "half_precision": True, "mixup_alpha": 0.3,
        "checkpoint_backend": "orbax", "profile_dir": "/tmp/prof",
        "device_resident": True, "handle_preemption": True, "host_prefetch": 4,
    }}))
    fields = {f.name for f in dataclasses.fields(TrainerConfig)}
    assert set(extras) <= fields
    tc = TrainerConfig(model_name="m", num_classes=2, **extras)
    assert tc.remat and tc.half_precision and tc.mixup_alpha == 0.3
    assert tc.checkpoint_backend == "orbax" and tc.profile_dir == "/tmp/prof"
    assert tc.device_resident and tc.handle_preemption and tc.host_prefetch == 4
    # the reference's augmentation.mixup_alpha spelling still works
    assert trainer_extras(
        Config.from_dict({"augmentation": {"mixup_alpha": 0.5}})
    )["mixup_alpha"] == 0.5

    for name in ("audio", "video", "audio_video", "cues", "audio_cues",
                 "cues_video", "audio_cues_video"):
        mod = __import__(f"multimodal_lipread_tpu.pipelines.{name}",
                         fromlist=["main"])
        # audio_cues passes a non-zero default_warmup_epochs (documented
        # divergence, docs/MIGRATION.md) — accept either call shape
        assert "**trainer_extras(cfg" in inspect.getsource(mod), name
