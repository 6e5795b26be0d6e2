"""Serving tests: checkpoint → Predictor → predictions; StableHLO export."""

import pytest

import os

import jax
import jax.numpy as jnp

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips
from multimodal_lipread_tpu.serving import Predictor, export_stablehlo, predict_audio_clips


def _train_tiny_audio(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4, "input_size": 117},
            "model": {"name": "resnet"},
            "training": {"batch_size": 16, "epochs": 1, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "run"), "plots": False},
        }
    )
    audio_main(cfg)
    return cfg, str(tmp_path / "run" / "models_trained" / "resnet_best.msgpack")


@pytest.mark.slow
def test_predictor_from_checkpoint_and_cli_path(glips_root, tmp_path):
    cfg, ckpt = _train_tiny_audio(glips_root, tmp_path)
    assert os.path.exists(ckpt)

    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    clips = [e.path for e in index.by_split("test")][:5]
    results = predict_audio_clips(cfg, ckpt, clips, batch_size=4)  # forces padding path
    assert len(results) == 5
    for r in results:
        assert r["word"] in index.classes
        assert len(r["logits"]) == 4


@pytest.mark.slow
def test_predictor_padding_matches_unpadded(glips_root, tmp_path):
    from multimodal_lipread_tpu.models.audio import get_audio_model
    from multimodal_lipread_tpu.pipelines.common import load_audio_datasets

    cfg, ckpt = _train_tiny_audio(glips_root, tmp_path)
    datasets, _ = load_audio_datasets(glips_root)
    mels = datasets["test"].inputs[0]

    model = get_audio_model("resnet", 4)
    p_big = Predictor.from_checkpoint(model, ckpt, (mels[:1],), batch_size=16)
    p_small = Predictor.from_checkpoint(model, ckpt, (mels[:1],), batch_size=3)
    np.testing.assert_allclose(
        p_big.predict_logits(mels), p_small.predict_logits(mels), rtol=1e-4, atol=1e-5
    )


def test_stablehlo_export_roundtrip(glips_root, tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from multimodal_lipread_tpu.models.audio import get_audio_model

    model = get_audio_model("resnet", 4)
    rng = jax.random.PRNGKey(0)
    mel = np.random.default_rng(0).standard_normal((2, 80, 117)).astype(np.float32)
    variables = model.init({"params": rng, "dropout": rng}, mel, train=False)

    blob = export_stablehlo(model, variables, (mel,))
    assert isinstance(blob, bytes) and len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    out = reloaded.call(jnp.asarray(mel))
    ref = model.apply(variables, mel, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_predictor_from_orbax_checkpoint(tmp_path):
    """Serving must restore trainer-written .orbax checkpoints (raw restore,
    no subset template)."""
    import numpy as np
    from flax import linen as nn

    from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x)

    rng = np.random.default_rng(0)
    ds = ArrayDataset(inputs=(rng.standard_normal((32, 16)).astype(np.float32),),
                      labels=rng.integers(0, 4, 32).astype(np.int32))
    trainer = Trainer(
        Tiny(),
        TrainerConfig(
            model_name="srv", num_classes=4, batch_size=16, epochs=1,
            learning_rate=1e-2, checkpoint_backend="orbax", test_every_epoch=False,
            metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c"),
        ),
    )
    trainer.fit(ds, ds, progress=None)
    ckpt = str(tmp_path / "c" / "srv_best.orbax")
    assert os.path.isdir(ckpt)

    p = Predictor.from_checkpoint(Tiny(), ckpt, ds.inputs, batch_size=8)
    preds = p.predict(ds.inputs[0])
    assert preds.shape == (32,)


@pytest.mark.slow
def test_serving_rebuilds_no_batchnorm_models(glips_root, tmp_path):
    """models_without_reg checkpoints (use_batchnorm=False) must be servable."""
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4, "input_size": 117},
            "model": {"name": "resnet", "use_batchnorm": False},
            "training": {"batch_size": 16, "epochs": 1, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "run"), "plots": False},
        }
    )
    audio_main(cfg)
    ckpt = str(tmp_path / "run" / "models_trained" / "resnet_best.msgpack")
    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    clips = [e.path for e in index.by_split("test")][:3]
    results = predict_audio_clips(cfg, ckpt, clips)
    assert len(results) == 3


def test_predictor_uint8_inputs_normalized_in_graph():
    """Predictor accepts uint8 lip tensors directly (1/4 H2D bytes) and
    normalizes to [0,1] inside the compiled forward — matching the
    Trainer's device-normalize contract."""
    from flax import linen as nn

    from multimodal_lipread_tpu.serving import Predictor

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            # logits = per-example mean: reveals whether inputs were scaled
            m = x.reshape(x.shape[0], -1).mean(axis=1, keepdims=True)
            return jnp.concatenate([m, -m], axis=1)

    model = Probe()
    u8 = (np.ones((4, 8, 8), np.uint8) * 255)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)), train=False)
    pred = Predictor(model=model, variables=variables, batch_size=4)
    logits = pred.predict_logits(u8)
    # 255-valued uint8 must arrive as 1.0 after in-graph normalization
    np.testing.assert_allclose(logits[:, 0], 1.0, atol=1e-6)


def test_predictor_mesh_matches_single_device():
    """Data-parallel serving (batch sharded over the 8-device mesh, params
    replicated) must produce the same logits as single-device serving —
    eval paths have no cross-batch ops, so sharding is a pure layout change."""
    from multimodal_lipread_tpu.models.audio import get_audio_model
    from multimodal_lipread_tpu.parallel.mesh import get_mesh

    model = get_audio_model("resnet", 4)
    rng = jax.random.PRNGKey(0)
    mel = np.random.default_rng(0).standard_normal((11, 80, 117)).astype(np.float32)
    variables = model.init({"params": rng, "dropout": rng}, mel[:1], train=False)

    single = Predictor(model=model, variables=variables, batch_size=16)
    mesh = get_mesh()
    assert mesh.size == 8  # conftest forces the 8-device CPU mesh
    sharded = Predictor(model=model, variables=variables, batch_size=16, mesh=mesh)
    # n=11 < batch_size exercises the pad-then-shard path (pad to 16 = 2/device)
    np.testing.assert_allclose(
        single.predict_logits(mel), sharded.predict_logits(mel), rtol=1e-6, atol=1e-6
    )

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        Predictor(model=model, variables=variables, batch_size=12, mesh=mesh).predict_logits(mel)


@pytest.mark.slow
def test_export_streaming_audio_checkpoint(glips_root, tmp_path):
    """dataset.streaming: true checkpoints wrap the classifier in WaveToLogMel
    (raw-wave input, deeper param tree); --export must rebuild that wrapper
    and serialize a graph that takes 20k-sample waveforms."""
    from jax import export as jexport

    from multimodal_lipread_tpu.data.audio_io import TARGET_SAMPLES
    from multimodal_lipread_tpu.pipelines.audio import main as audio_main
    from multimodal_lipread_tpu.pipelines.common import decode_waveforms
    from multimodal_lipread_tpu.serving import export_pipeline_stablehlo, predict_audio_clips

    cfg = Config.from_dict(
        {
            "dataset": {"root_dir": glips_root, "num_classes": 4,
                        "input_size": 117, "streaming": True, "num_workers": 0},
            "model": {"name": "resnet"},
            "training": {"batch_size": 16, "epochs": 1, "learning_rate": 1e-3,
                         "weight_decay": 1e-4, "seed": 0},
            "output": {"base_dir": str(tmp_path / "run"), "plots": False},
        }
    )
    audio_main(cfg)
    ckpt = str(tmp_path / "run" / "models_trained" / "resnet_best.msgpack")
    assert os.path.exists(ckpt)

    out = str(tmp_path / "resnet_stream.stablehlo")
    export_pipeline_stablehlo(cfg, ckpt, "audio", out, batch_size=2)
    assert os.path.getsize(out) > 1000

    index = scan_glips(glips_root, exts=AUDIO_EXTS)
    clips = [e.path for e in index.by_split("test")][:2]
    waves = decode_waveforms(clips)
    assert waves.shape == (2, TARGET_SAMPLES)

    fn = jexport.deserialize(open(out, "rb").read())
    logits = np.asarray(fn.call(jnp.asarray(waves)))
    assert logits.shape == (2, 4) and np.isfinite(logits).all()

    # the exported graph must agree with the Python serving path
    ref = predict_audio_clips(cfg, ckpt, clips, batch_size=2)
    np.testing.assert_allclose(
        logits, np.asarray([r["logits"] for r in ref]), rtol=1e-4, atol=1e-5
    )


def test_bf16_serving_parity_with_f32_checkpoint():
    """An f32-trained checkpoint served with computation dtype bf16 must
    agree with f32 serving: identical top-1 on random inputs, logits within
    bf16 tolerance. This is the production serving recipe (bench.py serves
    every model bf16); the params stay f32 — only activations/matmuls drop
    precision (flax dtype semantics)."""
    from multimodal_lipread_tpu.models.audio import get_audio_model
    from multimodal_lipread_tpu.serving import Predictor

    rng = jax.random.PRNGKey(0)
    mel = np.random.default_rng(1).standard_normal((16, 80, 117)).astype(np.float32)
    f32 = get_audio_model("resnet", 4)
    variables = f32.init({"params": rng, "dropout": rng}, mel[:1], train=False)
    bf16 = get_audio_model("resnet", 4, dtype=jnp.bfloat16)

    logits_f32 = Predictor(model=f32, variables=variables, batch_size=16).predict_logits(mel)
    logits_bf16 = Predictor(model=bf16, variables=variables, batch_size=16).predict_logits(mel)
    assert logits_bf16.dtype == np.float32 or logits_bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.argmax(logits_f32, -1), np.argmax(np.asarray(logits_bf16, np.float32), -1))
    spread = np.abs(logits_f32).max()
    np.testing.assert_allclose(
        np.asarray(logits_bf16, np.float32), logits_f32, atol=0.05 * max(1.0, spread))


def test_load_test_harness():
    """Concurrent-client harness: correct request accounting, sane latency
    distribution ordering, and thread-safe shared use of one compiled fn."""
    from multimodal_lipread_tpu.models.cues import get_cue_model
    from multimodal_lipread_tpu.serving import Predictor, load_test

    model = get_cue_model("dense_nn", 4)
    rng = jax.random.PRNGKey(0)
    cue = np.random.default_rng(2).standard_normal((8, 768)).astype(np.float32)
    variables = model.init({"params": rng, "dropout": rng}, cue[:1], train=False)
    pred = Predictor(model=model, variables=variables, batch_size=8)

    stats = load_test(pred, (cue,), num_threads=3, requests_per_thread=4)
    assert stats["requests"] == 12
    assert stats["batch"] == 8
    assert 0 < stats["p50_ms"] <= stats["p90_ms"] <= stats["p99_ms"] <= stats["max_ms"]
    assert stats["throughput_clips_per_s"] > 0


def test_predictor_device_preproc_matches_precropped():
    """Serving from full frames + boxes (device-side crop in-graph) must
    give the logits the same model produces on the pre-cropped lips."""
    from flax import linen as nn

    from multimodal_lipread_tpu.ops.crop_resize import crop_resize_pad

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x.reshape(x.shape[0], -1))

    r = np.random.default_rng(3)
    frames = r.integers(0, 256, (6, 2, 72, 96, 3), np.uint8)
    boxes = np.tile(np.array([10, 5, 54, 49], np.int32), (6, 2, 1))
    lips = np.asarray(crop_resize_pad(frames, boxes))

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 44, 44, 3), jnp.float32))
    p_raw = Predictor(model=model, variables=variables, batch_size=4,
                      device_preproc=lambda f, b: (crop_resize_pad(f, b),))
    p_lips = Predictor(model=model, variables=variables, batch_size=4)
    np.testing.assert_allclose(
        p_raw.predict_logits(frames, boxes), p_lips.predict_logits(lips),
        rtol=1e-6,
    )
