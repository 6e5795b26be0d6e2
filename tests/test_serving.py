"""Serving tests: checkpoint → Predictor → predictions; StableHLO export."""

import os

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
