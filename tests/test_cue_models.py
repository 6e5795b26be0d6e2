"""Cue classifier shape tests + cue data layer + cues pipeline e2e."""

import os

import jax
import numpy as np
import pytest

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.cues import (
    EMBED_DIMS,
    HashingEmbedder,
    embed_cached,
    load_cue_records,
)
from multimodal_lipread_tpu.models.cues import (
    CUE_MODEL_NAMES,
    cue_embedding_kind,
    get_cue_model,
)

NUM_CLASSES = 4
BATCH = 3


def _input_for(kind: str) -> np.ndarray:
    rng = np.random.default_rng(0)
    if kind == "tfidf":
        return rng.random((BATCH, 5000), np.float32)
    if kind == "bert_tok":
        ids = rng.integers(3, 100, size=(BATCH, 32)).astype(np.int32)
        ids[:, -4:] = 0  # padding tail exercises the attention mask
        return ids
    if kind.endswith("_tok"):
        return rng.standard_normal((BATCH, 32, EMBED_DIMS[kind[:-4]])).astype(np.float32)
    return rng.standard_normal((BATCH, EMBED_DIMS[kind])).astype(np.float32)


@pytest.mark.parametrize("name", CUE_MODEL_NAMES)
def test_cue_model_output_shape(name):
    kind = cue_embedding_kind(name)
    model = get_cue_model(name, NUM_CLASSES)
    x = _input_for(kind)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (BATCH, NUM_CLASSES)
    assert np.all(np.isfinite(np.asarray(out)))


def test_load_cue_records(glips_root):
    records = load_cue_records(glips_root, "emotion")
    assert len(records) == 48  # 4 words x 3 splits x 4 clips
    assert {r.split for r in records} == {"train", "val", "test"}
    r = records[0]
    assert r.word and r.sequence_id and r.description


def test_hashing_embedder_deterministic():
    e = HashingEmbedder(64)
    a = e.encode(["a calm speaker", "a calm speaker", "bright backdrop"])
    assert a.shape == (3, 64)
    np.testing.assert_allclose(a[0], a[1])
    assert not np.allclose(a[0], a[2])
    toks = e.encode_tokens(["a calm speaker"], max_length=8)
    assert toks.shape == (1, 8, 64)
    assert np.abs(toks[0, 3]).sum() == 0  # padding rows are zero


def test_embed_cached_roundtrip(glips_root, tmp_path):
    descs = ["one two", "three four"]
    e = HashingEmbedder(EMBED_DIMS["mpnet"])
    first = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=e)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 1
    # second call hits the cache even without an embedder
    second = embed_cached(descs, "mpnet", cache_dir=str(tmp_path), embedder=None)
    np.testing.assert_allclose(first, second)


def test_cues_pipeline_end_to_end(glips_root, tmp_path):
    from multimodal_lipread_tpu.pipelines.cues import main as cues_main

    cfg = Config.from_dict(
        {
            "dataset": {"cue_root": glips_root, "cue_mode": "emotion",
                        "cache_dir": str(tmp_path / "cache")},
            "model": {"name": "dense_nn"},
            "training": {"batch_size": 8, "epochs": 2, "learning_rate": 1e-3},
            "output": {"base_dir": str(tmp_path / "cues")},
        }
    )
    result = cues_main(cfg)
    assert len(result["history"]) == 2
    csv_path = tmp_path / "cues" / "metrics" / "dense_nn_training_log.csv"
    header = csv_path.read_text().splitlines()[0]
    assert header == "epoch,train_loss,train_acc,val_loss,val_acc"  # train/val-only schema


def test_hf_cache_probe(tmp_path, monkeypatch):
    """_local_hf_weights_available is a pure filesystem probe: True only
    when the hub cache holds the model dir, honoring HF_HOME /
    HUGGINGFACE_HUB_CACHE (guards the zero-egress fast path that skips the
    torch/transformers import)."""
    from multimodal_lipread_tpu.data.cues import _local_hf_weights_available

    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    name = "sentence-transformers/all-mpnet-base-v2"
    assert not _local_hf_weights_available(name)
    (tmp_path / "hub" / ("models--" + name.replace("/", "--"))).mkdir(parents=True)
    assert _local_hf_weights_available(name)
    # explicit HUGGINGFACE_HUB_CACHE wins over HF_HOME
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(tmp_path / "elsewhere"))
    assert not _local_hf_weights_available(name)
    # and HF_HUB_CACHE (huggingface_hub's primary variable) wins over both
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    assert _local_hf_weights_available(name)


def test_get_token_embedder_falls_back_without_cache(tmp_path, monkeypatch):
    from multimodal_lipread_tpu.data.cues import get_token_embedder, HashingEmbedder

    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))  # empty: no weights cached
    e = get_token_embedder("mpnet", allow_fallback=True)
    assert isinstance(e, HashingEmbedder)
    with pytest.raises(RuntimeError, match="local"):
        get_token_embedder("mpnet", allow_fallback=False)
