"""Textual-cue loading and sentence-embedding cache.

Reproduces the reference's cue data contract (SURVEY.md §1):

- cue store: ``<cue_root>/Descriptions_{Emotion,Environment}/
  lipreading_analysis_results_{mode}_{word}_{split}.json`` with records
  ``{word, sequence_id, description}``
  (reference: audio_cues/data_utils/dataset.py:46-70)
- embeddings computed ONCE per description set and cached to ``.npz`` keyed
  by md5 of the descriptions + model name
  (reference: audio_cues/data_utils/dataset.py:105-122)

Embedding backends:

- ``SentenceTransformerEmbedder`` — sentence-transformers MiniLM-L6 (384-d) /
  mpnet (768-d) / their concat "ensemble" (1152-d), exactly the reference's
  models (cues/models/minilm_models/dense.py:29, transformer.py:30-33).
  Requires locally cached HF weights.
- ``HashingEmbedder`` — deterministic, dependency-free fallback with the SAME
  dimensions: token-hash random projections (seeded per token) mean-pooled and
  L2-normalized. Used automatically when HF weights are unavailable (zero-
  egress environments, CI) so every downstream pipeline stays runnable; swap
  in the transformer backend for accuracy parity runs.
- token-level variants returning (N, max_len, D) for the cnn_lstm-family
  classifiers (reference: cues/models/minilm_models/cnn_lstm.py:66-86).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

EMBED_DIMS = {"minilm": 384, "mpnet": 768, "ensemble": 1152, "distilbert": 768}
_CUE_FILE_RE = re.compile(r"lipreading_analysis_results_(\w+?)_(.+)_(train|val|test)\.json$")


@dataclass(frozen=True)
class CueRecord:
    word: str
    split: str
    sequence_id: str
    description: str

    @property
    def key(self) -> Tuple[str, str, str]:
        return (self.word, self.sequence_id, self.split)


def cue_dir(cue_root: str, mode: str) -> str:
    """``Descriptions_Emotion`` / ``Descriptions_Environment`` folder."""
    return os.path.join(cue_root, f"Descriptions_{mode.capitalize()}")


def load_cue_records(
    cue_root: str,
    mode: str = "emotion",
    splits: Optional[Sequence[str]] = None,
) -> List[CueRecord]:
    """Load every cue JSON for one mode; split parsed from the filename
    (reference: audio_cues/data_utils/dataset.py:50-60)."""
    folder = cue_dir(cue_root, mode)
    if not os.path.isdir(folder):
        raise FileNotFoundError(f"Cue directory not found: {folder}")
    records: List[CueRecord] = []
    for name in sorted(os.listdir(folder)):
        m = _CUE_FILE_RE.match(name)
        if not m or m.group(1) != mode:
            continue
        split = m.group(3)
        if splits is not None and split not in splits:
            continue
        with open(os.path.join(folder, name)) as f:
            data = json.load(f)
        for rec in data:
            desc = rec.get("description")
            sid = rec.get("sequence_id")
            word = rec.get("word")
            if not desc or not sid or not word:
                continue
            records.append(CueRecord(word=word, split=split, sequence_id=sid, description=desc))
    return records


# --------------------------------------------------------------------- embedders


def canonical_embed_model(model: str) -> str:
    """Map full HF names (the reference configs use them, e.g.
    audio_cues/configs/ac_config.yaml 'sentence-transformers/all-mpnet-base-v2')
    to this module's short keys; reject unknown names cleanly."""
    aliases = {
        "sentence-transformers/all-minilm-l6-v2": "minilm",
        "all-minilm-l6-v2": "minilm",
        "sentence-transformers/all-mpnet-base-v2": "mpnet",
        "all-mpnet-base-v2": "mpnet",
        "distilbert-base-uncased": "distilbert",
    }
    key = aliases.get(model.lower(), model.lower())
    if key not in EMBED_DIMS:
        raise ValueError(
            f"Unknown cue embedding model '{model}'; expected one of "
            f"{sorted(EMBED_DIMS)} or a known sentence-transformers name"
        )
    return key


class HashingEmbedder:
    """Deterministic offline sentence embedder (see module docstring)."""

    cache_tag = "hash"

    def __init__(self, dim: int):
        self.dim = dim

    def _token_vec(self, token: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(token.encode()).digest()[:4], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def encode(self, sentences: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), np.float32)
        for i, sent in enumerate(sentences):
            tokens = re.findall(r"[a-z0-9']+", sent.lower())
            if not tokens:
                continue
            vecs = np.stack([self._token_vec(t) for t in tokens])
            v = vecs.mean(axis=0)
            out[i] = v / (np.linalg.norm(v) + 1e-9)
        return out

    def encode_tokens(self, sentences: Sequence[str], max_length: int = 32) -> np.ndarray:
        out = np.zeros((len(sentences), max_length, self.dim), np.float32)
        for i, sent in enumerate(sentences):
            tokens = re.findall(r"[a-z0-9']+", sent.lower())[:max_length]
            for j, t in enumerate(tokens):
                v = self._token_vec(t)
                out[i, j] = v / (np.linalg.norm(v) + 1e-9)
        return out


_ST_NAMES = {
    "minilm": "sentence-transformers/all-MiniLM-L6-v2",
    "mpnet": "sentence-transformers/all-mpnet-base-v2",
}
_TOKEN_MODEL_NAMES = {
    "mpnet": "sentence-transformers/all-mpnet-base-v2",
    "distilbert": "distilbert-base-uncased",
}


def _local_hf_weights_available(name: str) -> bool:
    """True iff the HF hub cache already holds `name` — a pure filesystem
    probe, so callers can skip the ~40 s torch/transformers import when a
    local_files_only load would fail anyway (zero-egress environments).
    Resolution order mirrors huggingface_hub: HF_HUB_CACHE >
    HUGGINGFACE_HUB_CACHE > HF_HOME/hub > ~/.cache/huggingface/hub."""
    cache = (
        os.environ.get("HF_HUB_CACHE")
        or os.environ.get("HUGGINGFACE_HUB_CACHE")
        or os.path.join(
            os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface")), "hub"
        )
    )
    return os.path.isdir(os.path.join(cache, "models--" + name.replace("/", "--")))


class SentenceTransformerEmbedder:
    """sentence-transformers backend (reference models); raises if weights
    are not locally available."""

    cache_tag = "st"

    def __init__(self, model: str = "mpnet", local_files_only: bool = True):
        if local_files_only:
            needed = (
                [_ST_NAMES["minilm"], _ST_NAMES["mpnet"]]
                if model == "ensemble" else [_ST_NAMES[model]]
            )
            missing = [n for n in needed if not _local_hf_weights_available(n)]
            if missing:
                raise RuntimeError(
                    f"no local HF cache for {missing}; pre-download with "
                    "tools/fetch_weights.py or pass local_files_only=False"
                )
        from sentence_transformers import SentenceTransformer  # noqa: deferred

        # local_files_only by default: in zero-egress environments a hub
        # download attempt hangs through minutes of network retries; users
        # with connectivity pre-download or pass local_files_only=False.
        def load(name):
            return SentenceTransformer(name, local_files_only=local_files_only)

        self.model_name = model
        if model == "ensemble":
            self._models = [load(_ST_NAMES["minilm"]), load(_ST_NAMES["mpnet"])]
        else:
            self._models = [load(_ST_NAMES[model])]
        self.dim = EMBED_DIMS[model]

    def encode(self, sentences: Sequence[str]) -> np.ndarray:
        embs = [m.encode(list(sentences), convert_to_numpy=True, show_progress_bar=False)
                for m in self._models]
        return np.concatenate(embs, axis=1).astype(np.float32)


def get_embedder(model: str = "mpnet", allow_fallback: bool = True):
    """Best available SENTENCE embedder ('minilm'|'mpnet'|'ensemble' or a
    full sentence-transformers name). Token-only models ('distilbert') are
    rejected here — use get_token_embedder."""
    model = canonical_embed_model(model)
    if model not in _ST_NAMES and model != "ensemble":
        raise ValueError(
            f"'{model}' is not a sentence-embedding model; "
            f"choose from {sorted(_ST_NAMES) + ['ensemble']}"
        )
    try:
        return SentenceTransformerEmbedder(model)
    except ValueError:
        raise
    except Exception:
        if not allow_fallback:
            raise
        return HashingEmbedder(EMBED_DIMS[model])


def get_token_embedder(model: str = "mpnet", max_length: int = 32, allow_fallback: bool = True):
    """Token-level embedder returning (N, max_length, D) arrays."""
    model = canonical_embed_model(model)
    if model not in _TOKEN_MODEL_NAMES:
        raise ValueError(
            f"'{model}' has no token-level backend; choose from {sorted(_TOKEN_MODEL_NAMES)}"
        )
    try:
        name = _TOKEN_MODEL_NAMES[model]
        if not _local_hf_weights_available(name):
            raise RuntimeError(
                f"no local HF cache for {name}; pre-download or use the hashing fallback"
            )
        import torch
        from transformers import AutoModel, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(name, local_files_only=True)
        hf_model = AutoModel.from_pretrained(name, local_files_only=True)
        hf_model.eval()

        class _HF:
            cache_tag = "hf"
            dim = hf_model.config.hidden_size

            def encode_tokens(self, sentences: Sequence[str], max_length: int = max_length) -> np.ndarray:
                outs = []
                with torch.no_grad():
                    for sent in sentences:
                        enc = tokenizer(sent, truncation=True, padding="max_length",
                                        max_length=max_length, return_tensors="pt")
                        hidden = hf_model(**enc).last_hidden_state.squeeze(0)
                        outs.append(hidden.numpy().astype(np.float32))
                return np.stack(outs)

        return _HF()
    except Exception:
        if not allow_fallback:
            raise
        return HashingEmbedder(EMBED_DIMS[model])


# --------------------------------------------------------------------- caching


def _cache_key(descriptions: Sequence[str], model: str) -> str:
    # length-prefix every field: without delimiters ['ab','c'] and ['a','bc']
    # would collide on the same digest
    h = hashlib.md5()
    h.update(f"{len(model)}:".encode())
    h.update(model.encode())
    h.update(f"n={len(descriptions)};".encode())
    for d in descriptions:
        b = d.encode()
        h.update(f"{len(b)}:".encode())
        h.update(b)
    return h.hexdigest()


def embed_cached(
    descriptions: Sequence[str],
    model: str = "mpnet",
    cache_dir: Optional[str] = None,
    embedder=None,
    token_level: bool = False,
    max_length: int = 32,
) -> np.ndarray:
    """Embed descriptions with an md5-keyed .npz cache
    (reference: audio_cues/data_utils/dataset.py:105-122).

    The cache key includes the resolved BACKEND (transformer vs hashing
    fallback), so offline fallback runs never poison the cache for real
    transformer runs or vice versa."""
    model = canonical_embed_model(model)
    if embedder is None:
        embedder = get_token_embedder(model, max_length) if token_level else get_embedder(model)
    backend = getattr(embedder, "cache_tag", type(embedder).__name__)
    # max_length is part of the token-level output shape → part of the key
    tag = f"{model}{f'_tok{max_length}' if token_level else ''}_{backend}"
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"cue_emb_{tag}_{_cache_key(descriptions, tag)}.npz")
        if os.path.exists(path):
            return np.load(path)["embeddings"]
    if token_level:
        embs = embedder.encode_tokens(descriptions, max_length=max_length)
    else:
        embs = embedder.encode(descriptions)
    if cache_dir:
        np.savez_compressed(path, embeddings=embs)
    return embs


def records_by_key(records: Sequence[CueRecord]) -> Dict[Tuple[str, str, str], CueRecord]:
    return {r.key: r for r in records}
