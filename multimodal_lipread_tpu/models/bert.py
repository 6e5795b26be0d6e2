"""BERT-style cue text classifier, self-contained in Flax.

Port of the reference's BERT fine-tune pipeline (cues/models/bert.py:23-299,
cues/cue_master.py:14-234): token embeddings + position/type embeddings,
post-LN transformer encoder with GELU, [CLS] pooler (tanh), classification
head. The reference's fp16 low-VRAM variant ``bert_lite.py`` (truncated /
syntactically invalid in the reference at line 192 — never reproduced) maps
to ``dtype=jnp.bfloat16`` here, the TPU-native half precision.

Weights: ``bert_base_config()`` matches bert-base-uncased so HF checkpoints
convert 1:1 via ``convert_hf_bert`` (torch state_dict → Flax tree). Offline
(zero-egress) runs use ``HashingTokenizer`` + random init — a smaller config
via ``bert_tiny_config()`` keeps that trainable on the 4-class cue task.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-12


def bert_base_config() -> BertConfig:
    return BertConfig()


# Megatron-style tensor-parallel partition rules for BertClassifier params
# (trainer.TrainerConfig.param_partition_rules + parallel.mesh.get_mesh_2d).
# QKV projections are column-parallel over the heads axis — each model-axis
# shard computes its own heads' attention end-to-end — and the attention
# output projection is row-parallel (contracts the sharded heads axis; XLA
# inserts the all-reduce). The FFN is the classic column(intermediate) →
# row(output) pair. LayerNorms, embeddings, pooler, and the classification
# head stay replicated: at bert-base they are <4% of encoder parameters.
# num_heads and intermediate_size must divide the mesh's 'model' axis size.
BERT_TP_RULES = (
    (r"attention/(query|key|value)/kernel$", (None, "model", None)),
    (r"attention/(query|key|value)/bias$", ("model", None)),
    (r"attention/out/kernel$", ("model", None, None)),
    (r"intermediate/kernel$", (None, "model")),
    (r"intermediate/bias$", ("model",)),
    (r"(^|/)output/kernel$", ("model", None)),
)


def bert_tiny_config(vocab_size: int = 8192) -> BertConfig:
    """Small config for offline training without pretrained weights."""
    return BertConfig(vocab_size=vocab_size, hidden_size=128, num_layers=2,
                      num_heads=4, intermediate_size=256, max_position=64)


def bert_small_config(vocab_size: int = 8192) -> BertConfig:
    """4-layer tiny variant — deep enough for 4-stage pipeline studies
    (experiments/pp_study.py) while staying CPU-trainable."""
    return BertConfig(vocab_size=vocab_size, hidden_size=128, num_layers=4,
                      num_heads=4, intermediate_size=256, max_position=64)


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic: bool = True):
        c = self.config
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        words = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                         name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(c.max_position, c.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        types = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                         name="token_type_embeddings")(token_type_ids)
        x = words + pos + types
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        return nn.Dropout(c.dropout_rate)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        c = self.config
        # HF BERT applies attention_probs_dropout_prob (0.1) to the
        # attention probabilities, not just the projected outputs
        attn = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads, dtype=self.dtype,
            dropout_rate=c.dropout_rate, deterministic=deterministic,
            name="attention",
        )(x, x, mask=mask)
        attn = nn.Dropout(c.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="attention_norm")(x + attn)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        y = nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(x + y)


class BertClassifier(nn.Module):
    """BERT encoder + tanh pooler over [CLS] + classification head."""

    config: BertConfig
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, train: bool = False):
        c = self.config
        deterministic = not train
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        # (B, 1, 1, L) additive-mask convention handled by flax boolean mask
        mask = attention_mask[:, None, None, :].astype(bool)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, deterministic=deterministic
        )
        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer{i}")(
                x, mask=mask, deterministic=deterministic
            )
        pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0, :])
        pooled = jnp.tanh(pooled)
        pooled = nn.Dropout(c.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)


# Pipeline-parallel partition rule (parallel/pipeline.py): the stacked
# encoder (leading axis = num_layers) shards its layer axis over 'stage';
# the trailing "..." replicates each leaf's remaining dims whatever its rank.
# Embeddings, pooler, and head stay replicated (tiny next to the encoder).
BERT_PP_RULES = (((r"(^|/)encoder/"), ("stage", "...")),)


class PipelinedBertClassifier(nn.Module):
    """BertClassifier with a stacked, pipeline-parallel encoder.

    Same math as :class:`BertClassifier` — embeddings, ``num_layers`` post-LN
    transformer layers, tanh pooler over [CLS], classification head — but the
    encoder parameters live STACKED under one ``encoder`` collection (leading
    axis = num_layers) so they can shard over a ``(data, stage)`` mesh's
    'stage' axis and run under the GPipe ``shard_map``/``ppermute`` schedule
    (``parallel.pipeline.gpipe_apply``). With ``num_stages=1`` the encoder is
    a plain ``lax.scan`` over the stack — the single-device/parity path.

    Checkpoints interoperate with BertClassifier via
    ``stack_bert_layers`` / ``unstack_bert_layers``.
    """

    config: BertConfig
    num_classes: int
    num_stages: int = 1
    num_microbatches: int = 0  # 0 → defaults to num_stages
    mesh: Any = None  # required (data, stage) Mesh when num_stages > 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, train: bool = False):
        import jax

        from multimodal_lipread_tpu.parallel.pipeline import (
            gpipe_apply,
            sequential_apply,
        )

        c = self.config
        deterministic = not train
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        mask = attention_mask[:, None, None, :].astype(bool)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, deterministic=deterministic
        )

        layer_mod = BertLayer(c, dtype=self.dtype)
        seq = input_ids.shape[1]

        from multimodal_lipread_tpu.parallel import pipeline as _pp

        # inside the PP train step's shard_map the provided params are the
        # LOCAL layer slice — declare the local leading axis so flax's
        # shape check matches (the initializer itself never runs there)
        lead = (
            c.num_layers // self.num_stages if _pp.in_mesh() else c.num_layers
        )

        def init_stacked(rng):
            def one(r):
                return layer_mod.init(
                    {"params": r},
                    jnp.zeros((1, seq, c.hidden_size), self.dtype),
                    mask=jnp.ones((1, 1, 1, seq), bool),
                    deterministic=True,
                )["params"]

            return jax.vmap(one)(jax.random.split(rng, lead))

        stacked = self.param("encoder", init_stacked)

        def apply_layer(p, h, mask_mb, key):
            rngs = {"dropout": key} if key is not None else None
            return layer_mod.apply(
                {"params": p}, h, mask=mask_mb, deterministic=deterministic,
                rngs=rngs,
            )

        use_key = (not deterministic) and c.dropout_rate > 0.0
        base_key = self.make_rng("dropout") if use_key else None
        if self.num_stages > 1:
            if self.mesh is None:
                raise ValueError("num_stages > 1 requires a (data, stage) mesh")
            x = gpipe_apply(
                apply_layer, stacked, x, mask,
                mesh=self.mesh,
                num_microbatches=self.num_microbatches or self.num_stages,
                dropout_key=base_key,
            )
        else:
            x = sequential_apply(apply_layer, stacked, x, mask, base_key)

        pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0, :])
        pooled = jnp.tanh(pooled)
        pooled = nn.Dropout(c.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)


def stack_bert_layers(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """BertClassifier params (layer0..layerN-1) → PipelinedBertClassifier
    params (one stacked ``encoder`` tree, leading axis = num_layers)."""
    import jax

    layers = [params[f"layer{i}"] for i in range(num_layers)]
    out = {
        k: v for k, v in params.items() if not re.fullmatch(r"layer\d+", k)
    }
    out["encoder"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return out


def unstack_bert_layers(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Inverse of :func:`stack_bert_layers` — PP checkpoints restore as the
    standard per-layer BertClassifier tree (mesh-elastic resume story)."""
    import jax

    out = {k: v for k, v in params.items() if k != "encoder"}
    for i in range(num_layers):
        out[f"layer{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], params["encoder"]
        )
    return out


class HashingTokenizer:
    """Deterministic offline tokenizer: hashed word-piece-free vocabulary.

    ids: 0 = pad, 1 = [CLS], 2 = [SEP], words hashed into [3, vocab_size)."""

    def __init__(self, vocab_size: int = 8192, max_length: int = 32):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.max_length), np.int32)
        for i, text in enumerate(texts):
            ids = [1]  # [CLS]
            for tok in re.findall(r"[a-z0-9']+", text.lower()):
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
                ids.append(3 + h % (self.vocab_size - 3))
                if len(ids) >= self.max_length - 1:
                    break
            ids.append(2)  # [SEP]
            out[i, : len(ids)] = ids
        return out


def tokenize_texts(
    texts: Sequence[str], max_length: int = 32, vocab_size: int = 8192,
    hf_model: Optional[str] = "bert-base-uncased",
) -> np.ndarray:
    """HF tokenizer when locally cached, hashing fallback otherwise."""
    if hf_model:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(hf_model, local_files_only=True)
            enc = tok(list(texts), truncation=True, padding="max_length",
                      max_length=max_length, return_tensors="np")
            return enc["input_ids"].astype(np.int32)
        except Exception:
            pass
    return HashingTokenizer(vocab_size, max_length)(texts)


def convert_hf_bert(src: Any, config: BertConfig) -> Dict[str, Any]:
    """HF bert-base torch state_dict → BertClassifier encoder params.

    Accepts a .pth path or mapping (see utils.torch_import.load_state_dict).
    The classifier head stays randomly initialized (fine-tuning).
    """
    from multimodal_lipread_tpu.utils.torch_import import load_state_dict

    sd = load_state_dict(src)

    def dense(key):
        return {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0)), "bias": sd[f"{key}.bias"]}

    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    H, nh = config.hidden_size, config.num_heads
    hd = H // nh

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["bert.embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["bert.embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["bert.embeddings.token_type_embeddings.weight"]},
            "layer_norm": ln("bert.embeddings.LayerNorm"),
        },
        "pooler": dense("bert.pooler.dense"),
    }
    for i in range(config.num_layers):
        p = f"bert.encoder.layer.{i}"

        def qkv(key):
            w = np.transpose(sd[f"{key}.weight"], (1, 0)).reshape(H, nh, hd)
            b = sd[f"{key}.bias"].reshape(nh, hd)
            return {"kernel": w, "bias": b}

        out_w = np.transpose(sd[f"{p}.attention.output.dense.weight"], (1, 0)).reshape(nh, hd, H)
        params[f"layer{i}"] = {
            "attention": {
                "query": qkv(f"{p}.attention.self.query"),
                "key": qkv(f"{p}.attention.self.key"),
                "value": qkv(f"{p}.attention.self.value"),
                "out": {"kernel": out_w, "bias": sd[f"{p}.attention.output.dense.bias"]},
            },
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    if "classifier.weight" in sd:  # BertForSequenceClassification head
        params["classifier"] = dense("classifier")
    return params
