"""Textual-cue classifier zoo: the reference's 9 cue architectures, TPU-native.

Registry names follow the reference's metrics/log naming
(cues/{emotion,environment}_metrics/*, BASELINE.md):

- ``dense_nn``                → DenseClassifier MLP [512,256,256]
  (reference: cues/models/minilm_models/dense.py:63-77; MiniLM-L6 384-d input)
- ``minilm_lstm``             → Dense(256) → length-1 BiLSTM → head
  (reference: lstm_model.py:73-104)
- ``minilm_lstm_attn``        → + additive attention over the LSTM outputs
  (reference: lstm_attn.py:71-116)
- ``multi_attn``              → Dense(256) → 1-token MultiheadAttention → head
  (reference: multi_attn.py:68-95, "TransformerLiteClassifier")
- ``transformer``             → ensemble (MiniLM+mpnet, 1152-d) → stacked
  residual MultiheadAttention (reference: transformer.py:74-101)
- ``minilm_cnn_lstm``         → token-level (N,32,768) → multi-kernel Conv1d
  [2,3,4]×64 + max-pool → BiLSTM → head (reference: cnn_lstm.py:91-123)
- ``minilm_cnn_bilstm_attn``  → + MultiheadAttention after the BiLSTM
  (reference: cnn_lstm_attn.py:110-132)
- ``lstm_multi_attn``         → token-level → BiLSTM → MultiheadAttention →
  mean-pool head (reference: lstm_multi_attn.py:87-110)
- ``linear``                  → TF-IDF (5k, 1-2 grams) → SimpleMLP 512→128
  (reference: linear_model.py:96-110)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from multimodal_lipread_tpu.nn import BiLSTM, MultiHeadSelfAttention


class _Head(nn.Module):
    """Linear(·→128) → ReLU → Dropout → Linear(128→C), the recurring cue head."""

    num_classes: int
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class DenseClassifier(nn.Module):
    """(reference: cues/models/minilm_models/dense.py:63-77)"""

    num_classes: int
    hidden_dims: Sequence[int] = (512, 256, 256)
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out")(x)


class _InputDense(nn.Module):
    """Dense → ReLU → Dropout(0.2) projection (reference: lstm_model.py:78-82)."""

    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.dim, dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        return nn.Dropout(0.2)(x, deterministic=not train)


class LSTMClassifier(nn.Module):
    """(reference: lstm_model.py:73-104); hidden_dim=128 default per its main()."""

    num_classes: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _InputDense(dtype=self.dtype, name="input_dense")(x, train)
        seq = x[:, None, :]  # length-1 sequence, as in the reference
        out = BiLSTM(self.hidden_dim, 1, dtype=self.dtype, name="lstm")(seq)
        return _Head(self.num_classes, dtype=self.dtype, name="head")(out[:, -1, :], train)


class AttentionLSTMClassifier(nn.Module):
    """(reference: lstm_attn.py:71-116)"""

    num_classes: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _InputDense(dtype=self.dtype, name="input_dense")(x, train)
        seq = x[:, None, :]
        out = BiLSTM(self.hidden_dim, 1, dtype=self.dtype, name="lstm")(seq)
        scores = nn.Dense(1, dtype=self.dtype, name="attention")(out)  # (B, 1, 1)
        weights = nn.softmax(scores, axis=1)
        attended = jnp.sum(weights * out, axis=1)
        return _Head(self.num_classes, dtype=self.dtype, name="head")(attended, train)


class TransformerLiteClassifier(nn.Module):
    """1-token multi-head self-attention (reference: multi_attn.py:68-95)."""

    num_classes: int
    hidden_dim: int = 256
    num_heads: int = 4
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        seq = x[:, None, :]
        attn = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype, name="attention")(
            seq, deterministic=not train
        )
        return _Head(self.num_classes, self.dropout_rate, dtype=self.dtype,
                     name="head")(attn[:, 0, :], train)


class MultiAttentionClassifier(nn.Module):
    """Stacked residual self-attention over the ensemble embedding
    (reference: transformer.py:74-101)."""

    num_classes: int
    hidden_dim: int = 512
    num_heads: int = 8
    num_layers: int = 2
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        seq = x[:, None, :]
        for i in range(self.num_layers):
            attn = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                          name=f"attn{i}")(seq, deterministic=not train)
            seq = attn + seq  # residual
        return _Head(self.num_classes, self.dropout_rate, dtype=self.dtype,
                     name="head")(seq[:, 0, :], train)


class _MultiKernelConv(nn.Module):
    """Conv1d kernels [2,3,4]×64 + ReLU + max-over-time, concatenated
    (reference: cnn_lstm.py:95-117). Input (B, T, D) → (B, 192)."""

    kernel_sizes: Sequence[int] = (2, 3, 4)
    n_filters: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for k in self.kernel_sizes:
            y = nn.Conv(self.n_filters, (k,), padding="VALID", dtype=self.dtype,
                        name=f"conv{k}")(x)
            y = nn.relu(y)
            outs.append(jnp.max(y, axis=1))  # max over time
        return jnp.concatenate(outs, axis=-1)


class CNNLSTMClassifier(nn.Module):
    """(reference: cnn_lstm.py:91-123); token-level input (B, 32, 768)."""

    num_classes: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cnn_out = _MultiKernelConv(dtype=self.dtype, name="convs")(x)
        seq = cnn_out[:, None, :]
        out = BiLSTM(self.hidden_dim, 1, dtype=self.dtype, name="lstm")(seq)
        return _Head(self.num_classes, dtype=self.dtype, name="head")(out[:, -1, :], train)


class CNNBiLSTMAttn(nn.Module):
    """(reference: cnn_lstm_attn.py:110-132)"""

    num_classes: int
    hidden_dim: int = 128
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cnn_out = _MultiKernelConv(dtype=self.dtype, name="convs")(x)
        seq = cnn_out[:, None, :]
        out = BiLSTM(self.hidden_dim, 1, dtype=self.dtype, name="lstm")(seq)
        attn = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                      name="self_attn")(out, deterministic=not train)
        pooled = jnp.mean(attn, axis=1)
        return _Head(self.num_classes, dtype=self.dtype, name="head")(pooled, train)


class MultiHeadSelfAttentionLSTM(nn.Module):
    """(reference: lstm_multi_attn.py:87-110); token-level input (B, 32, 768)."""

    num_classes: int
    hidden_dim: int = 128
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = BiLSTM(self.hidden_dim, 1, dtype=self.dtype, name="lstm")(x)
        attn = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                      name="self_attn")(out, deterministic=not train)
        pooled = jnp.mean(attn, axis=1)
        return _Head(self.num_classes, dtype=self.dtype, name="head")(pooled, train)


class SimpleMLP(nn.Module):
    """TF-IDF baseline MLP (reference: linear_model.py:96-110)."""

    num_classes: int
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(128, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out")(x)


# (model, embedding kind) registry. Embedding kinds:
#   sentence: 'minilm' | 'mpnet' | 'ensemble'; token: 'mpnet_tok' | 'distilbert_tok';
#   'tfidf' for the linear baseline.
CUE_MODEL_SPECS = {
    "bert": (None, "bert_tok"),       # BertClassifier; built in get_cue_model
    "bert_lite": (None, "bert_tok"),  # bf16 variant (reference bert_lite.py intent)
    "dense_nn": (DenseClassifier, "minilm"),
    "minilm_lstm": (LSTMClassifier, "mpnet"),
    "minilm_lstm_attn": (AttentionLSTMClassifier, "mpnet"),
    "multi_attn": (TransformerLiteClassifier, "mpnet"),
    "transformer": (MultiAttentionClassifier, "ensemble"),
    "minilm_cnn_lstm": (CNNLSTMClassifier, "mpnet_tok"),
    "minilm_cnn_bilstm_attn": (CNNBiLSTMAttn, "mpnet_tok"),
    "lstm_multi_attn": (MultiHeadSelfAttentionLSTM, "distilbert_tok"),
    "linear": (SimpleMLP, "tfidf"),
}

CUE_MODEL_NAMES = tuple(CUE_MODEL_SPECS)


def get_cue_model(
    name: str, num_classes: int, dtype: Any = jnp.float32, bert_size: str = "tiny",
    pipeline_stages: int = 0, mesh: Any = None, num_microbatches: int = 0,
) -> nn.Module:
    if name not in CUE_MODEL_SPECS:
        raise ValueError(f"Unknown cue model: {name}")
    if pipeline_stages > 1 and name not in ("bert", "bert_lite"):
        raise ValueError(
            "training.pipeline_parallel > 1 is only supported for the BERT "
            f"cue models (got model.name={name!r})"
        )
    if name in ("bert", "bert_lite"):
        from multimodal_lipread_tpu.models.bert import (
            BertClassifier,
            PipelinedBertClassifier,
            bert_base_config,
            bert_small_config,
            bert_tiny_config,
        )

        bert_dtype = jnp.bfloat16 if name == "bert_lite" else dtype
        cfg = {"base": bert_base_config, "small": bert_small_config}.get(
            bert_size, bert_tiny_config
        )()
        if pipeline_stages > 1:
            if cfg.num_layers % pipeline_stages:
                raise ValueError(
                    f"{cfg.num_layers} encoder layers not divisible by "
                    f"pipeline_parallel={pipeline_stages}"
                )
            return PipelinedBertClassifier(
                cfg, num_classes, num_stages=pipeline_stages, mesh=mesh,
                num_microbatches=num_microbatches, dtype=bert_dtype,
            )
        if bert_size in ("base", "small"):
            return BertClassifier(cfg, num_classes, dtype=bert_dtype)
        # The reference fine-tunes PRETRAINED bert-base-uncased
        # (cues/models/bert.py:33); this zero-egress default is a tiny
        # random-init BERT — accuracy will NOT match the reference unless
        # you pass bert_size='base' (model.bert_size in the cues config)
        # and graft real weights via utils.torch_import.convert_hf_bert.
        import warnings

        warnings.warn(
            "cue model '%s' defaults to a tiny random-init BERT; the "
            "reference uses fine-tuned bert-base-uncased — set "
            "model.bert_size: base and graft pretrained weights for parity"
            % name,
            stacklevel=2,
        )
        return BertClassifier(bert_tiny_config(), num_classes, dtype=bert_dtype)
    cls, _kind = CUE_MODEL_SPECS[name]
    return cls(num_classes, dtype=dtype)


def cue_embedding_kind(name: str) -> str:
    return CUE_MODEL_SPECS[name][1]
