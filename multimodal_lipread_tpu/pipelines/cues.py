"""Textual-cue classification pipeline.

Equivalent of the reference's cue classifier trainers
(cues/models/minilm_models/dense.py:174-216 and siblings): pool every cue
record for one mode, encode labels over the sorted word set, embed
descriptions per the model's embedding kind, split 90/10 train/val with a
fixed seed (reference: dense.py:185-186 train_test_split(test_size=0.1,
seed=42)), train with Adam + balanced class-weighted CE
(reference: dense.py:198-201), and log train/val-only CSV/TXT
(reference: dense.py:82-103).

If the cue store carries explicit _train/_val/_test split files (the newer
layout), those can be used directly via ``dataset.use_file_splits: true``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.cues import (
    CueRecord,
    embed_cached,
    load_cue_records,
)
from multimodal_lipread_tpu.models.cues import cue_embedding_kind, get_cue_model
from multimodal_lipread_tpu.pipelines.common import default_dirs, parse_cli
from multimodal_lipread_tpu.pipelines.common import maybe_plot, model_dtype, trainer_extras
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def balanced_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """sklearn compute_class_weight('balanced') (reference: dense.py:198-201)."""
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    return (len(labels) / (num_classes * counts)).astype(np.float32)


def _featurize(
    records: List[CueRecord], kind: str, cache_dir: str | None,
    bert_size: str = "tiny",
) -> np.ndarray:
    descs = [r.description for r in records]
    if kind == "tfidf":
        from sklearn.feature_extraction.text import TfidfVectorizer

        vec = TfidfVectorizer(max_features=5000, ngram_range=(1, 2), stop_words="english")
        return vec.fit_transform(descs).toarray().astype(np.float32)
    if kind == "bert_tok":
        from multimodal_lipread_tpu.models.bert import tokenize_texts

        # the tokenizer must match the classifier's vocab: the default tiny
        # BERT has vocab 8192 (bert_tiny_config) — HF bert-base ids (up to
        # 30521) would be silently clamped by Embed into garbage rows.
        # bert_size='base' (real fine-tuning) uses the HF tokenizer.
        return tokenize_texts(
            descs, hf_model="bert-base-uncased" if bert_size == "base" else None
        )
    if kind.endswith("_tok"):
        return embed_cached(descs, model=kind[:-4], cache_dir=cache_dir, token_level=True)
    return embed_cached(descs, model=kind, cache_dir=cache_dir)


def load_cue_classification_data(
    cue_root: str,
    mode: str,
    kind: str,
    cache_dir: str | None = None,
    val_fraction: float = 0.1,
    seed: int = 42,
    use_file_splits: bool = False,
    bert_size: str = "tiny",
) -> Tuple[Dict[str, ArrayDataset], List[str]]:
    records = load_cue_records(cue_root, mode)
    if not records:
        raise RuntimeError(f"No cue records for mode '{mode}' under {cue_root}")
    classes = sorted({r.word for r in records})
    class_to_idx = {w: i for i, w in enumerate(classes)}

    feats = _featurize(records, kind, cache_dir, bert_size=bert_size)
    labels = np.asarray([class_to_idx[r.word] for r in records], np.int32)

    datasets: Dict[str, ArrayDataset] = {}
    if use_file_splits:
        for split in ("train", "val", "test"):
            m = np.asarray([r.split == split for r in records])
            if m.any():
                datasets[split] = ArrayDataset(inputs=(feats[m],), labels=labels[m])
        for required in ("train", "val"):
            if required not in datasets:
                raise RuntimeError(
                    f"use_file_splits=true but no cue records carry split '{required}' — "
                    f"check the _{required} JSON files under the cue store"
                )
    else:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(records))
        n_val = max(1, int(round(val_fraction * len(records))))
        val_idx, train_idx = order[:n_val], order[n_val:]
        datasets["train"] = ArrayDataset(inputs=(feats[train_idx],), labels=labels[train_idx])
        datasets["val"] = ArrayDataset(inputs=(feats[val_idx],), labels=labels[val_idx])
    return datasets, classes




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    cue_root = cfg.get("dataset.cue_root") or cfg.get("dataset.root_dir")
    mode = cfg.get("dataset.cue_mode", "emotion")
    model_name = cfg.get("model.name", "dense_nn")
    kind = cfg.get("model.embedding", cue_embedding_kind(model_name))
    cache_dir = cfg.get("dataset.cache_dir")

    datasets, classes = load_cue_classification_data(
        cue_root, mode, kind, cache_dir=cache_dir,
        val_fraction=cfg.get("training.val_fraction", 0.1),
        seed=cfg.get("training.split_seed", 42),
        use_file_splits=cfg.get("dataset.use_file_splits", False),
        bert_size=cfg.get("model.bert_size", "tiny"),
    )
    num_classes = len(classes)
    class_weights = balanced_class_weights(datasets["train"].labels, num_classes)

    metrics_dir, ckpt_dir = default_dirs(cfg, f"cues_{mode}")
    # opt-in model parallelism for the BERT fine-tune — the one reference
    # family near scale (bert-base 110M params, 12 uniform layers):
    #   training.tensor_parallel=K   — Megatron-style weight sharding over a
    #                                  (data, model=K) 2-D mesh
    #   training.pipeline_parallel=S — GPipe stage sharding over a
    #                                  (data, stage=S) 2-D mesh
    #                                  (+ training.pipeline_microbatches)
    # Mutually exclusive (one 2-D mesh each; a 3-D composition is not a
    # reference-scale need — docs/PARALLELISM.md).
    mesh = None
    partition_rules = ()
    tp = int(cfg.get("training.tensor_parallel", 1))
    pp = int(cfg.get("training.pipeline_parallel", 1))
    if tp > 1 and pp > 1:
        raise ValueError(
            "training.tensor_parallel and training.pipeline_parallel are "
            "mutually exclusive — pick one 2-D mesh"
        )
    if tp > 1:
        if model_name not in ("bert", "bert_lite"):
            raise ValueError(
                "training.tensor_parallel > 1 is only supported for the BERT "
                f"cue models (got model.name={model_name!r})"
            )
        from multimodal_lipread_tpu.models.bert import BERT_TP_RULES
        from multimodal_lipread_tpu.parallel.mesh import get_mesh_2d

        mesh = get_mesh_2d(tp)
        partition_rules = BERT_TP_RULES
    elif pp > 1:
        from multimodal_lipread_tpu.models.bert import BERT_PP_RULES
        from multimodal_lipread_tpu.parallel.pipeline import get_mesh_pp

        mesh = get_mesh_pp(pp)
        partition_rules = BERT_PP_RULES
    model = get_cue_model(
        model_name, num_classes, dtype=model_dtype(cfg),
        bert_size=cfg.get("model.bert_size", "tiny"),
        pipeline_stages=pp, mesh=mesh if pp > 1 else None,
        num_microbatches=int(cfg.get("training.pipeline_microbatches", 0)),
    )
    trainer = Trainer(
        model,
        TrainerConfig(
            param_partition_rules=partition_rules,
            model_name=model_name,
            num_classes=num_classes,
            batch_size=cfg.get("training.batch_size", 8),
            epochs=cfg.get("training.epochs", 30),
            learning_rate=cfg.get("training.learning_rate", 1e-3),
            weight_decay=cfg.get("training.weight_decay", 0.0),
            scheduler_factor=1.0,  # sentence-level cue trainers have no plateau scheduler
            # token-level and BERT cue trainers use linear warmup (reference:
            # cues/models/minilm_models/cnn_lstm.py:177-178, WARMUP_PROPORTION=0.1)
            lr_schedule=(
                "linear_warmup"
                if (kind.endswith("_tok") or kind == "bert_tok")
                else "plateau"
            ),
            warmup_proportion=cfg.get("training.warmup_proportion", 0.1),
            seed=cfg.get("training.seed", 42),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            log_columns="train_val",  # reference: dense.py:82-103
            test_every_epoch=False,
            class_weights=class_weights,
            # opt-in per-epoch checkpoint so --resume has something to
            # resume from (the reference cue trainers save best-val only)
            rolling_checkpoint=cfg.get("training.rolling_checkpoint", False),
            **trainer_extras(cfg),
        ),
        mesh=mesh,
    )
    result = trainer.fit(
        datasets["train"], datasets["val"], datasets.get("test"), resume=resume
    )
    maybe_plot(cfg, metrics_dir)
    return result


if __name__ == "__main__":
    _cfg = parse_cli()
    main(_cfg, resume=bool(_cfg.get("_cli.resume", False)))
