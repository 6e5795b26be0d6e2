"""Video + textual-cue fusion pipeline.

Equivalent of ``python cues_video/train.py`` (reference:
cues_video/train.py:86-237): aligns cue records to lip-region sequences
(reference: cues_video/data_utils/dataset.py:119-146), embeds descriptions
with the md5 cache, trains with Adam + weight decay + plateau-min scheduler
and best-val checkpointing. The reference's per-batch string-label encoding
(train.py:94,125) is replaced by one deterministic class list built from the
training words — the same mapping, computed once.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.cues import embed_cached, load_cue_records, records_by_key
from multimodal_lipread_tpu.data.glips import SPLITS, scan_lip_regions
from multimodal_lipread_tpu.models.cues_video import get_cues_video_model
from multimodal_lipread_tpu.models.cues_video import FROZEN_PARAM_PREFIXES
from multimodal_lipread_tpu.pipelines.common import default_dirs, load_lip_sequences, parse_cli
from multimodal_lipread_tpu.pipelines.common import maybe_plot, model_dtype, trainer_extras
from multimodal_lipread_tpu.pipelines.video import resolve_lip_root
from multimodal_lipread_tpu.pipelines.common import load_pretrained_backbones
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def load_cue_video_datasets(
    cue_root: str,
    lip_root: str,
    cue_mode: str = "emotion",
    embed_model: str = "mpnet",
    cache_dir: str | None = None,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], list]:
    lip_index = scan_lip_regions(lip_root)
    cue_map = records_by_key(load_cue_records(cue_root, cue_mode))
    # reference fits its LabelEncoder on the ALIGNED train-split words only
    # (cues_video/train.py:68-72) — a word with lips but no train-split cue
    # coverage must not widen the classifier head
    classes = sorted({
        e.word for e in lip_index.by_split("train") if e.key in cue_map
    })
    class_to_idx = {w: i for i, w in enumerate(classes)}

    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = [e for e in lip_index.by_split(split) if e.key in cue_map]
        if not entries:
            raise RuntimeError(f"No aligned cue+video samples for split '{split}'")
        uncovered = sorted({e.word for e in entries} - set(class_to_idx))
        if uncovered:
            # a val/test word whose train split has no cue coverage cannot be
            # encoded — the reference's LabelEncoder (cues_video/train.py:68-72,
            # fitted on train words only) fails on such labels too; name the
            # words instead of dying with a bare KeyError
            raise ValueError(
                f"split '{split}' has words with no train-split cue coverage "
                f"(absent from the fitted class set): {uncovered}"
            )
        lips = load_lip_sequences([e.path for e in entries])
        cues = embed_cached([cue_map[e.key].description for e in entries],
                            model=embed_model, cache_dir=cache_dir)
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(cues, lips), labels=labels)
    return datasets, classes




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    lip_root = resolve_lip_root(cfg)  # honors dataset.lip_regions_root
    datasets, classes = load_cue_video_datasets(
        cfg.get("dataset.cue_root") or cfg.get("dataset.root_dir"),
        lip_root,
        cue_mode=cfg.get("dataset.cue_mode", "emotion"),
        embed_model=cfg.get("dataset.embed_model", "mpnet"),
        cache_dir=cfg.get("dataset.cache_dir"),
    )
    num_classes = cfg.get("dataset.num_classes", len(classes))
    if num_classes != len(classes):
        raise ValueError(f"config says {num_classes} classes but found {len(classes)}: {classes}")
    # reference schema first (cv_config.yaml uses train.model_name/batch/lr/
    # epochs and train.metrics_dir/save_dir), extended keys as fallback
    model_name = (cfg.get("train.model_name") or cfg.get("model.name")
                  or "middle_fusion_mobile")

    metrics_dir, ckpt_dir = default_dirs(cfg, "cues_video")
    metrics_dir = cfg.get("train.metrics_dir", metrics_dir)
    ckpt_dir = cfg.get("train.save_dir", ckpt_dir)
    # frozen-feature caching: precompute the frozen MobileNet per-frame
    # features once; only the BiLSTM + fusion tail trains (see
    # train/frozen_cache.py). Requires frozen_bn_eval for determinism.
    cache_frozen = bool(
        cfg.get("training.cache_frozen_features", cfg.get("train.cache_frozen_features", False))
    ) and model_name in FROZEN_PARAM_PREFIXES
    frozen_bn_eval = cache_frozen or bool(
        cfg.get("training.frozen_bn_eval", cfg.get("train.frozen_bn_eval", False))
    )
    # model.freeze_backbone overrides each variant's reference default
    # (frozen MobileNet / trainable ResNet — models/cues_video.py); with an
    # explicit False the optimizer must also see NO frozen prefixes and
    # feature caching is meaningless
    freeze_backbone = cfg.get("model.freeze_backbone")
    if freeze_backbone is False:
        cache_frozen = False
        frozen_prefixes = ()
    elif freeze_backbone is True:  # every variant's CNN lives at this path
        frozen_prefixes = (("video_encoder", "cnn"),)
    else:
        frozen_prefixes = FROZEN_PARAM_PREFIXES.get(model_name, ())
    trainer = Trainer(
        get_cues_video_model(model_name, num_classes, dtype=model_dtype(cfg),
                             frozen_bn_eval=frozen_bn_eval,
                             freeze_backbone=freeze_backbone),
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            # reference defaults: cues_video/train.py:152-155 (batch 4,
            # lr 1e-4, 30 epochs, weight_decay 1e-4)
            batch_size=cfg.get("train.batch", cfg.get("training.batch_size", 4)),
            epochs=cfg.get("train.epochs", cfg.get("training.epochs", 30)),
            learning_rate=cfg.get("train.lr", cfg.get("training.learning_rate", 1e-4)),
            weight_decay=cfg.get("train.weight_decay", cfg.get("training.weight_decay", 1e-4)),
            # reference: cues_video/train.py:192 ReduceLROnPlateau(min, 0.5, 3)
            scheduler_mode="min",
            scheduler_factor=0.5,
            scheduler_patience=3,
            log_txt_header=True,  # reference pre-creates the "Training Log" TXT banner
            seed=cfg.get("train.seed", cfg.get("training.seed", 0)),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            frozen_param_prefixes=frozen_prefixes,
            **trainer_extras(cfg),
        ),
    )
    trainer.init_state(datasets["train"].inputs)
    load_pretrained_backbones(trainer, cfg)
    if cache_frozen:
        from multimodal_lipread_tpu.train.frozen_cache import cached_dataset

        # model returns the video CNN feature seq; cue stays raw
        datasets = {
            k: cached_dataset(trainer, v, lambda raw, f: (raw[0], f[0]))
            for k, v in datasets.items()
        }
        trainer.set_apply_kwargs(cached_features=True)
    result = trainer.fit(datasets["train"], datasets["val"], datasets["test"], resume=resume)
    maybe_plot(cfg, metrics_dir)
    return result


if __name__ == "__main__":
    cfg = parse_cli()
    main(cfg, resume=bool(cfg.get("_cli.resume", False)))
