"""Audio + textual-cue fusion pipeline.

Equivalent of ``python audio_cues/train.py`` (reference:
audio_cues/train.py:96-179): aligns audio clips to cue records by
(word, sequence_id, split) (reference: audio_cues/data_utils/dataset.py:73-102),
embeds descriptions once with the md5 .npz cache, and trains one of the 7
fusion models. The reference hard-codes model_name='middle_fusion_mobile'
(train.py:101) despite its registry — here the config selects it.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.cues import embed_cached, load_cue_records, records_by_key
from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, SPLITS, scan_glips
from multimodal_lipread_tpu.models.audio_cues import get_audio_cues_model
from multimodal_lipread_tpu.pipelines.common import (
    maybe_plot,
    model_dtype,
    trainer_extras,
    load_pretrained_backbones,
    compute_logmel_features,
    decode_waveforms,
    default_dirs,
    parse_cli,
)
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def load_audio_cue_datasets(
    root_dir: str,
    cue_root: str,
    input_size: int = 117,
    cue_mode: str = "emotion",
    embed_model: str = "mpnet",
    cache_dir: str | None = None,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], list]:
    audio_index = scan_glips(root_dir, exts=AUDIO_EXTS)
    cue_map = records_by_key(load_cue_records(cue_root, cue_mode))
    classes = audio_index.classes
    class_to_idx = audio_index.class_to_idx

    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = [e for e in audio_index.by_split(split) if e.key in cue_map]
        if not entries:
            raise RuntimeError(f"No aligned audio+cue samples for split '{split}'")
        waves = decode_waveforms([e.path for e in entries])
        mels = compute_logmel_features(waves, input_size=input_size)
        cues = embed_cached([cue_map[e.key].description for e in entries],
                            model=embed_model, cache_dir=cache_dir)
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(mels, cues), labels=labels)
    return datasets, classes




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    datasets, classes = load_audio_cue_datasets(
        cfg.get("dataset.root_dir"),
        cfg.get("dataset.cue_root") or cfg.get("dataset.root_dir"),
        input_size=cfg.get("dataset.input_size", 117),
        cue_mode=cfg.get("dataset.cue_mode", "emotion"),
        embed_model=cfg.get("dataset.embed_model", "mpnet"),
        cache_dir=cfg.get("dataset.cache_dir"),
    )
    num_classes = cfg.get("dataset.num_classes", len(classes))
    if num_classes != len(classes):
        raise ValueError(f"config says {num_classes} classes but found {len(classes)}: {classes}")
    model_name = cfg.get("model.name", "middle_fusion_mobile")

    metrics_dir, ckpt_dir = default_dirs(cfg, "audio_cues")
    trainer = Trainer(
        get_audio_cues_model(model_name, num_classes, dtype=model_dtype(cfg)),
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            # reference schema first (ac_config.yaml uses train.batch/lr/
            # epochs), this repo's common training.* keys as fallback —
            # same dual-schema handling as cues_video / audio_cues_video
            batch_size=cfg.get("train.batch", cfg.get("training.batch_size", 32)),
            epochs=cfg.get("train.epochs", cfg.get("training.epochs", 5)),
            learning_rate=cfg.get("train.lr", cfg.get("training.learning_rate", 1e-3)),
            weight_decay=cfg.get(
                "train.weight_decay", cfg.get("training.weight_decay", 0.0)
            ),
            # reference: audio_cues/train.py:137 ReduceLROnPlateau(min, 0.5, 3)
            scheduler_mode="min",
            scheduler_factor=0.5,
            scheduler_patience=3,
            seed=cfg.get("train.seed", cfg.get("training.seed", 0)),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            # shipped divergence from the reference: 2-epoch LR warmup. At
            # the family lr (1e-3, reference ac_config.yaml:14) Adam's first
            # steps kill the MelMobileNet encoder (dead ReLU6, logits pinned
            # at ln num_classes — ZOO.md round-3 footnote); the ramp removes
            # the death mode without changing the family protocol. Opt back
            # into reference semantics with training.warmup_epochs: 0.
            **trainer_extras(cfg, default_warmup_epochs=2.0),
        ),
    )
    trainer.init_state(datasets["train"].inputs)
    load_pretrained_backbones(trainer, cfg)
    result = trainer.fit(datasets["train"], datasets["val"], datasets["test"], resume=resume)
    maybe_plot(cfg, metrics_dir)
    return result


if __name__ == "__main__":
    cfg = parse_cli()
    main(cfg, resume=bool(cfg.get("_cli.resume", False)))
