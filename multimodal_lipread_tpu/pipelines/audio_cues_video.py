"""Triple fusion (audio + cue + video) pipeline.

Equivalent of ``python audio_cues_video/train.py`` (reference:
audio_cues_video/train.py:85-212): strict 3-way alignment by
(word, sequence_id, split) with skip accounting
(reference: audio_cues_video/data_utils/dataset.py:151-202), mpnet cue
embeddings with md5 cache, Adam + weight decay, per-epoch rolling checkpoint +
best-val checkpoint, final test on the reloaded best.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.cues import embed_cached, load_cue_records, records_by_key
from multimodal_lipread_tpu.data.glips import (
    AUDIO_EXTS,
    SPLITS,
    align_modalities,
    scan_glips,
    scan_lip_regions,
)
from multimodal_lipread_tpu.models.audio_cues_video import get_triple_model
from multimodal_lipread_tpu.models.audio_cues_video import FROZEN_PARAM_PREFIXES
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
from multimodal_lipread_tpu.pipelines.video import resolve_lip_root
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def load_triple_datasets(
    root_dir: str,
    cue_root: str,
    lip_root: str,
    input_size: int = 117,
    cue_mode: str = "emotion",
    embed_model: str = "mpnet",
    cache_dir: str | None = None,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], list]:
    audio_index = scan_glips(root_dir, exts=AUDIO_EXTS)
    lip_index = scan_lip_regions(lip_root)
    cue_map = records_by_key(load_cue_records(cue_root, cue_mode))
    classes = audio_index.classes  # audio is the label source of truth
    class_to_idx = audio_index.class_to_idx

    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        pairs = [
            (a, v) for a, v in align_modalities(audio_index, lip_index, split=split)
            if a.key in cue_map
        ]
        if not pairs:
            raise RuntimeError(f"No aligned audio+cue+video samples for split '{split}'")
        from multimodal_lipread_tpu.pipelines.common import load_lip_sequences

        waves = decode_waveforms([a.path for a, _v in pairs])
        mels = compute_logmel_features(waves, input_size=input_size)
        cues = embed_cached([cue_map[a.key].description for a, _v in pairs],
                            model=embed_model, cache_dir=cache_dir)
        lips = load_lip_sequences([v.path for _a, v in pairs])
        labels = np.asarray([class_to_idx[a.word] for a, _v in pairs], np.int32)
        datasets[split] = ArrayDataset(inputs=(mels, cues, lips), labels=labels)
    return datasets, classes




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    lip_root = resolve_lip_root(cfg)  # honors dataset.lip_regions_root
    datasets, classes = load_triple_datasets(
        cfg.get("dataset.root_dir"),
        cfg.get("dataset.cue_root") or cfg.get("dataset.root_dir"),
        lip_root,
        input_size=cfg.get("dataset.input_size", 117),
        cue_mode=cfg.get("dataset.cue_mode", "emotion"),
        embed_model=cfg.get("dataset.embed_model", "mpnet"),
        cache_dir=cfg.get("dataset.cache_dir"),
    )
    num_classes = cfg.get("dataset.num_classes", len(classes))
    if num_classes != len(classes):
        raise ValueError(f"config says {num_classes} classes but found {len(classes)}: {classes}")
    # reference schema first (acv_config.yaml uses train.model_name/batch/lr/
    # epochs and train.metrics_dir/save_dir), extended keys as fallback
    model_name = (cfg.get("train.model_name") or cfg.get("model.name")
                  or "late_fusion_mobile")

    metrics_dir, ckpt_dir = default_dirs(cfg, "audio_cues_video")
    metrics_dir = cfg.get("train.metrics_dir", metrics_dir)
    ckpt_dir = cfg.get("train.save_dir", ckpt_dir)
    # frozen-feature caching: precompute the frozen audio-ResNet + video-CNN
    # outputs once and train only the trainable tail — requires
    # frozen_bn_eval (deterministic frozen encoders); only meaningful for
    # the variants with frozen encoders
    cache_frozen = bool(
        cfg.get("training.cache_frozen_features", cfg.get("train.cache_frozen_features", False))
    ) and model_name in FROZEN_PARAM_PREFIXES
    frozen_bn_eval = cache_frozen or bool(
        cfg.get("training.frozen_bn_eval", cfg.get("train.frozen_bn_eval", False))
    )
    trainer = Trainer(
        get_triple_model(model_name, num_classes, dtype=model_dtype(cfg),
                         frozen_bn_eval=frozen_bn_eval),
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            # reference defaults: audio_cues_video/train.py:128,162,166
            # (batch 4, Adam(lr=1e-4) with NO weight decay, 30 epochs)
            batch_size=cfg.get("train.batch", cfg.get("training.batch_size", 4)),
            epochs=cfg.get("train.epochs", cfg.get("training.epochs", 30)),
            learning_rate=cfg.get("train.lr", cfg.get("training.learning_rate", 1e-4)),
            weight_decay=cfg.get("train.weight_decay", cfg.get("training.weight_decay", 0.0)),
            # reference: audio_cues_video/train.py:163 ReduceLROnPlateau(min, 0.5, 3)
            scheduler_mode="min",
            scheduler_factor=0.5,
            scheduler_patience=3,
            log_txt_header=True,  # reference pre-creates the "Training Log" TXT banner
            seed=cfg.get("train.seed", cfg.get("training.seed", 0)),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            frozen_param_prefixes=FROZEN_PARAM_PREFIXES.get(model_name, ()),
            rolling_checkpoint=True,  # reference: audio_cues_video/train.py:179-187
            **trainer_extras(cfg),
        ),
    )
    trainer.init_state(datasets["train"].inputs)
    load_pretrained_backbones(trainer, cfg)
    if cache_frozen:
        from multimodal_lipread_tpu.train.frozen_cache import cached_dataset

        # model returns (audio_feat, video_cnn_seq); cue stays raw
        datasets = {
            k: cached_dataset(trainer, v, lambda raw, f: (f[0], raw[1], f[1]))
            for k, v in datasets.items()
        }
        trainer.set_apply_kwargs(cached_features=True)
    result = trainer.fit(datasets["train"], datasets["val"], datasets["test"], resume=resume)
    maybe_plot(cfg, metrics_dir)
    return result


if __name__ == "__main__":
    cfg = parse_cli()
    main(cfg, resume=bool(cfg.get("_cli.resume", False)))
