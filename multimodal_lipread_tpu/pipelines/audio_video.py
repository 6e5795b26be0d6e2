"""Audio–video fusion pipeline.

Equivalent of ``python audio_video/train.py`` (reference:
audio_video/train.py:57-160): joins audio clips to lip-region sequences by
(word, sequence_id, split) — the reference joins video .npy samples to
sibling .m4a files by basename (audio_video/data_utils/dataset_av.py:36-49),
which is the same key — then trains one of the 7 fusion models with
Adam (lr only, no weight decay, no LR scheduler) and best-val checkpointing.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import (
    AUDIO_EXTS,
    SPLITS,
    align_modalities,
    scan_glips,
    scan_lip_regions,
)
from multimodal_lipread_tpu.models.audio_video import get_av_model
from multimodal_lipread_tpu.pipelines.common import (
    maybe_plot,
    model_dtype,
    trainer_extras,
    load_pretrained_backbones,
    compute_logmel_features,
    decode_waveforms,
    default_dirs,
    load_lip_sequences,
    parse_cli,
)
from multimodal_lipread_tpu.pipelines.video import resolve_lip_root
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


def load_av_datasets(
    root_dir: str,
    lip_root: str,
    input_size: int = 117,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], list]:
    """Aligned (mel, lips, label) datasets per split."""
    audio_index = scan_glips(root_dir, exts=AUDIO_EXTS)
    lip_index = scan_lip_regions(lip_root)
    classes = sorted(set(audio_index.classes) & set(lip_index.classes))
    class_to_idx = {w: i for i, w in enumerate(classes)}
    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        pairs = align_modalities(audio_index, lip_index, split=split)
        if not pairs:
            raise RuntimeError(f"No aligned audio+video samples for split '{split}'")
        waves = decode_waveforms([a.path for a, _v in pairs])
        mels = compute_logmel_features(waves, input_size=input_size)
        lips = load_lip_sequences([v.path for _a, v in pairs])
        labels = np.asarray([class_to_idx[a.word] for a, _v in pairs], np.int32)
        datasets[split] = ArrayDataset(inputs=(mels, lips), labels=labels)
    return datasets, classes




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    root_dir = cfg.get("dataset.root_dir")
    lip_root = resolve_lip_root(cfg)
    input_size = cfg.get("dataset.audio_input_size", 117)
    datasets, classes = load_av_datasets(root_dir, lip_root, input_size=input_size)
    num_classes = cfg.get("dataset.num_classes", len(classes))
    if num_classes != len(classes):
        raise ValueError(f"config says {num_classes} classes but found {len(classes)}: {classes}")
    model_name = cfg.get("model.name", "middle_fusion_mobilenet")

    model = get_av_model(model_name, num_classes, dtype=model_dtype(cfg))
    metrics_dir, ckpt_dir = default_dirs(cfg, "audio_video")
    trainer = Trainer(
        model,
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            batch_size=cfg.get("training.batch_size", 8),
            epochs=cfg.get("training.epochs", 10),
            learning_rate=cfg.get("training.learning_rate", 1e-4),
            weight_decay=0.0,  # reference: audio_video/train.py:130 (Adam lr only)
            scheduler_factor=1.0,  # reference has no LR scheduler here
            seed=cfg.get("training.seed", 0),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            **trainer_extras(cfg),
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
