"""Audio-only pipeline: log-mel → CNN/LSTM/Transformer classifiers.

Equivalent of ``python audio/train.py`` (reference: audio/train.py:136-197)
with the same YAML schema (reference: audio/configs/audio_config.yaml), the
same 7-model registry, the same Adam + ReduceLROnPlateau('min', 0.5, 5)
recipe, per-epoch test eval, best-val checkpointing, and final test on the
reloaded best checkpoint.

TPU-native differences: features are computed once on device by the fused
log-mel kernel; training is data-parallel over the mesh. The reference's
shuffled val/test loaders (audio/train.py:113-114) don't change metrics
(full-epoch averages are order-invariant), so evaluation here is unshuffled.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.models.audio import get_audio_model
from multimodal_lipread_tpu.pipelines.common import (
    maybe_plot,
    model_dtype,
    trainer_extras,
    load_pretrained_backbones,
    default_dirs,
    load_audio_datasets,
    parse_cli,
)
from multimodal_lipread_tpu.train.trainer import Trainer, TrainerConfig




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    root_dir = cfg.get("dataset.root_dir")
    num_classes = cfg.get("dataset.num_classes", 4)
    input_size = cfg.get("dataset.input_size", 117)
    model_name = cfg.get("model.name", "resnet")
    version = cfg.get("model.version", 16)

    streaming = bool(cfg.get("dataset.streaming", False))
    if streaming:
        # full-GLips-scale path: host workers stream raw waveforms through
        # grain (per-host sharded); the fused log-mel runs ON DEVICE inside
        # the jitted train step (models/frontend.py)
        from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, SPLITS, scan_glips
        from multimodal_lipread_tpu.data.grain_loader import (
            AudioClipSource,
            NativeStreamingDataset,
            StreamingDataset,
        )

        index = scan_glips(root_dir, exts=AUDIO_EXTS)
        if cfg.get("dataset.loader_backend", "grain") == "native":
            # C++ thread-pool prefetcher (native/mlt_io.cpp): in-process, no
            # multiprocessing spawn, PCM16 WAV only. Real GLips ships .m4a
            # (reference: audio/data_utils/dataset.py:29-37) — those are
            # transcoded ONCE into a WAV mirror (same ffmpeg decode pipeline
            # as the grain path, tools/transcode.py) and then streamed
            # natively at ~1 ms/clip instead of an ffmpeg spawn per epoch.
            entries_by_split = {s: index.by_split(s) for s in SPLITS}
            if any(
                not e.path.lower().endswith(".wav")
                for es in entries_by_split.values() for e in es
            ):
                from multimodal_lipread_tpu.tools.transcode import ensure_wav_mirror

                wav_cache = cfg.get(
                    "dataset.wav_cache_dir", os.path.join(root_dir, "wav_cache")
                )
                entries_by_split = {
                    s: ensure_wav_mirror(
                        es, wav_cache,
                        workers=cfg.get("dataset.num_workers", 0) or 8,
                    )
                    for s, es in entries_by_split.items()
                }
            datasets = {
                split: NativeStreamingDataset(
                    entries_by_split[split], index.class_to_idx,
                    kind="wav", record_shape=(20000,),
                    seed=cfg.get("training.seed", 0),
                    n_threads=cfg.get("dataset.num_workers", 0) or None,
                    # 'int16' halves the waveform H2D (exact for PCM16)
                    wire_dtype=cfg.get("dataset.wire_dtype"),
                )
                for split in SPLITS
            }
        else:
            datasets = {
                split: StreamingDataset(
                    AudioClipSource(index.by_split(split), index.class_to_idx),
                    input_keys=("waveform",),
                    seed=cfg.get("training.seed", 0),
                    worker_count=cfg.get("dataset.num_workers", 0),
                )
                for split in SPLITS
            }
    else:
        datasets, index = load_audio_datasets(root_dir, input_size=input_size)
    if len(index.classes) != num_classes:
        # explicit raise (not assert — stripped under python -O): training
        # with a mismatched head silently mislabels every example
        raise ValueError(
            f"config says {num_classes} classes but found "
            f"{len(index.classes)}: {index.classes}"
        )

    # model.use_batchnorm=False reproduces the reference's models_without_reg
    # ablation copies (reference: audio/models_without_reg/) without
    # duplicating files
    model = get_audio_model(
        model_name, num_classes, input_size=input_size, version=version,
        use_batchnorm=cfg.get("model.use_batchnorm", True),
        dtype=model_dtype(cfg),
        d_model=cfg.get("model.d_model"),  # conformer width dial
    )
    if streaming:
        from multimodal_lipread_tpu.models.frontend import WaveToLogMel

        model = WaveToLogMel(model, input_size=input_size)
    metrics_dir, ckpt_dir = default_dirs(cfg, "audio")
    trainer = Trainer(
        model,
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            batch_size=cfg.get("training.batch_size", 32),
            epochs=cfg.get("training.epochs", 10),
            learning_rate=cfg.get("training.learning_rate", 5e-4),
            weight_decay=cfg.get("training.weight_decay", 1e-4),
            scheduler_mode="min",
            scheduler_factor=0.5,
            scheduler_patience=5,
            seed=cfg.get("training.seed", 0),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            **trainer_extras(cfg),
        ),
    )
    trainer.ensure_initialized(datasets["train"])
    load_pretrained_backbones(trainer, cfg)
    result = trainer.fit(datasets["train"], datasets["val"], datasets["test"], resume=resume)
    maybe_plot(cfg, metrics_dir)
    return result


if __name__ == "__main__":
    cfg = parse_cli()
    main(cfg, resume=bool(cfg.get("_cli.resume", False)))
