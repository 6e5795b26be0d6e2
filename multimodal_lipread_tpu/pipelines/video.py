"""Video-only lip-reading pipeline.

Equivalent of ``python video/train.py`` (reference: video/train.py:85-285)
with the same YAML schema (video/config/visual_config.yaml), 7-model registry,
Adam + ReduceLROnPlateau(mode='max') on val accuracy, rolling per-epoch
checkpoint with resume support, best-val checkpointing, and final test on the
reloaded best checkpoint (written to test_results.txt like the reference,
video/train.py:277-280).

Data: the preprocessed ``<root>_lip_regions`` .npy mirror tree
(produced by multimodal_lipread_tpu.data.lip_extraction), loaded once into
(N, 29, 44, 44, 3) arrays.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.data.glips import lip_regions_root, lipread_files_dir
from multimodal_lipread_tpu.models.video import get_video_model
from multimodal_lipread_tpu.pipelines.common import default_dirs, load_video_datasets, parse_cli
from multimodal_lipread_tpu.pipelines.common import maybe_plot, model_dtype, trainer_extras
from multimodal_lipread_tpu.pipelines.common import load_pretrained_backbones
from multimodal_lipread_tpu.train.trainer import Trainer, TrainerConfig


def resolve_lip_root(cfg: Config) -> str:
    """Derive the lip-regions directory the way the reference does
    (video/data_utils/dataset_loader.py:133-139), or use an explicit one.

    The mirror tree replicates the source layout: with a
    ``<root>/lipread_files`` wrapper the .npy files live under
    ``<root>_lip_regions/lipread_files``; without one they live directly
    under ``<root>_lip_regions``."""
    explicit = cfg.get("dataset.lip_regions_root")
    if explicit:
        return explicit
    root = cfg.get("dataset.root_dir")
    mirror = lip_regions_root(root)
    base = lipread_files_dir(root)
    if os.path.normpath(base) == os.path.normpath(root):
        return mirror  # no lipread_files wrapper in the source tree
    return os.path.join(mirror, os.path.basename(base))




def main(config: Config | str, resume: bool = False) -> Dict[str, Any]:
    if isinstance(config, str):
        from multimodal_lipread_tpu.config import load_config

        config = load_config(config)
    cfg = config

    lip_root = resolve_lip_root(cfg)
    streaming = bool(cfg.get("dataset.streaming", False))
    device_crop = bool(cfg.get("dataset.device_crop", False))
    host_crop_streaming = bool(cfg.get("dataset.host_crop_streaming", False))
    # passed via kwargs only when enabled, so default runs don't depend on
    # the TrainerConfig field existing (keeps long-running sweeps that
    # hot-import this module against an older in-memory trainer working)
    dc_kwargs = {}
    if device_crop:
        # north-star layout: host decodes FULL frames + detects lip boxes,
        # and the crop/resize/pad/normalize run ON DEVICE inside the train
        # step (ops/crop_resize.py) — no offline .npy mirror tree needed,
        # replacing the reference's per-frame host cv2 crop
        # (visual_preprocessing.py:111-162)
        from multimodal_lipread_tpu.data.glips import SPLITS, scan_glips
        from multimodal_lipread_tpu.data.grain_loader import (
            FullFrameClipSource,
            StreamingDataset,
        )
        from multimodal_lipread_tpu.ops.crop_resize import crop_resize_pad

        index = scan_glips(cfg.get("dataset.root_dir"), exts=(".mp4", ".avi"))
        datasets = {
            split: StreamingDataset(
                FullFrameClipSource(
                    index.by_split(split), index.class_to_idx,
                    backend=cfg.get("dataset.landmark_backend", "auto"),
                ),
                input_keys=("frames", "boxes"),
                seed=cfg.get("training.seed", 0),
                worker_count=cfg.get("dataset.num_workers", 0),
            )
            for split in SPLITS
        }

        dc_kwargs["device_preproc"] = lambda frames, boxes: (crop_resize_pad(frames, boxes),)

    elif host_crop_streaming:
        # online preprocessing in the REFERENCE's layout (decode + detect +
        # cv2 crop all on host, per epoch) — the measured counterpart of
        # device_crop (experiments/device_crop_bench.py)
        from multimodal_lipread_tpu.data.glips import SPLITS, scan_glips
        from multimodal_lipread_tpu.data.grain_loader import (
            HostCropClipSource,
            StreamingDataset,
        )

        index = scan_glips(cfg.get("dataset.root_dir"), exts=(".mp4", ".avi"))
        datasets = {
            split: StreamingDataset(
                HostCropClipSource(
                    index.by_split(split), index.class_to_idx,
                    backend=cfg.get("dataset.landmark_backend", "auto"),
                ),
                input_keys=("lip_regions",),
                seed=cfg.get("training.seed", 0),
                worker_count=cfg.get("dataset.num_workers", 0),
            )
            for split in SPLITS
        }
    elif streaming:
        # full-GLips-scale path: ~100 GB of lip tensors can't materialize in
        # host RAM — grain workers stream uint8 .npy records (per-host
        # sharded), the Trainer normalizes to [0,1] on device
        from multimodal_lipread_tpu.data.glips import SPLITS, scan_lip_regions
        from multimodal_lipread_tpu.data.grain_loader import (
            LipClipSource,
            NativeStreamingDataset,
            StreamingDataset,
        )

        index = scan_lip_regions(lip_root)
        if cfg.get("dataset.loader_backend", "grain") == "native":
            # C++ thread-pool prefetcher: raw uint8 records straight from
            # .npy, no multiprocessing spawn, no per-record Python
            datasets = {
                split: NativeStreamingDataset(
                    index.by_split(split), index.class_to_idx,
                    kind="npy_u8", record_shape=(29, 44, 44, 3),
                    seed=cfg.get("training.seed", 0),
                    n_threads=cfg.get("dataset.num_workers", 0) or None,
                )
                for split in SPLITS
            }
        else:
            datasets = {
                split: StreamingDataset(
                    LipClipSource(index.by_split(split), index.class_to_idx),
                    input_keys=("lip_regions",),
                    seed=cfg.get("training.seed", 0),
                    worker_count=cfg.get("dataset.num_workers", 0),
                )
                for split in SPLITS
            }
    else:
        datasets, index = load_video_datasets(lip_root)
    num_classes = cfg.get("dataset.num_classes", len(index.classes))
    if num_classes != len(index.classes):
        raise ValueError(
            f"config says {num_classes} classes but found {len(index.classes)}: {index.classes}"
        )
    model_name = cfg.get("model.name", "resnet_lstm")

    model = get_video_model(
        model_name,
        num_classes,
        dtype=model_dtype(cfg),
        resnet_version=cfg.get("model.resnet_version", 18),
        shufflenet_version=cfg.get("model.shufflenet_version", "0.5x"),
        feature_dim=cfg.get("model.feature_dim"),
        dropout=cfg.get("model.dropout"),
    )
    metrics_dir, ckpt_dir = default_dirs(cfg, "video")
    trainer = Trainer(
        model,
        TrainerConfig(
            model_name=model_name,
            num_classes=num_classes,
            batch_size=cfg.get("training.batch_size", 16),
            epochs=cfg.get("training.epochs", 10),
            learning_rate=cfg.get("training.learning_rate", 5e-5),
            weight_decay=cfg.get("training.weight_decay", 1e-5),
            scheduler_mode="max",  # reference: video/train.py:213-215
            scheduler_factor=0.5,
            scheduler_patience=5,
            seed=cfg.get("training.seed", 0),
            metrics_dir=metrics_dir,
            checkpoints_dir=ckpt_dir,
            test_every_epoch=True,
            rolling_checkpoint=True,  # reference: video/train.py:252-262
            log_txt_header=True,  # reference pre-creates the "Training Log" TXT banner
            **dc_kwargs,
            # incl. mixup_alpha: the reference's augmentation YAML block is
            # dead config (visual_config.yaml:33-46); here it works, default off
            **trainer_extras(cfg),
        ),
    )
    trainer.ensure_initialized(datasets["train"])
    load_pretrained_backbones(trainer, cfg)
    result = trainer.fit(datasets["train"], datasets["val"], datasets["test"], resume=resume)
    maybe_plot(cfg, metrics_dir)

    if "final_test_acc" in result:
        # exact reference schema (video/train.py:277-280)
        with open(os.path.join(ckpt_dir, "test_results.txt"), "w") as f:
            f.write(
                f"Final Test Loss: {result['final_test_loss']:.4f}\n"
                f"Final Test Acc: {result['final_test_acc']:.2f}%\n"
                f"Best Val Acc: {result['best_val_acc']:.2f}%\n"
            )
    return result


if __name__ == "__main__":
    cfg = parse_cli()
    main(cfg, resume=bool(cfg.get("_cli.resume", False)))
