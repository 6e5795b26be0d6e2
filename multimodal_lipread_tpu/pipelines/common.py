"""Shared pipeline plumbing: config → arrays → Trainer.

Feature extraction happens ONCE, up front, on device — unlike the reference,
which recomputes features per sample per epoch inside DataLoader workers
(SURVEY.md §3.1). Per-clip outputs are identical; only the schedule differs.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from multimodal_lipread_tpu.config import Config, load_config
from multimodal_lipread_tpu.data.audio_io import load_waveform
from multimodal_lipread_tpu.data.glips import (
    SPLITS,
    AUDIO_EXTS,
    GlipsIndex,
    scan_glips,
)
from multimodal_lipread_tpu.ops.logmel import log_mel
from multimodal_lipread_tpu.parallel.distributed import maybe_initialize_distributed
from multimodal_lipread_tpu.train.trainer import _enable_compile_cache

# Multi-host init MUST precede the first backend query: _enable_compile_cache
# suffixes the cache path with jax.default_backend(), which initializes the
# local backend — after which jax.distributed.initialize() refuses to run.
# Env-var-only detection, idempotent, no-op on single-process runs.
maybe_initialize_distributed()

# Persistent XLA compile cache from the FIRST device op of any pipeline —
# not just from Trainer construction. The featurization (log-mel) compiles
# BEFORE a Trainer exists; without this, every fresh pipeline process paid
# those compiles again (minutes per process on remote/tunneled backends).
_enable_compile_cache()
from multimodal_lipread_tpu.train.trainer import ArrayDataset

MEL_BINS = 80


def compute_logmel_features(
    waves: np.ndarray, input_size: int = 117, chunk: int = 256, impl: str = "auto"
) -> np.ndarray:
    """(N, 20000) waveforms → (N, 80, input_size) normalized log-mel, on device.

    Normalization runs over the full (80, 126) spectrogram BEFORE time slicing,
    matching the reference order (audio/data_utils/dataset.py:42-52).
    """
    out: List[np.ndarray] = []
    n = waves.shape[0]
    for start in range(0, n, chunk):
        rows = waves[start : start + chunk]
        k = rows.shape[0]
        if k < chunk and n > chunk:
            # pad the final short chunk to the ALREADY-COMPILED shape and
            # trim after — normalization is per-clip, so padding rows can't
            # leak; a ragged remainder would force a second multi-minute
            # XLA compile on remote/tunneled backends. Datasets smaller than
            # one chunk keep their single ragged compile.
            rows = np.concatenate([rows, np.repeat(rows[:1], chunk - k, axis=0)])
        batch = jnp.asarray(rows, jnp.float32)
        mel = log_mel(batch, normalize=True, impl=impl)  # (b, 80, 126)
        out.append(np.asarray(mel[:k, :MEL_BINS, :input_size]))
    return np.concatenate(out, axis=0) if out else np.zeros((0, MEL_BINS, input_size), np.float32)


def decode_waveforms(paths: Sequence[str]) -> np.ndarray:
    """Host decode of audio files to fixed 20,000-sample float32 waveforms.

    PCM WAV batches go through the threaded native decoder
    (native/mlt_io.cpp); anything else (m4a, odd sample rates) falls back to
    the Python/ffmpeg path per file.
    """
    if not paths:
        return np.zeros((0, 20000), np.float32)
    if all(p.lower().endswith(".wav") for p in paths):
        from multimodal_lipread_tpu.data.native_io import load_wav_batch

        native = load_wav_batch(paths)
        if native is not None:
            return native
    return np.stack([load_waveform(p) for p in paths])


def load_audio_datasets(
    root_dir: str,
    input_size: int = 117,
    splits: Sequence[str] = SPLITS,
    words: Optional[Sequence[str]] = None,
    impl: str = "auto",
) -> Tuple[Dict[str, ArrayDataset], GlipsIndex]:
    """Scan GLips, decode + featurize all audio clips, return per-split datasets."""
    index = scan_glips(root_dir, exts=AUDIO_EXTS, words=words)
    class_to_idx = index.class_to_idx
    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = index.by_split(split)
        if not entries:
            raise RuntimeError(
                f"No audio clips found for split '{split}' under {root_dir} — "
                f"check the GLips tree layout"
            )
        waves = decode_waveforms([e.path for e in entries])
        mels = compute_logmel_features(waves, input_size=input_size, impl=impl)
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(mels,), labels=labels)
    return datasets, index


def load_lip_sequences(paths: Sequence[str], keep_uint8: bool = True) -> np.ndarray:
    """Load lip-region .npy files → (N, 29, 44, 44, 3) NTHWC.

    By default arrays stay **uint8**: the Trainer scales them to [0,1] on
    device, so the host→device copy is 4x smaller than float32. Pass
    ``keep_uint8=False`` for the float path (scaled by 1/255 like the
    reference, video/data_utils/dataset_loader.py:84-94; channels-last for
    TPU conv layouts).
    """
    if not paths:
        return np.zeros((0, 29, 44, 44, 3), np.uint8 if keep_uint8 else np.float32)
    if keep_uint8:
        return np.stack([np.load(p) for p in paths])
    from multimodal_lipread_tpu.data.native_io import load_npy_u8_batch

    native = load_npy_u8_batch(paths, (29, 44, 44, 3))
    if native is not None:
        return native
    return np.stack([np.load(p).astype(np.float32) / 255.0 for p in paths])


def load_video_datasets(
    lip_root: str,
    splits: Sequence[str] = SPLITS,
) -> Tuple[Dict[str, ArrayDataset], "GlipsIndex"]:
    """Scan a lip-region mirror tree and materialize per-split video datasets."""
    from multimodal_lipread_tpu.data.glips import scan_lip_regions

    index = scan_lip_regions(lip_root)
    class_to_idx = index.class_to_idx
    datasets: Dict[str, ArrayDataset] = {}
    for split in splits:
        entries = index.by_split(split)
        if not entries:
            raise RuntimeError(
                f"No lip-region files found for split '{split}' under {lip_root} — "
                f"run the lip-extraction preprocessing first"
            )
        lips = load_lip_sequences([e.path for e in entries])
        labels = np.asarray([class_to_idx[e.word] for e in entries], np.int32)
        datasets[split] = ArrayDataset(inputs=(lips,), labels=labels)
    return datasets, index


def load_pretrained_backbones(trainer, cfg: Config) -> int:
    """Graft converted torchvision weights into an initialized trainer state.

    Config schema (list or single mapping under ``model.pretrained``):

        model:
          pretrained:
            - arch: resnet18          # resnet18|resnet34|resnet50|vgg11|vgg13|
                                      # vgg16|vgg19|mobilenet_v2|mobilenet_v3_small|
                                      # shufflenet_v2_x0_5|shufflenet_v2_x1_0|
                                      # checkpoint (a Trainer .msgpack)
              path: /weights/resnet18.pth   # torch.save(model.state_dict(), ...)
              submodule: [resnet]           # path inside the model tree
              adapt_1ch: true               # fold RGB conv1 for mel inputs

    ``arch: checkpoint`` grafts from one of THIS framework's own trained
    msgpack checkpoints instead of a torchvision .pth — in-framework
    transfer learning (e.g. warm-start a fusion model's backbone from a
    single-modality run). ``source_submodule: [vgg]`` picks the subtree
    inside the source checkpoint's params/batch_stats (omit to take the
    whole tree).

    The reference initializes every backbone from torchvision ImageNet
    weights (e.g. video/models/resnet_lstm.py:80-84); this is the equivalent
    hook. Returns the number of backbones grafted.
    """
    from multimodal_lipread_tpu.utils import torch_import as ti

    specs = cfg.get("model.pretrained")
    if not specs:
        return 0
    if isinstance(specs, dict):
        specs = [specs]

    converters = {
        "resnet18": lambda p: ti.convert_resnet(p, 18),
        "resnet34": lambda p: ti.convert_resnet(p, 34),
        "resnet50": lambda p: ti.convert_resnet(p, 50),
        "vgg11": lambda p: ti.convert_vgg_bn(p, 11),
        "vgg13": lambda p: ti.convert_vgg_bn(p, 13),
        "vgg16": lambda p: ti.convert_vgg_bn(p, 16),
        "vgg19": lambda p: ti.convert_vgg_bn(p, 19),
        "mobilenet_v2": ti.convert_mobilenet_v2,
        "mobilenet_v3_small": ti.convert_mobilenet_v3_small,
        "shufflenet_v2_x0_5": lambda p: ti.convert_shufflenet_v2(p, 0.5),
        "shufflenet_v2_x1_0": lambda p: ti.convert_shufflenet_v2(p, 1.0),
    }

    assert trainer.state is not None, "call trainer.init_state() before grafting"
    variables = {
        "params": trainer.state["params"],
        "batch_stats": trainer.state["batch_stats"],
    }
    count = 0
    for spec in specs:
        arch = spec["arch"]
        if arch == "checkpoint":
            # graft from one of our OWN trained msgpack checkpoints
            # (template-free restore; subtree picked by source_submodule)
            from flax.serialization import msgpack_restore

            with open(spec["path"], "rb") as f:
                ckpt = msgpack_restore(f.read())
            src_state = ckpt.get("state", ckpt)
            converted = {}
            for collection in ("params", "batch_stats"):
                node = src_state.get(collection)
                if node is None:
                    continue
                for key in spec.get("source_submodule", ()):  # descend
                    node = node[key]
                if node:  # empty batch_stats ({}): skip the collection
                    converted[collection] = node
            variables = ti.graft_backbone(
                variables, converted, tuple(spec["submodule"]))
            count += 1
            continue
        if arch not in converters:
            raise ValueError(
                f"Unknown pretrained arch '{arch}'. Supported: {sorted(converters)}"
            )
        path = spec["path"]
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"pretrained checkpoint for '{arch}' not found at {path}. "
                f"Fetch torchvision ImageNet weights on a machine with egress via "
                f"`python -m multimodal_lipread_tpu.tools.fetch_weights --out "
                f"{os.path.dirname(path) or '.'} --arch {arch}` and copy the "
                f".pth file here."
            )
        converted = converters[arch](path)
        if spec.get("adapt_1ch"):
            converted = ti.adapt_first_conv_to_1ch(converted)
        variables = ti.graft_backbone(variables, converted, tuple(spec["submodule"]))
        count += 1
    # re-place on the mesh: replicated (pure DP), or rule-sharded when the
    # trainer runs tensor-parallel (duck-typed: tests drive this with a bare
    # namespace(state, mesh), so rules resolve via getattr, not Trainer API)
    sub = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    rules = getattr(getattr(trainer, "config", None), "param_partition_rules", ())
    if rules:
        from multimodal_lipread_tpu.parallel.mesh import place_state

        placed = place_state(trainer.mesh, sub, rules)
    else:
        from multimodal_lipread_tpu.parallel.mesh import replicate

        placed = replicate(trainer.mesh, sub)
    trainer.state["params"] = placed["params"]
    trainer.state["batch_stats"] = placed["batch_stats"]
    return count


def parse_cli(default_config: Optional[str] = None) -> Config:
    """--config path.yaml [--set a.b=c ...] → Config with overrides applied.

    Also the production entry point for multi-host init: jax.distributed
    must be initialized before ANY jax computation, and every CLI launch
    (``python -m ...`` and the ``mlt-*`` scripts) routes through here.
    No-op on single-process runs.
    """
    from multimodal_lipread_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=default_config, required=default_config is None)
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()
    cfg = load_config(args.config)
    for kv in args.set:
        key, _, value = kv.partition("=")
        try:
            import yaml

            from multimodal_lipread_tpu.config import coerce_yaml_scalar

            value = coerce_yaml_scalar(yaml.safe_load(value))
        except Exception:
            pass
        cfg.set(key, value)
    cfg.set("_cli.resume", bool(args.resume))
    return cfg


def default_dirs(cfg: Config, pipeline: str) -> Tuple[str, str]:
    """(metrics_dir, checkpoints_dir) for a pipeline, reference-style layout."""
    base = cfg.get("output.base_dir", pipeline)
    metrics = cfg.get("output.metrics_dir", os.path.join(base, "metrics"))
    ckpts = cfg.get("output.checkpoints_dir", os.path.join(base, "models_trained"))
    return metrics, ckpts


def model_dtype(cfg: Config):
    """model.dtype: 'bfloat16' halves MXU cost (measured +32% train
    throughput on TPU at these shapes); f32 loss/params regardless."""
    import jax.numpy as jnp

    return jnp.bfloat16 if str(cfg.get("model.dtype", "float32")) == "bfloat16" else jnp.float32


def trainer_extras(cfg: Config, default_warmup_epochs: float = 0.0) -> dict:
    """Universal ``training.*`` TrainerConfig knobs, identical across the 7
    pipelines (docs/MIGRATION.md "New knobs"): every one is a pure
    opt-in extension whose default reproduces the reference's behavior, so
    plumbing them uniformly cannot change a default run.

    Exception (documented divergence): ``default_warmup_epochs`` lets a
    pipeline ship a non-zero LR warmup where the reference's own family LR
    is optimization-unstable (audio_cues at lr 1e-3 kills the MobileNet
    encoder's ReLU6 stack in the first Adam steps — ZOO.md round-3
    footnote). Reference semantics = ``training.warmup_epochs: 0``."""
    return {
        "warmup_epochs": cfg.get(
            "training.warmup_epochs",
            cfg.get("train.warmup_epochs", default_warmup_epochs),
        ),
        "device_resident": cfg.get("training.device_resident", False),
        "steps_per_dispatch": cfg.get("training.steps_per_dispatch", 1),
        "handle_preemption": cfg.get("training.handle_preemption", False),
        "host_prefetch": cfg.get("training.host_prefetch", 2),
        "remat": cfg.get("training.remat", False),
        "half_precision": cfg.get("training.half_precision", False),
        "checkpoint_backend": cfg.get("training.checkpoint_backend", "msgpack"),
        "profile_dir": cfg.get("training.profile_dir", None),
        "dropout_rng_impl": cfg.get("training.dropout_rng_impl", "rbg"),
        "mixup_alpha": cfg.get(
            # the reference's (dead) YAML block spells it augmentation.mixup_alpha
            "training.mixup_alpha", cfg.get("augmentation.mixup_alpha", 0.0)
        ),
    }


def maybe_plot(cfg: Config, metrics_dir: str) -> None:
    """Write loss/accuracy PNGs after training (reference: visualize_metrics.py
    per subsystem); disable with output.plots: false."""
    if cfg.get("output.plots", True):
        try:
            from multimodal_lipread_tpu.utils.visualize import plot_logs

            plot_logs(metrics_dir)
        except Exception as e:  # plotting must never fail a run
            print(f"plotting skipped: {e}")
