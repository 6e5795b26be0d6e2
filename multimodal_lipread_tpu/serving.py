"""Inference / serving: fixed-shape jitted predictors from trained checkpoints.

The reference stops at training (its 'serving' is the final-test eval). For
production use this module adds:

- ``Predictor``: loads a Trainer checkpoint (best-val or rolling, msgpack or
  orbax), compiles ONE fixed-batch forward, and serves arbitrary-size inputs
  by padding/splitting — no recompilation, stable latency.
- ``export_stablehlo``: serializes the jitted forward with ``jax.export`` so
  a C++/serving runtime can execute it without Python.
- an audio CLI: ``python -m multimodal_lipread_tpu.serving --config <yaml>
  --checkpoint <path> <clips...>`` → JSON predictions, reusing the exact
  training featurization (host decode + device log-mel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_lipread_tpu.train.checkpoint import load_checkpoint, load_checkpoint_orbax


def _load_state(ckpt_path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    if ckpt_path.endswith(".orbax"):
        # restore WITHOUT a template: orbax rejects subset templates (the
        # trainer checkpoint also holds opt_state/scheduler fields serving
        # doesn't model), so take the raw tree and let the caller pick keys
        import orbax.checkpoint as ocp

        import os as _os

        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(_os.path.abspath(ckpt_path))
    return load_checkpoint(ckpt_path, template)


@dataclasses.dataclass
class Predictor:
    """Fixed-batch jitted classifier head around trained variables.

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel serving — the
    batch axis is sharded over the mesh (`P('data')`) and the variables are
    replicated, so one compiled forward serves ``mesh.size`` chips with XLA
    placing the collectives (the reference has no serving at all; this is
    the training mesh design of ``parallel/mesh.py`` applied to inference).
    Logits are numerically identical to single-device serving within float
    tolerance (no cross-batch ops exist in any zoo model's eval path — BN
    uses running stats; XLA may still fuse/lay out differently under
    sharding, so exact bit-equality is not guaranteed — the pinning test
    asserts 1e-6 agreement)."""

    model: Any
    variables: Dict[str, Any]
    batch_size: int = 32
    mesh: Optional[Any] = None
    # jit-traceable ``(*inputs) -> tuple(inputs)`` applied in-graph before
    # the normalize — e.g. ops/crop_resize.crop_resize_pad so a video
    # predictor serves straight from full decoded frames + lip boxes (the
    # Trainer's TrainerConfig.device_preproc contract, serving-side)
    device_preproc: Optional[Callable[..., tuple]] = None
    _compiled: Optional[Callable] = None

    @classmethod
    def from_checkpoint(
        cls,
        model: Any,
        ckpt_path: str,
        example_inputs: Sequence[np.ndarray],
        batch_size: int = 32,
        mesh: Optional[Any] = None,
        device_preproc: Optional[Callable[..., tuple]] = None,
    ) -> "Predictor":
        """Restore a Trainer checkpoint (``{epoch, state, val_acc, ...}``)."""
        rng = jax.random.PRNGKey(0)
        dummy = tuple(jnp.asarray(a[:1]) for a in example_inputs)
        if device_preproc is not None:
            dummy = tuple(device_preproc(*dummy))

        def _init_cast(x):
            # mirror the compiled forward's cast exactly (uint8 normalize,
            # int16 waveform → f32) so init traces the dtypes served
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            if x.dtype == jnp.int16:
                return x.astype(jnp.float32)
            return x

        dummy = tuple(_init_cast(x) for x in dummy)
        init_vars = model.init({"params": rng, "dropout": rng}, *dummy, train=False)
        template = {
            "epoch": 0,
            "state": {
                "params": init_vars["params"],
                "batch_stats": init_vars.get("batch_stats", {}),
            },
            "val_acc": 0.0,
            "scheduler_lr": 0.0,
        }
        ckpt = _load_state(ckpt_path, template)
        variables = {
            "params": ckpt["state"]["params"],
            "batch_stats": ckpt["state"]["batch_stats"],
        }
        return cls(model=model, variables=variables, batch_size=batch_size,
                   mesh=mesh, device_preproc=device_preproc)

    def _forward(self):
        if self._compiled is None:
            model = self.model
            if self.mesh is not None:
                from multimodal_lipread_tpu.parallel.mesh import replicate

                if self.batch_size % self.mesh.size != 0:
                    raise ValueError(
                        f"serving batch_size={self.batch_size} must be a "
                        f"multiple of the mesh size ({self.mesh.size}) so "
                        "every chip gets an equal batch shard"
                    )
                # one-time H2D: params/batch_stats replicated over the mesh;
                # the jitted forward then infers shardings from its args
                self.variables = replicate(self.mesh, self.variables)

            device_preproc = self.device_preproc

            @jax.jit
            def fwd(variables, *inputs):
                if device_preproc is not None:
                    # e.g. device-side lip crop: (frames, boxes) → lips
                    inputs = tuple(device_preproc(*inputs))
                # uint8 inputs (lip tensors) cross host→device at 1/4 the
                # bytes and normalize to [0,1] in-graph; int16 waveforms at
                # 1/2 the bytes, cast to f32 — the same contract as the
                # Trainer's train step
                def c(x):
                    if x.dtype == jnp.uint8:
                        return x.astype(jnp.float32) / 255.0
                    if x.dtype == jnp.int16:
                        return x.astype(jnp.float32)
                    return x

                inputs = tuple(c(x) for x in inputs)
                return model.apply(variables, *inputs, train=False)

            self._compiled = fwd
        return self._compiled

    def predict_logits(self, *inputs: np.ndarray) -> np.ndarray:
        """Any-N inputs → (N, num_classes) logits via fixed-batch chunks."""
        n = inputs[0].shape[0]
        fwd = self._forward()
        out: List[np.ndarray] = []
        for start in range(0, n, self.batch_size):
            chunk = tuple(a[start : start + self.batch_size] for a in inputs)
            k = chunk[0].shape[0]
            if k < self.batch_size:  # pad to the compiled shape
                chunk = tuple(
                    np.pad(a, [(0, self.batch_size - k)] + [(0, 0)] * (a.ndim - 1))
                    for a in chunk
                )
            arrays = tuple(map(jnp.asarray, chunk))
            if self.mesh is not None:
                from multimodal_lipread_tpu.parallel.mesh import shard_batch

                arrays = shard_batch(self.mesh, arrays)
            logits = np.asarray(fwd(self.variables, *arrays))
            out.append(logits[:k])
        return np.concatenate(out, axis=0) if out else np.zeros((0, 0), np.float32)

    def predict(self, *inputs: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict_logits(*inputs), axis=-1)


def load_test(
    predictor: "Predictor",
    inputs: Sequence[np.ndarray],
    num_threads: int = 4,
    requests_per_thread: int = 25,
) -> Dict[str, Any]:
    """Sustained concurrent-request harness for a Predictor.

    ``num_threads`` client threads each submit ``requests_per_thread``
    fixed-batch requests back-to-back; every request is synchronized (the
    logits are fetched to host) so the recorded latency is the full
    request→response time a serving client would see, including queueing
    behind the other clients on the single device stream. Returns the
    per-request latency distribution (p50/p90/p99, ms) and the aggregate
    throughput. The forward is pre-warmed (compiled) before the clock
    starts, matching a steady-state server."""
    import threading
    import time as _time

    fwd = predictor._forward()
    arrays = tuple(map(jnp.asarray, inputs))
    if predictor.mesh is not None:
        from multimodal_lipread_tpu.parallel.mesh import shard_batch

        arrays = shard_batch(predictor.mesh, arrays)
    np.asarray(fwd(predictor.variables, *arrays))  # compile + warm

    latencies: List[List[float]] = [[] for _ in range(num_threads)]
    barrier = threading.Barrier(num_threads + 1)

    def client(tid: int) -> None:
        barrier.wait()
        for _ in range(requests_per_thread):
            t0 = _time.perf_counter()
            out = fwd(predictor.variables, *arrays)
            out.block_until_ready()
            latencies[tid].append(_time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(num_threads)]
    for t in threads:
        t.start()
    barrier.wait()
    t_start = _time.perf_counter()
    for t in threads:
        t.join()
    wall = _time.perf_counter() - t_start
    lats = np.sort(np.concatenate([np.asarray(l) for l in latencies]))
    n_req = len(lats)
    batch = int(inputs[0].shape[0])

    def pct(p: float) -> float:
        return float(lats[min(n_req - 1, int(round(p / 100 * (n_req - 1))))])

    return {
        "num_threads": num_threads,
        "requests": n_req,
        "batch": batch,
        "throughput_clips_per_s": batch * n_req / wall,
        "p50_ms": pct(50) * 1e3,
        "p90_ms": pct(90) * 1e3,
        "p99_ms": pct(99) * 1e3,
        "max_ms": float(lats[-1]) * 1e3,
        "wall_s": wall,
    }


def export_stablehlo(model: Any, variables: Dict[str, Any], example_inputs: Sequence[Any]) -> bytes:
    """Serialize the inference function to portable StableHLO bytes
    (jax.export); reload anywhere with ``jax.export.deserialize``."""
    from jax import export as jexport

    def fwd(*inputs):
        return model.apply(variables, *inputs, train=False)

    args = tuple(jnp.asarray(a) for a in example_inputs)
    exported = jexport.export(jax.jit(fwd))(*args)
    return bytes(exported.serialize())  # serialize() yields a bytearray


def predict_audio_clips(
    config: Any, ckpt_path: str, clip_paths: Sequence[str], batch_size: int = 32,
    mesh: Optional[Any] = None,
) -> List[Dict[str, Any]]:
    """End-to-end audio inference: files → decode → log-mel → classify."""
    from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips
    from multimodal_lipread_tpu.models.audio import get_audio_model
    from multimodal_lipread_tpu.pipelines.common import (
        compute_logmel_features,
        decode_waveforms,
        model_dtype,
    )

    num_classes = config.get("dataset.num_classes", 4)
    input_size = config.get("dataset.input_size", 117)
    # rebuild the model EXACTLY as the training pipeline did — a mismatched
    # use_batchnorm/dtype changes the param tree and the restore fails
    # (model_dtype is the same helper the pipelines use)
    model = get_audio_model(
        config.get("model.name", "resnet"), num_classes,
        input_size=input_size, version=config.get("model.version", 16),
        use_batchnorm=config.get("model.use_batchnorm", True),
        dtype=model_dtype(config),
    )
    streaming = bool(config.get("dataset.streaming", False))
    if streaming:
        # streaming-trained checkpoints wrap the classifier in WaveToLogMel
        # (pipelines/audio.py): params nest one level deeper and the net
        # consumes raw waveforms — rebuild the same wrapper or the restore
        # fails with missing-key errors
        from multimodal_lipread_tpu.models.frontend import WaveToLogMel

        model = WaveToLogMel(model, input_size=input_size)
    classes = None
    root = config.get("dataset.root_dir")
    if root:
        try:
            classes = scan_glips(root, exts=AUDIO_EXTS).classes
        except FileNotFoundError:
            pass

    waves = decode_waveforms(list(clip_paths))
    if streaming:
        inputs = waves  # log-mel runs on device inside the wrapped model
    else:
        inputs = compute_logmel_features(waves, input_size=input_size)
    predictor = Predictor.from_checkpoint(
        model, ckpt_path, (inputs[:1],), batch_size, mesh=mesh
    )
    logits = predictor.predict_logits(inputs)
    preds = np.argmax(logits, axis=-1)
    results = []
    for path, p, l in zip(clip_paths, preds, logits):
        results.append(
            {
                "path": path,
                "prediction": int(p),
                "word": classes[int(p)] if classes else None,
                "logits": [float(x) for x in l],
            }
        )
    return results


PIPELINES = (
    "audio", "video", "audio_video", "cues", "audio_cues", "cues_video",
    "audio_cues_video",
)

# per-pipeline (input modalities, model input order); modality codes:
# 'a' = audio clip path, 'v' = lip-region .npy path, 'c' = cue text file
_PIPELINE_INPUTS = {
    "audio": "a",
    "video": "v",
    "audio_video": "av",
    "cues": "c",
    "audio_cues": "ac",
    "cues_video": "cv",
    "audio_cues_video": "acv",
}


def build_model(pipeline: str, config: Any):
    """Rebuild the model EXACTLY as the pipeline's training entry did —
    a mismatched knob changes the param tree and the restore fails."""
    from multimodal_lipread_tpu.pipelines.common import model_dtype

    num_classes = config.get("dataset.num_classes", 4)
    dtype = model_dtype(config)
    if pipeline == "audio":
        raise ValueError("audio uses predict_audio_clips (streaming-aware)")
    if pipeline == "video":
        from multimodal_lipread_tpu.models.video import get_video_model

        return get_video_model(
            config.get("model.name", "resnet_lstm"), num_classes, dtype=dtype,
            resnet_version=config.get("model.resnet_version", 18),
            shufflenet_version=config.get("model.shufflenet_version", "0.5x"),
            feature_dim=config.get("model.feature_dim"),
            dropout=config.get("model.dropout"),
        )
    if pipeline == "audio_video":
        from multimodal_lipread_tpu.models.audio_video import get_av_model

        return get_av_model(
            config.get("model.name", "middle_fusion_mobilenet"), num_classes, dtype=dtype
        )
    if pipeline == "cues":
        from multimodal_lipread_tpu.models.cues import get_cue_model

        return get_cue_model(
            config.get("model.name", "dense_nn"), num_classes, dtype=dtype,
            bert_size=config.get("model.bert_size", "tiny"),
        )
    if pipeline == "audio_cues":
        from multimodal_lipread_tpu.models.audio_cues import get_audio_cues_model

        return get_audio_cues_model(
            config.get("model.name", "middle_fusion_mobile"), num_classes, dtype=dtype
        )
    if pipeline == "cues_video":
        from multimodal_lipread_tpu.models.cues_video import get_cues_video_model

        name = config.get("train.model_name") or config.get("model.name") or "middle_fusion_mobile"
        return get_cues_video_model(name, num_classes, dtype=dtype)
    if pipeline == "audio_cues_video":
        from multimodal_lipread_tpu.models.audio_cues_video import get_triple_model

        name = config.get("train.model_name") or config.get("model.name") or "late_fusion_mobile"
        return get_triple_model(name, num_classes, dtype=dtype)
    raise ValueError(f"unknown pipeline '{pipeline}' (one of {PIPELINES})")


def _featurize_modalities(pipeline: str, config: Any, groups: Sequence[Sequence[str]]):
    """Per-clip file groups → the pipeline's model-input arrays.

    Each group lists one path per modality in the pipeline's canonical order
    (see ``_PIPELINE_INPUTS``): audio clip, lip-region ``.npy``, and/or a
    text file holding the cue description. Featurization is EXACTLY the
    training pipelines': host decode + device log-mel for audio, raw uint8
    lips (device-normalized in the predictor), cached sentence embeddings
    for cues (reference featurization: audio/utils/audio_processor.py,
    video/data_utils/dataset_loader.py:84-94, audio_cues/data_utils/
    dataset.py:105-122)."""
    codes = _PIPELINE_INPUTS[pipeline]
    for g in groups:
        if len(g) != len(codes):
            raise ValueError(
                f"pipeline '{pipeline}' needs {len(codes)} files per clip "
                f"({','.join(codes)}: a=audio, v=lips .npy, c=cue text); got {g}"
            )
    inputs: List[np.ndarray] = []
    for i, code in enumerate(codes):
        paths = [g[i] for g in groups]
        if code == "a":
            from multimodal_lipread_tpu.pipelines.common import (
                compute_logmel_features,
                decode_waveforms,
            )

            mels = compute_logmel_features(
                decode_waveforms(paths),
                input_size=config.get("dataset.input_size", 117),
            )
            inputs.append(mels)
        elif code == "v":
            lips = np.stack([np.load(p) for p in paths])
            if lips.dtype != np.uint8:
                lips = np.clip(lips * 255.0 if lips.max() <= 1.0 else lips, 0, 255).astype(np.uint8)
            inputs.append(lips)
        else:  # cue text file → embedding (or tokens for token-level models)
            texts = []
            for p in paths:
                with open(p, "r", encoding="utf-8") as f:
                    texts.append(f.read().strip())
            if pipeline == "cues":
                # mirror the cue classifier's featurization kind exactly
                from multimodal_lipread_tpu.models.cues import CUE_MODEL_SPECS
                from multimodal_lipread_tpu.pipelines.cues import _featurize

                name = config.get("model.name", "dense_nn")
                kind = CUE_MODEL_SPECS[name][1]
                if kind == "tfidf":
                    raise ValueError(
                        "the 'linear' (TF-IDF) cue model fits its vectorizer "
                        "on the training corpus and cannot be served from a "
                        "checkpoint alone — use an embedding-based cue model"
                    )

                class _R:  # duck-typed CueRecord
                    def __init__(self, d):
                        self.description = d

                feats = _featurize([_R(t) for t in texts], kind,
                                   config.get("dataset.cache_dir"),
                                   bert_size=config.get("model.bert_size", "tiny"))
                inputs.append(np.asarray(feats))
            else:
                from multimodal_lipread_tpu.data.cues import embed_cached

                inputs.append(
                    embed_cached(
                        texts,
                        model=config.get("dataset.embed_model", "mpnet"),
                        cache_dir=config.get("dataset.cache_dir"),
                    )
                )
    return tuple(inputs)


def _class_names(config: Any) -> Optional[List[str]]:
    """Best-effort class names: the sorted word list of the dataset root
    (every pipeline's label space is the sorted word set; cues_video can
    restrict it further — callers needing exactness should set
    dataset.num_classes and map indices themselves)."""
    root = config.get("dataset.root_dir")
    if not root:
        return None
    from multimodal_lipread_tpu.data.glips import AUDIO_EXTS, scan_glips

    for exts in (AUDIO_EXTS, (".npy",)):
        try:
            classes = scan_glips(root, exts=exts).classes
            if classes:
                return classes
        except (FileNotFoundError, RuntimeError):
            continue
    return None


def predict_clips(
    config: Any,
    ckpt_path: str,
    pipeline: str,
    groups: Sequence[Sequence[str]],
    batch_size: int = 32,
    mesh: Optional[Any] = None,
) -> List[Dict[str, Any]]:
    """End-to-end inference for ANY pipeline: per-clip file groups →
    featurize → classify. See ``_featurize_modalities`` for group format."""
    if pipeline == "audio":
        return predict_audio_clips(
            config, ckpt_path, [g[0] for g in groups], batch_size, mesh=mesh
        )
    model = build_model(pipeline, config)
    inputs = _featurize_modalities(pipeline, config, groups)
    predictor = Predictor.from_checkpoint(
        model, ckpt_path, tuple(a[:1] for a in inputs), batch_size, mesh=mesh
    )
    logits = predictor.predict_logits(*inputs)
    preds = np.argmax(logits, axis=-1)
    classes = _class_names(config)
    return [
        {
            "paths": list(g),
            "prediction": int(p),
            "word": classes[int(p)] if classes and int(p) < len(classes) else None,
            "logits": [float(x) for x in l],
        }
        for g, p, l in zip(groups, preds, logits)
    ]


def export_pipeline_stablehlo(
    config: Any, ckpt_path: str, pipeline: str, out_path: str, batch_size: int = 32
) -> None:
    """Serialize a checkpoint's fixed-batch inference fn to StableHLO bytes
    on disk (reload anywhere with ``jax.export.deserialize``)."""
    if pipeline == "audio":
        from multimodal_lipread_tpu.models.audio import get_audio_model
        from multimodal_lipread_tpu.pipelines.common import model_dtype

        input_size = config.get("dataset.input_size", 117)
        model = get_audio_model(
            config.get("model.name", "resnet"), config.get("dataset.num_classes", 4),
            input_size=input_size,
            version=config.get("model.version", 16),
            use_batchnorm=config.get("model.use_batchnorm", True),
            dtype=model_dtype(config),
        )
        if bool(config.get("dataset.streaming", False)):
            # streaming-trained checkpoints wrap the classifier in
            # WaveToLogMel (pipelines/audio.py): the param tree nests one
            # level deeper and the exported graph takes raw 20k waveforms
            # (log-mel runs inside the serialized module)
            from multimodal_lipread_tpu.data.audio_io import TARGET_SAMPLES
            from multimodal_lipread_tpu.models.frontend import WaveToLogMel

            model = WaveToLogMel(model, input_size=input_size)
            example = (np.zeros((batch_size, TARGET_SAMPLES), np.float32),)
        else:
            example = (np.zeros((batch_size, 80, input_size), np.float32),)
    else:
        model = build_model(pipeline, config)
        example = _example_inputs(pipeline, config, batch_size)
    predictor = Predictor.from_checkpoint(model, ckpt_path, tuple(a[:1] for a in example))
    # export the float-input graph (uint8 lips are normalized host-side by
    # the caller of a serialized module; keeps the exported IO contract f32)
    example_f = tuple(
        a.astype(np.float32) / 255.0 if a.dtype == np.uint8 else a for a in example
    )
    data = export_stablehlo(model, predictor.variables, example_f)
    with open(out_path, "wb") as f:
        f.write(data)


def _example_inputs(pipeline: str, config: Any, batch: int):
    from multimodal_lipread_tpu.data.cues import EMBED_DIMS, canonical_embed_model

    input_size = config.get("dataset.input_size", 117)
    seq = config.get("dataset.sequence_length", 29)
    mel = np.zeros((batch, 80, input_size), np.float32)
    lips = np.zeros((batch, seq, 44, 44, 3), np.uint8)
    if pipeline == "cues":
        # the cue CLASSIFIER's input shape follows the model's featurization
        # kind (models/cues.py CUE_MODEL_SPECS), not dataset.embed_model
        from multimodal_lipread_tpu.models.cues import CUE_MODEL_SPECS

        kind = CUE_MODEL_SPECS[config.get("model.name", "dense_nn")][1]
        if kind == "tfidf":
            raise ValueError(
                "the 'linear' (TF-IDF) cue model fits its vectorizer on the "
                "training corpus and cannot be exported from a checkpoint "
                "alone — use an embedding-based cue model"
            )
        if kind == "bert_tok":
            cue = np.zeros((batch, 32), np.int32)  # token ids
        elif kind.endswith("_tok"):
            cue = np.zeros((batch, 32, EMBED_DIMS[kind[:-4]]), np.float32)
        else:
            cue = np.zeros((batch, EMBED_DIMS[kind]), np.float32)
    else:
        embed = canonical_embed_model(config.get("dataset.embed_model", "mpnet"))
        cue = np.zeros((batch, EMBED_DIMS[embed]), np.float32)
    return {
        "video": (lips,),
        "audio_video": (mel, lips),
        "cues": (cue,),
        "audio_cues": (mel, cue),
        "cues_video": (cue, lips),
        "audio_cues_video": (mel, cue, lips),
    }[pipeline]


def main():
    import argparse
    import json

    from multimodal_lipread_tpu.config import load_config

    parser = argparse.ArgumentParser(
        description="Serve ANY pipeline's trained checkpoint: classify clips "
        "or export the inference graph to StableHLO",
    )
    parser.add_argument(
        "--pipeline", default="audio", choices=PIPELINES,
        help="which pipeline's checkpoint/featurization to use",
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument(
        "--data-parallel", action="store_true",
        help="shard the serving batch over ALL local devices (1-D mesh, "
        "replicated params) — logits identical to single-device serving",
    )
    parser.add_argument(
        "--export", metavar="PATH.stablehlo",
        help="instead of classifying, serialize the inference fn to PATH",
    )
    parser.add_argument(
        "clips", nargs="*",
        help="per-clip inputs; multi-modal pipelines take comma-separated "
        "groups, e.g. 'clip.wav,cue.txt,lips.npy' (order: audio, cue, lips "
        "as applicable)",
    )
    args = parser.parse_args()
    config = load_config(args.config)
    if args.export:
        export_pipeline_stablehlo(
            config, args.checkpoint, args.pipeline, args.export, args.batch_size
        )
        print(json.dumps({"exported": args.export, "pipeline": args.pipeline}))
        return
    if not args.clips:
        parser.error("no clips given (and no --export)")
    mesh = None
    if args.data_parallel:
        from multimodal_lipread_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
    groups = [c.split(",") for c in args.clips]
    results = predict_clips(
        config, args.checkpoint, args.pipeline, groups, args.batch_size, mesh=mesh
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
