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
    """Fixed-batch jitted classifier head around trained variables."""

    model: Any
    variables: Dict[str, Any]
    batch_size: int = 32
    _compiled: Optional[Callable] = None

    @classmethod
    def from_checkpoint(
        cls,
        model: Any,
        ckpt_path: str,
        example_inputs: Sequence[np.ndarray],
        batch_size: int = 32,
    ) -> "Predictor":
        """Restore a Trainer checkpoint (``{epoch, state, val_acc, ...}``)."""
        rng = jax.random.PRNGKey(0)
        dummy = tuple(
            jnp.asarray(a[:1]).astype(jnp.float32) / 255.0
            if np.asarray(a).dtype == np.uint8 else jnp.asarray(a[:1])
            for a in example_inputs
        )
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
        return cls(model=model, variables=variables, batch_size=batch_size)

    def _forward(self):
        if self._compiled is None:
            model = self.model

            @jax.jit
            def fwd(variables, *inputs):
                # uint8 inputs (lip tensors) cross host→device at 1/4 the
                # bytes and normalize to [0,1] in-graph — the same contract
                # as the Trainer's train step
                inputs = tuple(
                    x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
                    for x in inputs
                )
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
            logits = np.asarray(fwd(self.variables, *map(jnp.asarray, chunk)))
            out.append(logits[:k])
        return np.concatenate(out, axis=0) if out else np.zeros((0, 0), np.float32)

    def predict(self, *inputs: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict_logits(*inputs), axis=-1)


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
    config: Any, ckpt_path: str, clip_paths: Sequence[str], batch_size: int = 32
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
    predictor = Predictor.from_checkpoint(model, ckpt_path, (inputs[:1],), batch_size)
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


def main():
    import argparse
    import json

    from multimodal_lipread_tpu.config import load_config

    parser = argparse.ArgumentParser(description="Classify audio clips with a trained checkpoint")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("clips", nargs="+")
    args = parser.parse_args()
    results = predict_audio_clips(load_config(args.config), args.checkpoint, args.clips)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
