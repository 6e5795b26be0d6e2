"""Precompute frozen-encoder features once per run.

The reference's early/middle fusion variants freeze their CNN encoders
(reference: audio_cues_video/models/early_fusion_mobile.py:136-152,
cues_video/models/early_fusion_mobile.py:68-127 ``freeze_backbone``) yet
still pay the full frozen forward every training step. With
``frozen_bn_eval`` the frozen encoders are per-sample deterministic, so
their outputs can be computed ONCE and the trainer then runs only the
trainable tail (``cached_features=True``) — the trajectory is exactly the
one the uncached ``frozen_bn_eval`` run produces (regression-tested in
tests/test_frozen_cache.py), at a fraction of the step FLOPs.

Opt-in via ``training.cache_frozen_features: true`` in the cues_video /
audio_cues_video pipelines.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import numpy as np

from multimodal_lipread_tpu.train.trainer import ArrayDataset


def compute_frozen_features(
    trainer, inputs: Sequence[np.ndarray], batch_size: int = 64
) -> Tuple[np.ndarray, ...]:
    """Run ``model.apply(..., return_frozen_features=True)`` over ``inputs``.

    Batched + jitted with ONE static shape (the final short batch is padded
    and trimmed); returns host numpy arrays, as a tuple even when the model
    returns a single feature array.
    """
    model = trainer.model
    params = trainer.state["params"]
    batch_stats = trainer.state["batch_stats"]

    # one jitted extractor per Trainer: the frozen forward is the expensive
    # video-CNN compile — caching on the trainer means train/val/test splits
    # (identical shapes) compile it once, not three times
    extract = getattr(trainer, "_frozen_extract_fn", None)
    if extract is None:
        import jax.numpy as jnp

        half = trainer.config.half_precision

        @jax.jit
        def extract(p, bs, *xs):
            # normalize/cast inputs EXACTLY like the train step's cast()
            # (trainer._build_steps) — with half_precision the uncached
            # frozen forward ran in bf16, so the cache must too, or the
            # cached trajectory deviates from the uncached one
            def cast(x):
                if x.dtype == jnp.uint8:
                    return x.astype(jnp.bfloat16 if half else jnp.float32) / 255.0
                if half and jnp.issubdtype(x.dtype, jnp.floating):
                    return x.astype(jnp.bfloat16)
                return x

            out = model.apply(
                {"params": p, "batch_stats": bs}, *(cast(x) for x in xs),
                train=False, return_frozen_features=True,
            )
            return out if isinstance(out, tuple) else (out,)

        trainer._frozen_extract_fn = extract

    n = inputs[0].shape[0]
    chunks = None
    for start in range(0, n, batch_size):
        rows = [a[start : start + batch_size] for a in inputs]
        k = rows[0].shape[0]
        if k < batch_size:  # pad to the compiled shape, trim after
            rows = [
                np.concatenate([a, np.repeat(a[:1], batch_size - k, axis=0)])
                for a in rows
            ]
        feats = extract(params, batch_stats, *rows)
        feats = [np.asarray(f)[:k] for f in feats]
        if chunks is None:
            chunks = [[] for _ in feats]
        for acc, f in zip(chunks, feats):
            acc.append(f)
    return tuple(np.concatenate(acc, axis=0) for acc in chunks)


def cached_dataset(
    trainer,
    ds: ArrayDataset,
    assemble: Callable[[Tuple[np.ndarray, ...], Tuple[np.ndarray, ...]], Tuple[np.ndarray, ...]],
    batch_size: int = 64,
) -> ArrayDataset:
    """ArrayDataset with frozen-encoder inputs replaced by cached features.

    ``assemble(raw_inputs, frozen_feats) -> new_inputs`` maps the raw input
    tuple plus the extracted features into the model's
    ``cached_features=True`` input signature.
    """
    feats = compute_frozen_features(trainer, ds.inputs, batch_size)
    return ArrayDataset(inputs=tuple(assemble(ds.inputs, feats)), labels=ds.labels)
