"""Mesh-size invariance: 1-device vs 8-device training must agree.

The data-parallel contract (parallel/mesh.py): the batch axis is sharded,
parameters replicated, and every reduction (loss mean, gradient psum,
BatchNorm batch statistics) is a GLOBAL reduction under SPMD — so mesh size
must not change the math. Two layers of evidence:

1. ``test_gradient_and_forward_invariance`` — loss, gradients, and updated
   BN statistics from one train step agree to float-noise tolerance
   (≤1e-6). This directly pins psum / sharded-BN / weight-0-padding
   correctness: a wrong collective shows up as O(0.1) error here.
2. ``test_1_vs_8_device_trajectory`` — a full 3-epoch fit agrees at
   rtol 5e-3. Looser on purpose: Adam's first-step normalization
   ``g/(|g|+ε)`` amplifies reduction-ORDER noise (~1e-10) on near-zero
   gradients into ~1e-4 parameter differences (measured; inherent to any
   reduction-tree change, not a sharding defect), which compounds
   chaotically over steps.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_lipread_tpu.parallel.mesh import get_mesh
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig

NUM_CLASSES = 4


class _BnMlp(nn.Module):
    """Dense + BatchNorm + Dropout: exercises batch-statistic collectives,
    rng-driven dropout, and the optimizer path."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(32)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2)(x, deterministic=not train)
        return nn.Dense(NUM_CLASSES)(x)


def _data(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, 16)).astype(np.float32)
    labels = (np.arange(n) % NUM_CLASSES).astype(np.int32)
    for i, l in enumerate(labels):
        x[i, l * 3 : l * 3 + 3] += 2.0
    return ArrayDataset(inputs=(x,), labels=labels)


def _trainer(mesh, tmp_path, tag, **kw):
    cfg = dict(
        model_name=f"mi_{tag}", num_classes=NUM_CLASSES, batch_size=16,
        epochs=3, learning_rate=1e-2, weight_decay=1e-4,
        metrics_dir=str(tmp_path / tag / "m"),
        checkpoints_dir=str(tmp_path / tag / "c"),
        test_every_epoch=False, seed=0,
    )
    cfg.update(kw)
    return Trainer(_BnMlp(), TrainerConfig(**cfg), mesh=mesh)


def test_gradient_and_forward_invariance(tmp_path):
    """Loss / grads / updated BN stats from one step: 1 vs 8 devices."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the virtual 8-CPU mesh"
    # n=24 with batch 16 → the second batch carries 8 weight-0 pad rows,
    # so the padding path is inside the compared computation too
    ds = _data(24, 0)
    results = {}
    for nd in (1, 8):
        trainer = _trainer(get_mesh(devices[:nd]), tmp_path, f"g{nd}")
        trainer.init_state(ds.inputs)
        trainer._build_steps()
        grads_all, losses = [], []
        state = trainer.state
        for inputs, labels, weights in trainer._batches(
            ds, shuffle=False, rng=np.random.default_rng(0)
        ):
            params = state["params"]

            def loss_fn(p):
                logits, _ = trainer.model.apply(
                    {"params": p, "batch_stats": state["batch_stats"]},
                    inputs[0], train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(3)},
                )
                import optax

                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                )
                return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1e-9)

            loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
            losses.append(float(loss))
            grads_all.append(jax.tree_util.tree_map(np.asarray, grads))
        results[nd] = (losses, grads_all)

    for l1, l8 in zip(results[1][0], results[8][0]):
        assert l8 == pytest.approx(l1, abs=1e-6)
    for g1, g8 in zip(results[1][1], results[8][1]):
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_1_vs_8_device_trajectory(tmp_path):
    devices = jax.devices()
    results = {}
    for nd in (1, 8):
        trainer = _trainer(get_mesh(devices[:nd]), tmp_path, f"t{nd}")
        trainer.init_state(_data(40, 0).inputs)
        results[nd] = trainer.fit(_data(40, 0), _data(24, 1), None, progress=None)

    h1, h8 = results[1]["history"], results[8]["history"]
    assert len(h1) == len(h8) == 3
    for a, b in zip(h1, h8):
        # same trajectory up to Adam-amplified reduction-order noise
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=5e-3)
        assert b["val_loss"] == pytest.approx(a["val_loss"], rel=5e-3)
        assert b["train_acc"] == a["train_acc"]
        assert b["val_acc"] == a["val_acc"]
    assert results[8]["best_val_acc"] == pytest.approx(results[1]["best_val_acc"])
