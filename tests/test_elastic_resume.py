"""Mesh-elastic resume: checkpoints are portable across device topologies.

A preempted run must be resumable on whatever slice the scheduler hands back
— fewer chips, or a different parallelism layout. Checkpoints are host
pytrees (gathered on save), so restore re-places them on the CURRENT mesh
(`Trainer._place`); combined with the pinned 1-vs-8 mesh invariance
(tests/test_mesh_invariance.py) the resumed trajectory matches the
uninterrupted one. The reference has no notion of this (single device,
SURVEY.md §2.10); it's a scale-out capability of this framework.
"""

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_lipread_tpu.models.bert import (
    BERT_TP_RULES,
    BertClassifier,
    BertConfig,
)
from multimodal_lipread_tpu.parallel.mesh import get_mesh, get_mesh_2d
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(16)(x.reshape(x.shape[0], -1))
        x = nn.relu(x)
        return nn.Dense(4)(x)


def _data(n=48, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    x = rng.standard_normal((n, 20)).astype(np.float32) * 0.1
    for i, l in enumerate(labels):
        x[i, l * 5 : l * 5 + 5] += 2.0
    return ArrayDataset(inputs=(x,), labels=labels)


def _trainer(tmp_path, tag, epochs, mesh):
    return Trainer(
        _Tiny(),
        TrainerConfig(
            model_name=f"tiny_{tag}", num_classes=4, batch_size=16,
            epochs=epochs, learning_rate=1e-2, weight_decay=0.0,
            rolling_checkpoint=True, test_every_epoch=False,
            metrics_dir=str(tmp_path / tag / "m"),
            checkpoints_dir=str(tmp_path / tag / "c"),
        ),
        mesh=mesh,
    )


def test_resume_on_smaller_mesh(tmp_path):
    """2 epochs on 8 devices → resume epochs 3-4 on 2 devices: trajectory
    matches the uninterrupted 8-device run (checkpoints carry no mesh)."""
    train_ds, val_ds = _data(48, 0), _data(16, 1)

    full = _trainer(tmp_path, "full", 4, get_mesh()).fit(
        train_ds, val_ds, progress=None
    )

    # same model_name/dirs across the interrupted pair so resume finds it
    _trainer(tmp_path, "elastic", 2, get_mesh()).fit(
        train_ds, val_ds, progress=None
    )
    small_mesh = get_mesh(jax.devices()[:2])
    resumed = _trainer(tmp_path, "elastic", 4, small_mesh).fit(
        train_ds, val_ds, resume=True, progress=None
    )

    assert [h["epoch"] for h in resumed["history"]] == [3, 4]
    by_epoch = {h["epoch"]: h for h in full["history"]}
    for h in resumed["history"]:
        ref = by_epoch[h["epoch"]]
        np.testing.assert_allclose(h["train_loss"], ref["train_loss"], rtol=5e-3)
        np.testing.assert_allclose(h["val_loss"], ref["val_loss"], rtol=5e-3)


def test_tp_checkpoint_restores_to_dp_and_back(tmp_path):
    """A tensor-parallel run's checkpoint resumes as pure DP (and a DP
    checkpoint resumes tensor-parallel): save gathers to host, restore
    re-places per the CURRENT trainer's rules."""
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                     intermediate_size=32, max_position=16, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, size=(32, 12)).astype(np.int32)
    labels = rng.integers(0, 4, size=32).astype(np.int32)
    train_ds = val_ds = ArrayDataset(inputs=(ids,), labels=labels)

    def bert_trainer(epochs, mesh, rules):
        return Trainer(
            BertClassifier(cfg, num_classes=4),
            TrainerConfig(
                model_name="bert_elastic", num_classes=4, batch_size=16,
                epochs=epochs, learning_rate=1e-3, weight_decay=0.0,
                rolling_checkpoint=True, test_every_epoch=False,
                metrics_dir=str(tmp_path / "m"),
                checkpoints_dir=str(tmp_path / "c"),
                param_partition_rules=rules,
            ),
            mesh=mesh,
        )

    bert_trainer(1, get_mesh_2d(4), BERT_TP_RULES).fit(
        train_ds, val_ds, progress=None
    )

    # TP checkpoint → DP trainer: params come back replicated
    dp = bert_trainer(2, get_mesh(), ())
    result = dp.fit(train_ds, val_ds, resume=True, progress=None)
    assert [h["epoch"] for h in result["history"]] == [2]
    assert np.isfinite(result["history"][0]["train_loss"])
    q = dp.state["params"]["layer0"]["attention"]["query"]["kernel"]
    assert q.sharding.is_equivalent_to(NamedSharding(dp.mesh, P()), q.ndim)

    # DP checkpoint → TP trainer at a DIFFERENT degree (2): rule shardings
    tp2_mesh = get_mesh_2d(2)
    tp2 = bert_trainer(3, tp2_mesh, BERT_TP_RULES)
    result = tp2.fit(train_ds, val_ds, resume=True, progress=None)
    assert [h["epoch"] for h in result["history"]] == [3]
    q = tp2.state["params"]["layer0"]["attention"]["query"]["kernel"]
    assert q.sharding.is_equivalent_to(
        NamedSharding(tp2_mesh, P(None, "model", None)), q.ndim
    )
