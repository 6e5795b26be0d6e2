"""Tensor parallelism: 2-D (data, model) mesh + Megatron-style param rules.

The reference is single-device and its models are far below TP scale
(SURVEY.md §2.10: "tensor parallel — not needed; leave hooks in mesh axis
naming"); the BERT cue fine-tune (cues/models/bert.py:23-299, bert-base =
110M params) is the one family where sharding weights pays. These tests
validate the hooks end-to-end on the virtual 8-device CPU mesh: parameters
AND Adam moments shard per rule, the training trajectory matches pure DP,
and rule typos fail loudly.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_lipread_tpu.models.bert import (
    BERT_TP_RULES,
    BertClassifier,
    BertConfig,
)
from multimodal_lipread_tpu.parallel.mesh import (
    get_mesh,
    get_mesh_2d,
    place_state,
    resolve_partition_spec,
)
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig

NUM_CLASSES = 4


def tiny_bert():
    # dropout 0 so TP-vs-DP trajectories are deterministic: GSPMD may
    # generate RBG dropout bits differently under different activation
    # shardings, which is exactly why the comparison must exclude it
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                     intermediate_size=32, max_position=16, dropout_rate=0.0)
    return BertClassifier(cfg, num_classes=NUM_CLASSES)


def make_data(n=16, seq=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 64, size=(n, seq)).astype(np.int32)
    ids[:, 0] = 1  # [CLS]
    labels = rng.integers(0, NUM_CLASSES, size=n).astype(np.int32)
    return ArrayDataset(inputs=(ids,), labels=labels)


def make_trainer(mesh, rules, tmp_path, name):
    return Trainer(
        tiny_bert(),
        TrainerConfig(
            model_name=name, num_classes=NUM_CLASSES, batch_size=8, epochs=1,
            learning_rate=1e-3, weight_decay=0.0, test_every_epoch=False,
            metrics_dir=str(tmp_path / "metrics"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            param_partition_rules=rules,
        ),
        mesh=mesh,
    )


def test_rule_resolution():
    assert resolve_partition_spec(
        BERT_TP_RULES, "params/layer0/attention/query/kernel"
    ) == P(None, "model", None)
    assert resolve_partition_spec(
        BERT_TP_RULES, "params/layer0/attention/out/kernel"
    ) == P("model", None, None)
    assert resolve_partition_spec(
        BERT_TP_RULES, "params/layer0/output/kernel"
    ) == P("model", None)
    # norms / embeddings / pooler / head stay replicated
    for path in (
        "params/layer0/output_norm/scale",
        "params/layer0/attention/out/bias",
        "params/embeddings/word_embeddings/embedding",
        "params/pooler/kernel",
        "params/classifier/kernel",
    ):
        assert resolve_partition_spec(BERT_TP_RULES, path) == P()


def test_params_and_adam_moments_shard(tmp_path):
    mesh = get_mesh_2d(4)
    trainer = make_trainer(mesh, BERT_TP_RULES, tmp_path, "tp_shard")
    ds = make_data()
    trainer.init_state(ds.inputs)

    q = trainer.state["params"]["layer0"]["attention"]["query"]["kernel"]
    assert q.sharding.spec == P(None, "model", None)
    # each model shard holds 1/4 of the heads
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(32, 1, 8)}

    # the Adam moments mirror the param tree → same rule must have applied
    flat = jax.tree_util.tree_flatten_with_path(trainer.state["opt_state"])[0]
    mu_specs = [
        leaf.sharding.spec
        for path, leaf in flat
        if "mu" in str(path) and "query" in str(path) and "kernel" in str(path)
    ]
    assert mu_specs and all(spec == P(None, "model", None) for spec in mu_specs)


def test_tp_trajectory_matches_dp(tmp_path):
    ds = make_data()
    dp = make_trainer(get_mesh(), (), tmp_path / "dp", "dp_ref")
    tp = make_trainer(get_mesh_2d(4), BERT_TP_RULES, tmp_path / "tp", "tp_run")

    dp_losses = [dp.train_single_batch(ds, seed=s) for s in range(3)]
    tp_losses = [tp.train_single_batch(ds, seed=s) for s in range(3)]
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-4)
    # losses must actually evolve (optimizer really stepping under TP)
    assert dp_losses[0] != dp_losses[2]

    # updated params still carry the rule sharding (the constraint held);
    # compare via is_equivalent_to — XLA normalizes away trailing Nones
    from jax.sharding import NamedSharding

    q = tp.state["params"]["layer0"]["attention"]["query"]["kernel"]
    assert q.sharding.is_equivalent_to(
        NamedSharding(tp.mesh, P(None, "model", None)), q.ndim
    )

    # eval path: sharded params, replicated logits
    dp_m = dp.evaluate(ds)
    tp_m = tp.evaluate(ds)
    np.testing.assert_allclose(tp_m.loss, dp_m.loss, rtol=2e-4)
    assert tp_m.acc == dp_m.acc


def test_bad_rules_fail_loudly():
    mesh = get_mesh_2d(4)
    with pytest.raises(ValueError, match="not divisible"):
        place_state(mesh, {"w": np.zeros((6, 4))}, ((r"w$", ("model", None)),))
    with pytest.raises(ValueError, match="not in mesh axes"):
        place_state(mesh, {"w": np.zeros((8, 4))}, ((r"w$", ("expert", None)),))
    with pytest.raises(ValueError, match="rank"):
        place_state(mesh, {"w": np.zeros((8, 4))}, ((r"w$", ("model",)),))


def test_mesh_2d_shape_validation():
    with pytest.raises(ValueError, match="must divide"):
        get_mesh_2d(3)
    mesh = get_mesh_2d(2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
