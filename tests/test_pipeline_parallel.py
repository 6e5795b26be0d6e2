"""Pipeline parallelism: (data, stage) mesh + GPipe shard_map schedule.

The reference is single-device (SURVEY.md §2.10); the BERT cue fine-tune
(cues/models/bert.py:23-299 — 12 uniform encoder layers) is the one family
deep enough to stage. These tests validate the GPipe engine end-to-end on
the virtual 8-device CPU mesh: the pipelined forward/backward match the
unpipelined BertClassifier to float tolerance, stacked params AND Adam
moments shard over 'stage', a PP training trajectory matches the sequential
path, PP checkpoints restore as standard per-layer trees (mesh-elastic
story), and misconfigurations fail loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_lipread_tpu.models.bert import (
    BERT_PP_RULES,
    BertClassifier,
    BertConfig,
    PipelinedBertClassifier,
    stack_bert_layers,
    unstack_bert_layers,
)
from multimodal_lipread_tpu.parallel.mesh import get_mesh, place_state
from multimodal_lipread_tpu.parallel.pipeline import get_mesh_pp
from multimodal_lipread_tpu.train.trainer import ArrayDataset, Trainer, TrainerConfig

NUM_CLASSES = 4
SEQ = 12


def tiny_cfg(num_layers=4, dropout=0.0):
    # dropout 0 for parity tests: the GPipe schedule folds dropout keys per
    # (layer, microbatch) cell, so draws differ from the sequential path by
    # construction — exactly why trajectory comparisons must exclude it
    return BertConfig(vocab_size=64, hidden_size=32, num_layers=num_layers,
                      num_heads=4, intermediate_size=32, max_position=16,
                      dropout_rate=dropout)


def make_data(n=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 64, size=(n, SEQ)).astype(np.int32)
    ids[:, 0] = 1  # [CLS]
    labels = rng.integers(0, NUM_CLASSES, size=n).astype(np.int32)
    return ArrayDataset(inputs=(ids,), labels=labels)


def init_base(cfg, ids):
    model = BertClassifier(cfg, num_classes=NUM_CLASSES)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, ids, train=False)
    return model, dict(v["params"])


def test_stack_unstack_roundtrip():
    cfg = tiny_cfg()
    ds = make_data()
    _, params = init_base(cfg, ds.inputs[0][:2])
    stacked = stack_bert_layers(params, cfg.num_layers)
    assert "encoder" in stacked and "layer0" not in stacked
    # every stacked leaf gained a leading num_layers axis
    for leaf in jax.tree_util.tree_leaves(stacked["encoder"]):
        assert leaf.shape[0] == cfg.num_layers
    back = unstack_bert_layers(stacked, cfg.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, back
    )


def test_pipelined_forward_and_grads_match_sequential():
    cfg = tiny_cfg()
    ds = make_data(n=8)
    ids, labels = ds.inputs[0], ds.labels
    base, params = init_base(cfg, ids)
    logits_ref = base.apply({"params": params}, ids, train=False)

    mesh = get_mesh_pp(4)  # data=2 x stage=4
    pp = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=4, mesh=mesh)
    pp_params = stack_bert_layers(params, cfg.num_layers)
    logits_pp = jax.jit(lambda p, x: pp.apply({"params": p}, x, train=False))(
        pp_params, ids
    )
    np.testing.assert_allclose(logits_pp, logits_ref, atol=1e-5)

    def loss_base(p):
        lg = base.apply({"params": p}, ids, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(lg, labels).mean()

    def loss_pp(p):
        lg = pp.apply({"params": p}, ids, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(lg, labels).mean()

    g_ref = jax.grad(loss_base)(params)
    g_pp = unstack_bert_layers(
        dict(jax.jit(jax.grad(loss_pp))(pp_params)), cfg.num_layers
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g_ref, g_pp
    )


def test_pipelined_dropout_trains():
    # the scheduled path with real dropout: runs, finite, and actually
    # stochastic across keys (the per-(layer, microbatch) fold is live)
    cfg = tiny_cfg(dropout=0.3)
    ds = make_data(n=8)
    mesh = get_mesh_pp(2)
    pp = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=2, mesh=mesh)
    v = pp.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)}, ds.inputs[0], train=False)
    f = jax.jit(lambda p, x, k: pp.apply(p, x, train=True, rngs={"dropout": k}))
    a = f(v, ds.inputs[0], jax.random.PRNGKey(1))
    b = f(v, ds.inputs[0], jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(a).all()) and bool(jnp.isfinite(b).all())
    assert float(jnp.abs(a - b).max()) > 0


def make_trainer(model, rules, mesh, tmp_path, name):
    return Trainer(
        model,
        TrainerConfig(
            model_name=name, num_classes=NUM_CLASSES, batch_size=8, epochs=1,
            learning_rate=1e-3, weight_decay=0.0, test_every_epoch=False,
            metrics_dir=str(tmp_path / "metrics"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            param_partition_rules=rules,
        ),
        mesh=mesh,
    )


def test_stage_sharding_and_trajectory_matches_sequential(tmp_path):
    cfg = tiny_cfg()
    ds = make_data()
    mesh = get_mesh_pp(4)
    pp_model = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=4, mesh=mesh)
    seq_model = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=1)

    pp = make_trainer(pp_model, BERT_PP_RULES, mesh, tmp_path / "pp", "pp_run")
    seq = make_trainer(seq_model, (), get_mesh(), tmp_path / "seq", "seq_ref")

    pp.init_state(ds.inputs)
    seq.init_state(ds.inputs)

    # identical starting point: the stacked-init draw is the same module code
    enc_pp = jax.device_get(pp.state["params"]["encoder"])
    enc_seq = jax.device_get(seq.state["params"]["encoder"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), enc_pp, enc_seq
    )

    # stacked encoder leaves shard their layer axis over 'stage'
    flat = jax.tree_util.tree_flatten_with_path(pp.state["params"]["encoder"])[0]
    for path, leaf in flat:
        assert leaf.sharding.is_equivalent_to(
            NamedSharding(mesh, P("stage")), leaf.ndim
        ), f"{path} not stage-sharded"
        shard0 = leaf.addressable_shards[0].data
        assert shard0.shape[0] == cfg.num_layers // 4
    # Adam moments mirror the rule (per-stage optimizer memory)
    opt_flat = jax.tree_util.tree_flatten_with_path(pp.state["opt_state"])[0]
    mu_enc = [
        leaf for path, leaf in opt_flat
        if "mu" in str(path) and "encoder" in str(path)
    ]
    assert mu_enc and all(
        leaf.sharding.is_equivalent_to(NamedSharding(mesh, P("stage")), leaf.ndim)
        for leaf in mu_enc
    )

    pp_losses = [pp.train_single_batch(ds, seed=s) for s in range(3)]
    seq_losses = [seq.train_single_batch(ds, seed=s) for s in range(3)]
    np.testing.assert_allclose(pp_losses, seq_losses, rtol=2e-4)
    assert seq_losses[0] != seq_losses[2]

    pp_m = pp.evaluate(ds)
    seq_m = seq.evaluate(ds)
    np.testing.assert_allclose(pp_m.loss, seq_m.loss, rtol=2e-4)
    assert pp_m.acc == seq_m.acc


def test_pp_checkpoint_restores_as_standard_bert(tmp_path):
    # mesh-elastic story: a stage-sharded PP run's params, unstacked, ARE a
    # BertClassifier checkpoint — restorable on any mesh (or none)
    cfg = tiny_cfg()
    ds = make_data()
    mesh = get_mesh_pp(2)
    pp_model = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=2, mesh=mesh)
    pp = make_trainer(pp_model, BERT_PP_RULES, mesh, tmp_path, "pp_ckpt")
    pp.init_state(ds.inputs)
    pp.train_single_batch(ds, seed=0)

    trained = jax.device_get(pp.state["params"])
    ids = ds.inputs[0]
    logits_pp = pp_model.apply({"params": trained}, ids, train=False)

    std = unstack_bert_layers(dict(trained), cfg.num_layers)
    base = BertClassifier(cfg, num_classes=NUM_CLASSES)
    logits_std = base.apply({"params": std}, ids, train=False)
    np.testing.assert_allclose(logits_std, logits_pp, atol=1e-5)


def test_misconfigurations_fail_loudly():
    with pytest.raises(ValueError, match="must divide"):
        get_mesh_pp(3)
    mesh = get_mesh_pp(2)
    assert mesh.axis_names == ("data", "stage")

    # layers not divisible by stages
    cfg = tiny_cfg(num_layers=3)
    pp = PipelinedBertClassifier(cfg, NUM_CLASSES, num_stages=2, mesh=mesh)
    ids = np.ones((8, SEQ), np.int32)
    with pytest.raises(ValueError, match="divisible"):
        pp.init({"params": jax.random.PRNGKey(0)}, ids, train=False)

    # per-shard batch not divisible by microbatch count
    cfg4 = tiny_cfg()
    pp4 = PipelinedBertClassifier(
        cfg4, NUM_CLASSES, num_stages=2, mesh=mesh, num_microbatches=3
    )
    with pytest.raises(ValueError, match="num_microbatches"):
        pp4.init({"params": jax.random.PRNGKey(0)}, ids, train=False)

    # the "..." partition-rule marker still validates leading rank
    with pytest.raises(ValueError, match="leading dims"):
        place_state(
            mesh, {"w": np.zeros((4,))}, ((r"w$", ("stage", None, "...")),)
        )


def test_cue_pipeline_knob_builds_pipelined_bert():
    from multimodal_lipread_tpu.models.cues import get_cue_model

    mesh = get_mesh_pp(2)
    m = get_cue_model("bert", 4, pipeline_stages=2, mesh=mesh)
    assert isinstance(m, PipelinedBertClassifier) and m.num_stages == 2
    with pytest.raises(ValueError, match="only supported for the BERT"):
        get_cue_model("dense_nn", 4, pipeline_stages=2, mesh=mesh)
