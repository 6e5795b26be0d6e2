"""arch:checkpoint grafting — in-framework transfer of a trained submodule.

Covers pipelines.common.load_pretrained_backbones' msgpack branch: a
backbone subtree from one of THIS framework's own Trainer checkpoints
grafts into another model's tree (e.g. warm-start vgg_lstm's VGG features
from a vgg run — the structured-prior instrument of the audio rank study,
experiments/audio_rank_study.py)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.serialization import msgpack_serialize

from multimodal_lipread_tpu.config import Config
from multimodal_lipread_tpu.models.audio import get_audio_model
from multimodal_lipread_tpu.parallel.mesh import get_mesh
from multimodal_lipread_tpu.pipelines.common import load_pretrained_backbones


def _init(model, *shapes):
    rng = jax.random.PRNGKey(0)
    dummies = [jnp.zeros(s, jnp.float32) for s in shapes]
    return model.init({"params": rng, "dropout": rng}, *dummies, train=False)


def _fake_trainer(variables):
    from flax.core import unfreeze

    return types.SimpleNamespace(
        state={"params": unfreeze(variables["params"]),
               "batch_stats": unfreeze(variables.get("batch_stats", {}))},
        mesh=get_mesh(),
    )


@pytest.fixture(scope="module")
def vgg_ckpt(tmp_path_factory):
    """A 'trained' AudioVGG checkpoint (random init stands in for training —
    the graft mechanics don't care)."""
    src = get_audio_model("vgg", 7, version=16)
    variables = _init(src, (1, 80, 117))
    path = tmp_path_factory.mktemp("ckpt") / "vgg_best.msgpack"
    blob = msgpack_serialize(
        {"epoch": 1,
         "state": {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})},
         "val_acc": 50.0, "scheduler_lr": 1e-3})
    path.write_bytes(blob)
    return str(path), variables


def test_checkpoint_graft_into_sibling_model(vgg_ckpt):
    path, src_vars = vgg_ckpt
    # different head (num_classes 4 vs 7) and extra LSTM — only the shared
    # 'vgg' subtree shapes must match
    dst = get_audio_model("vgg_lstm", 4, version=16)
    trainer = _fake_trainer(_init(dst, (1, 80, 117)))

    cfg = Config.from_dict({"model": {"pretrained": {
        "arch": "checkpoint", "path": path,
        "source_submodule": ["vgg"], "submodule": ["vgg"]}}})
    assert load_pretrained_backbones(trainer, cfg) == 1

    got = trainer.state["params"]["vgg"]
    want = src_vars["params"]["vgg"]
    leaf_got = jax.tree_util.tree_leaves(got)
    leaf_want = jax.tree_util.tree_leaves(want)
    assert len(leaf_got) == len(leaf_want) > 0
    for a, b in zip(leaf_got, leaf_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # batch_stats came along too (VGG is BN-heavy)
    assert trainer.state["batch_stats"]["vgg"]


def test_checkpoint_graft_shape_mismatch_raises(vgg_ckpt):
    path, _ = vgg_ckpt
    dst = get_audio_model("resnet", 4)  # no 'vgg'-shaped subtree
    trainer = _fake_trainer(_init(dst, (1, 80, 117)))
    cfg = Config.from_dict({"model": {"pretrained": {
        "arch": "checkpoint", "path": path,
        "source_submodule": ["vgg"], "submodule": ["resnet"]}}})
    with pytest.raises(ValueError, match="mismatch"):
        load_pretrained_backbones(trainer, cfg)


def test_checkpoint_graft_whole_tree(vgg_ckpt):
    """Omitting source_submodule grafts the full source tree (same-model
    warm start)."""
    path, src_vars = vgg_ckpt
    dst = get_audio_model("vgg", 7, version=16)
    trainer = _fake_trainer(_init(dst, (1, 80, 117)))
    # target the whole params tree via a 1-level wrapper: graft at 'vgg'
    cfg = Config.from_dict({"model": {"pretrained": {
        "arch": "checkpoint", "path": path,
        "source_submodule": ["vgg"], "submodule": ["vgg"]}}})
    assert load_pretrained_backbones(trainer, cfg) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer.state["params"]["vgg"])[0]),
        np.asarray(jax.tree_util.tree_leaves(src_vars["params"]["vgg"])[0]))
