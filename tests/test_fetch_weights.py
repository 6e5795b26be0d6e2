"""fetch_weights runbook tests (no egress needed)."""

import hashlib

import pytest

from multimodal_lipread_tpu.tools.fetch_weights import (
    WEIGHT_URLS,
    expected_hash_prefix,
    fetch,
    verify_file,
)


def test_every_converter_arch_has_a_url():
    # keep the runbook table in sync with the converter registry
    from multimodal_lipread_tpu.pipelines import common  # noqa: F401

    expected = {
        "resnet18", "resnet34", "resnet50", "vgg11", "vgg13", "vgg16", "vgg19",
        "mobilenet_v2", "mobilenet_v3_small", "shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
    }
    assert set(WEIGHT_URLS) == expected
    for url in WEIGHT_URLS.values():
        assert expected_hash_prefix(url)  # every URL embeds its sha256 prefix


def test_verify_file_checks_sha256_prefix(tmp_path):
    payload = b"fake checkpoint bytes"
    digest = hashlib.sha256(payload).hexdigest()
    good = tmp_path / f"model-{digest[:8]}.pth"
    good.write_bytes(payload)
    assert verify_file(str(good), f"https://example.com/model-{digest[:8]}.pth")
    assert not verify_file(str(good), "https://example.com/model-00000000.pth")


def test_fetch_existing_verified_file_is_reused(tmp_path):
    payload = b"fake checkpoint bytes"
    digest = hashlib.sha256(payload).hexdigest()
    url = f"https://download.invalid/model-{digest[:8]}.pth"
    import multimodal_lipread_tpu.tools.fetch_weights as fw

    fw.WEIGHT_URLS["_test_arch"] = url
    try:
        (tmp_path / f"model-{digest[:8]}.pth").write_bytes(payload)
        path = fetch("_test_arch", str(tmp_path))
        assert path.endswith(f"model-{digest[:8]}.pth")
    finally:
        del fw.WEIGHT_URLS["_test_arch"]


def test_fetch_without_egress_raises_actionable_error(tmp_path):
    import multimodal_lipread_tpu.tools.fetch_weights as fw

    fw.WEIGHT_URLS["_test_arch"] = "https://download.invalid/model-deadbeef.pth"
    try:
        with pytest.raises(RuntimeError, match="egress|download"):
            fetch("_test_arch", str(tmp_path), timeout=3.0)
    finally:
        del fw.WEIGHT_URLS["_test_arch"]


def test_missing_pretrained_path_message(tmp_path):
    """load_pretrained_backbones points at the fetch_weights runbook."""
    from multimodal_lipread_tpu.config import Config
    from multimodal_lipread_tpu.pipelines.common import load_pretrained_backbones
    from multimodal_lipread_tpu.train.trainer import Trainer, TrainerConfig
    from flax import linen as nn
    import numpy as np

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(4)(x.reshape(x.shape[0], -1))

    trainer = Trainer(
        Tiny(),
        TrainerConfig(model_name="t", num_classes=4, batch_size=8,
                      metrics_dir=str(tmp_path / "m"), checkpoints_dir=str(tmp_path / "c")),
    )
    trainer.init_state((np.zeros((8, 4), np.float32),))
    cfg = Config.from_dict({
        "model": {"pretrained": [{"arch": "resnet18",
                                  "path": str(tmp_path / "nope.pth"),
                                  "submodule": ["resnet"]}]},
    })
    with pytest.raises(FileNotFoundError, match="fetch_weights"):
        load_pretrained_backbones(trainer, cfg)
