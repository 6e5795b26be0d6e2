import pytest

from multimodal_lipread_tpu.config import Config, load_config


def test_load_yaml_and_dot_get(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  name: resnet\n  version: 16\ntraining:\n  batch_size: 32\n")
    cfg = load_config(str(p))
    assert cfg.get("model.name") == "resnet"
    assert cfg.get("model.version") == 16
    assert cfg.get("training.batch_size") == 32
    assert cfg.get("missing.key", 7) == 7
    assert cfg.get("model.name.too.deep", "d") == "d"
    assert cfg.get_all()["model"]["name"] == "resnet"


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/config.yaml")


def test_from_dict_and_set():
    cfg = Config.from_dict({"a": {"b": 1}})
    assert cfg.get("a.b") == 1
    cfg.set("a.c.d", 5)
    assert cfg.get("a.c.d") == 5
