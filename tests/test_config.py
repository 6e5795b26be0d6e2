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


def test_scientific_notation_floats_coerced(tmp_path):
    """PyYAML (YAML 1.1) loads dot-less scientific notation ('1e-3') as a
    STRING; the loader must hand numeric consumers a float (optax crashed
    on the string otherwise). Words and quoted strings stay untouched."""
    p = tmp_path / "c.yaml"
    p.write_text(
        "training:\n"
        "  learning_rate: 1e-3\n"
        "  weight_decay: 5E4\n"
        "  plain: 0.5\n"
        "model:\n  name: e2\n  tag: '1e-3'\n  exps: [1e-2, ok]\n"
    )
    cfg = load_config(str(p))
    assert cfg.get("training.learning_rate") == pytest.approx(1e-3)
    assert cfg.get("training.weight_decay") == pytest.approx(5e4)
    assert cfg.get("training.plain") == pytest.approx(0.5)
    # YAML already unquotes '1e-3' to the same string as unquoted — both
    # coerce; what must NOT change is anything non-numeric
    assert cfg.get("model.name") == "e2"
    assert cfg.get("model.exps")[0] == pytest.approx(1e-2)
    assert cfg.get("model.exps")[1] == "ok"
