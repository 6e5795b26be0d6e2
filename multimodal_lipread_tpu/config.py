"""YAML configuration loader with dot-path access.

API-compatible with the reference's per-subsystem config loaders
(reference: audio/configs/config.py:11-83, duplicated in video/config,
audio_video/config, cues/config, audio_cues/configs, cues_video/configs,
audio_cues_video/configs). This framework keeps ONE copy.

Extensions over the reference:
- ``Config.from_dict`` for programmatic/test construction
- ``set`` for dot-path overrides (used by CLI ``--set key=value`` flags)
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import yaml

# YAML 1.1 (PyYAML) resolves floats only when the mantissa has a '.', so the
# common shorthands ``1e-3`` / ``5e4`` load as STRINGS and crash numeric
# consumers (optax got "bad operand type for unary -: 'str'"). Normalize
# such scalars to float after parsing — applied to loaded files and CLI
# ``--set`` values alike.
_SCI_FLOAT = re.compile(r"^[-+]?(\d+(\.\d*)?|\.\d+)[eE][-+]?\d+$")


def coerce_yaml_scalar(value: Any) -> Any:
    """float-ify scientific-notation strings PyYAML left unparsed."""
    if isinstance(value, str) and _SCI_FLOAT.match(value):
        return float(value)
    return value


def _coerce_tree(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _coerce_tree(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_tree(v) for v in node]
    return coerce_yaml_scalar(node)


class Config:
    """Nested-dict configuration with dot-notation ``get``.

    ``Config(path)`` loads a YAML file; ``Config.from_dict(d)`` wraps an
    existing dictionary.
    """

    def __init__(self, config_path: Optional[str] = None, *, _data: Optional[Dict[str, Any]] = None):
        self.config_path = config_path
        if _data is not None:
            self.config = _data
        else:
            if config_path is None:
                raise ValueError("Config requires a path or _data dict")
            self.config = self._load_config()

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Config":
        return cls(_data=dict(data))

    def _load_config(self) -> Dict[str, Any]:
        if not os.path.exists(self.config_path):
            raise FileNotFoundError(f"Config file not found: {self.config_path}")
        with open(self.config_path, "r") as f:
            config = yaml.safe_load(f)
        return _coerce_tree(config) or {}

    def get(self, key: str, default: Optional[Any] = None) -> Any:
        """Get a value by dot-path key (e.g. ``model.name``)."""
        value: Any = self.config
        for k in key.split("."):
            if isinstance(value, dict) and k in value:
                value = value[k]
            else:
                return default
        return value

    def set(self, key: str, value: Any) -> None:
        """Set a value by dot-path key, creating intermediate dicts."""
        keys = key.split(".")
        node = self.config
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def get_all(self) -> Dict[str, Any]:
        return self.config

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.config, f, sort_keys=False)


def load_config(config_path: str) -> Config:
    """Load a configuration file (reference: audio/configs/config.py:73-83)."""
    return Config(config_path)
