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
from typing import Any, Dict, Optional

import yaml


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
        return config or {}

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
