"""Console entry points (``pyproject.toml [project.scripts]``).

The reference invokes each subsystem as ``python <subsystem>/train.py`` with
a hard-coded config path (reference: audio/train.py:193-197); here every
pipeline is a proper console script taking ``--config path.yaml
[--set k=v ...] [--resume]``:

    mlt-audio --config configs/audio_config.yaml
    mlt-lip-extract --root /data/GLips
"""

from __future__ import annotations

import importlib
import sys


def _pipeline_main(name: str) -> int:
    """Run a training pipeline module's __main__ path with current argv."""
    mod = importlib.import_module(f"multimodal_lipread_tpu.pipelines.{name}")
    from multimodal_lipread_tpu.pipelines.common import parse_cli

    cfg = parse_cli()
    mod.main(cfg, resume=bool(cfg.get("_cli.resume", False)))
    return 0


def audio() -> int:
    return _pipeline_main("audio")


def video() -> int:
    return _pipeline_main("video")


def audio_video() -> int:
    return _pipeline_main("audio_video")


def cues() -> int:
    return _pipeline_main("cues")


def audio_cues() -> int:
    return _pipeline_main("audio_cues")


def cues_video() -> int:
    return _pipeline_main("cues_video")


def audio_cues_video() -> int:
    return _pipeline_main("audio_cues_video")


def _module_main(dotted: str) -> int:
    """Run a module that defines its own argparse __main__ entry."""
    import runpy

    runpy.run_module(dotted, run_name="__main__")
    return 0


def lip_extract() -> int:
    return _module_main("multimodal_lipread_tpu.data.lip_extraction")


def frame_extract() -> int:
    return _module_main("multimodal_lipread_tpu.data.frame_extraction")


def data_clean() -> int:
    return _module_main("multimodal_lipread_tpu.tools.data_clean")


def cue_generate() -> int:
    return _module_main("multimodal_lipread_tpu.tools.cue_generation")


def transcode() -> int:
    return _module_main("multimodal_lipread_tpu.tools.transcode")


def serve() -> int:
    return _module_main("multimodal_lipread_tpu.serving")


def plot() -> int:
    return _module_main("multimodal_lipread_tpu.utils.visualize")


if __name__ == "__main__":
    # `python -m multimodal_lipread_tpu.cli <pipeline> ...` also works
    if len(sys.argv) < 2:
        raise SystemExit("usage: cli.py <pipeline> --config <yaml> [...]")
    target = sys.argv.pop(1)
    sys.exit(_pipeline_main(target))
