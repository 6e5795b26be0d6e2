"""Per-pipeline entry points mirroring the reference's seven train.py scripts.

Each module exposes ``main(config_path, overrides=None)`` and a CLI
(``python -m multimodal_lipread_tpu.pipelines.<name> --config path.yaml
[--set key=value ...]``) — the reference hard-codes config paths in
``__main__`` (e.g. audio/train.py:194); we take them as flags (SURVEY.md §5).
"""
