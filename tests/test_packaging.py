"""Packaging contract: pyproject console entry points resolve and the
package metadata stays importable (reference ships requirements.txt:1-90;
here the equivalent surface is pyproject.toml [project.scripts])."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project_scripts():
    try:
        import tomllib
    except ImportError:  # py<3.11
        tomllib = None
    path = os.path.join(REPO, "pyproject.toml")
    if tomllib is not None:
        with open(path, "rb") as f:
            return tomllib.load(f)["project"]["scripts"]
    # minimal fallback parse of the [project.scripts] table
    scripts, in_table = {}, False
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if line.startswith("["):
            in_table = line == "[project.scripts]"
            continue
        if in_table and "=" in line:
            k, v = line.split("=", 1)
            scripts[k.strip()] = v.strip().strip('"')
    return scripts


def test_console_entry_points_resolve():
    """Every mlt-* script maps to an importable module attribute that is
    callable — catches renames in cli.py breaking installed consoles."""
    import importlib

    scripts = _project_scripts()
    assert len(scripts) >= 11, scripts  # 7 pipelines + 4 tooling CLIs
    for name, target in scripts.items():
        assert re.fullmatch(r"mlt-[a-z-]+", name), name
        mod_name, attr = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, attr)), f"{name} -> {target}"


def test_cli_module_usage_error():
    """`python -m multimodal_lipread_tpu.cli` with no args exits with usage."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "multimodal_lipread_tpu.cli"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode != 0
    assert "usage" in (proc.stderr + proc.stdout).lower()


def test_version_matches_pyproject():
    import multimodal_lipread_tpu as pkg

    text = open(os.path.join(REPO, "pyproject.toml"), encoding="utf-8").read()
    m = re.search(r'^version = "([^"]+)"', text, re.M)
    assert m, "pyproject.toml missing project version"
    assert pkg.__version__ == m.group(1)
