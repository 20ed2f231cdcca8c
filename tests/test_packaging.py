"""Packaging metadata stays truthful.

The reference ships installable packages (reference
modeling_utils/pyproject.toml, data_utils/pyproject.toml); this repo's
root pyproject.toml is the equivalent surface.  These tests pin the
parts that rot silently: console-script targets that stop resolving,
declared dependencies that the code no longer imports (or that are not
importable at all), and the C++ dataplane source falling out of the
wheel's package data.
"""

from __future__ import annotations

import importlib
import re
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# pypi distribution name -> import name, where they differ
_IMPORT_NAME = {
    "pyyaml": "yaml",
    "pillow": "PIL",
    "orbax-checkpoint": "orbax.checkpoint",
    "typing-extensions": "typing_extensions",
}


def _load():
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def test_console_scripts_resolve():
    scripts = _load()["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_core_dependencies_importable():
    deps = _load()["project"]["dependencies"]
    for spec in deps:
        dist = re.split(r"[<>=!\[ ]", spec, 1)[0]
        module = _IMPORT_NAME.get(dist, dist.replace("-", "_"))
        importlib.import_module(module)


def test_native_source_ships_as_package_data():
    pkg_data = _load()["tool"]["setuptools"]["package-data"]
    patterns = pkg_data["algonauts2025_tpu.native"]
    assert any(
        (ROOT / "algonauts2025_tpu" / "native").glob(p) for p in patterns
    ), "package-data patterns match no files"
    assert (ROOT / "algonauts2025_tpu" / "native" / "dataplane.cpp").exists()


def test_run_config_cli_usage_error():
    from algonauts2025_tpu.grids.run_config import cli

    import pytest

    with pytest.raises(SystemExit, match="usage"):
        cli([])
    with pytest.raises(SystemExit, match="usage"):
        cli(["a.json", "b.json"])
