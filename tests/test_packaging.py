"""Packaging metadata stays truthful.

The reference ships installable packages (reference
modeling_utils/pyproject.toml, data_utils/pyproject.toml); this repo's
root pyproject.toml is the equivalent surface.  These tests pin the
parts that rot silently: console-script targets that stop resolving,
declared dependencies that the code no longer imports (or that are not
importable at all), package imports that nobody declared (the clean-
install failure mode), and the C++ dataplane source falling out of the
wheel's package data.
"""

from __future__ import annotations

import ast
import importlib
import re
import sys
from pathlib import Path

try:  # stdlib on >=3.11; pyproject allows 3.10 where tomli fills in
    import tomllib
except ModuleNotFoundError:  # pragma: no cover - py3.10 path
    import tomli as tomllib  # type: ignore[no-redef]

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "algonauts2025_tpu"

# pypi distribution name -> import name, where they differ
_IMPORT_NAME = {
    "pyyaml": "yaml",
    "pillow": "PIL",
    "orbax-checkpoint": "orbax.checkpoint",
    "typing-extensions": "typing_extensions",
    "opencv-python-headless": "cv2",
    "levenshtein": "Levenshtein",
}

# Declared deps whose import never appears in package source because they
# are loaded indirectly (engine/plugin mechanisms), with the indirection.
_INDIRECT_DEPS = {
    "pyarrow": "pandas read_parquet/to_parquet engine (cache/, data/study.py)",
}


def _load():
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def _dist_name(spec: str) -> str:
    return re.split(r"[<>=!\[ ]", spec, maxsplit=1)[0]


def _import_name(dist: str) -> str:
    key = dist.lower()
    return _IMPORT_NAME.get(key, _IMPORT_NAME.get(dist, dist.replace("-", "_")))


def _import_root(dist: str) -> str:
    return _import_name(dist).split(".")[0]


def _package_import_roots() -> set[str]:
    """Every top-level module the package imports, incl. lazy in-function
    imports (those still fail at runtime on a clean install)."""
    roots: set[str] = set()
    for path in PKG.rglob("*.py"):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                roots.update(a.name.split(".")[0] for a in node.names)
            elif isinstance(node, ast.ImportFrom) and node.module and not node.level:
                roots.add(node.module.split(".")[0])
    return roots


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
        importlib.import_module(_import_name(_dist_name(spec)))


def test_package_imports_are_declared():
    """Every third-party import in the package maps to a declared dependency
    or a declared extra — a clean `pip install` must not hit
    ModuleNotFoundError on any code path (advisor r4, medium)."""
    project = _load()["project"]
    declared = {_import_root(_dist_name(s)) for s in project["dependencies"]}
    for specs in project.get("optional-dependencies", {}).values():
        declared.update(_import_root(_dist_name(s)) for s in specs)
    stdlib = set(sys.stdlib_module_names)
    third_party = {
        r
        for r in _package_import_roots()
        if r not in stdlib and r != "algonauts2025_tpu"
    }
    undeclared = sorted(third_party - declared)
    assert not undeclared, (
        f"package imports with no declared dependency/extra: {undeclared}"
    )


def test_declared_dependencies_are_imported():
    """The inverse direction: a runtime dep nobody imports is cruft (except
    documented engine/plugin indirections)."""
    deps = {_dist_name(s) for s in _load()["project"]["dependencies"]}
    roots = _package_import_roots()
    unused = sorted(
        d for d in deps if d not in _INDIRECT_DEPS and _import_root(d) not in roots
    )
    assert not unused, f"declared runtime deps never imported: {unused}"


def test_native_source_ships_as_package_data():
    pkg_data = _load()["tool"]["setuptools"]["package-data"]
    patterns = pkg_data["algonauts2025_tpu.native"]
    native_dir = PKG / "native"
    assert any(
        any(native_dir.glob(p)) for p in patterns
    ), "package-data patterns match no files"
    assert (native_dir / "dataplane.cpp").exists()


def test_run_config_cli_usage_error():
    from algonauts2025_tpu.grids.run_config import cli

    import pytest

    with pytest.raises(SystemExit, match="usage"):
        cli([])
    with pytest.raises(SystemExit, match="usage"):
        cli(["a.json", "b.json"])
