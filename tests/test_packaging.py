"""Packaging parity (reference setup.py:6-13): `pip install -e .` must expose
`signaltrain_tpu` — pinned here via pyproject parse + package discovery, so a
module added without an __init__.py (silently dropped from an install) or a
broken toml fails CI rather than a user's install."""

import os

import pytest
import setuptools

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_parses():
    # tomllib is 3.11+; the package supports 3.10 (pyproject requires-python),
    # so on 3.10 only the toml-parse assertions are skipped — package
    # discovery below still runs everywhere
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    assert cfg["project"]["name"] == "signaltrain-tpu"
    assert {"jax", "flax", "optax", "numpy", "scipy", "matplotlib"} <= set(
        d.split(";")[0].strip() for d in cfg["project"]["dependencies"]
    )
    # license metadata must be present and GPL-compatible with the reference's
    # LICENSE (checkpoint/CLI interop claims) — and the LICENSE file shipped
    lic = cfg["project"]["license"]
    assert "GPL-3.0" in (lic["text"] if isinstance(lic, dict) else lic)
    with open(os.path.join(ROOT, "LICENSE")) as f:
        assert "GNU GENERAL PUBLIC LICENSE" in f.read(200)


def test_discovers_all_subpackages():
    found = set(
        setuptools.find_packages(where=ROOT, include=["signaltrain_tpu*"])
    )
    # every directory under signaltrain_tpu/ that holds .py files must be a
    # discoverable package (i.e. have an __init__.py)
    for dirpath, _dirs, files in os.walk(os.path.join(ROOT, "signaltrain_tpu")):
        if "__pycache__" in dirpath or not any(f.endswith(".py") for f in files):
            continue
        pkg = os.path.relpath(dirpath, ROOT).replace(os.sep, ".")
        assert pkg in found, f"{pkg} has .py files but is not a discoverable package"
