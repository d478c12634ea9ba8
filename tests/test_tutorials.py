"""Smoke-run every tutorial with its small config (docs/tutorials mirror
the reference's 7 notebooks; like examples, each asserts its statistical
outcome so a green run certifies the tutorial's claims)."""

import importlib.util
import sys
from pathlib import Path

import pytest

TUTORIALS_DIR = Path(__file__).parent.parent / "docs" / "tutorials"
TUTORIALS = sorted(p.stem for p in TUTORIALS_DIR.glob("*.py"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"tutorials_{name}", TUTORIALS_DIR / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_tutorial_is_covered():
    assert TUTORIALS, TUTORIALS_DIR
    import inspect

    for name in TUTORIALS:
        mod = _load(name)
        assert hasattr(mod, "main"), f"{name}.py has no main()"
        assert "small" in inspect.signature(mod.main).parameters, name


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_smoke(name):
    mod = _load(name)
    mod.main(small=True)
