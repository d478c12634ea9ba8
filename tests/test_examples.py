"""Smoke-run every example with its small config (the acceptance suite of
SURVEY §7 step 9: each example is a ported book/paper experiment with an
asserted statistical outcome — the assertions live in the examples
themselves, so a green run here certifies the experiment's conclusion,
not just that the code imports)."""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).parent.parent / "examples"
EXAMPLES = sorted(p.stem for p in EXAMPLES_DIR.glob("*.py"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", EXAMPLES_DIR / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_example_is_covered():
    """No example may be added without being smoke-tested."""
    assert EXAMPLES, EXAMPLES_DIR
    for name in EXAMPLES:
        mod = _load(name)
        assert hasattr(mod, "main"), f"examples/{name}.py has no main()"
        import inspect

        assert "small" in inspect.signature(mod.main).parameters, (
            f"examples/{name}.py main() lacks the small=... smoke knob")


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_smoke(name):
    mod = _load(name)
    mod.main(small=True)
