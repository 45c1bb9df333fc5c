"""Import health: every module in the package imports cleanly (catches
syntax errors and circular imports across the whole surface)."""

import importlib
import pkgutil

import botorch_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        botorch_tpu.__path__, prefix="botorch_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_public_api():
    assert hasattr(botorch_tpu, "make_gp")
    assert hasattr(botorch_tpu, "fit_gp")
    assert hasattr(botorch_tpu, "optimize_acqf")
    # lazy submodule access
    assert botorch_tpu.loop.run_bo_loop is not None
    assert botorch_tpu.portfolio.run_mmma is not None
