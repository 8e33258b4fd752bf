"""Real-TPU test configuration: unlike tests/conftest.py, the platform is
NOT forced to CPU — these tests exist precisely to exercise compiled Mosaic
kernels (alignment witnesses, i1 restrictions) that interpret mode cannot
catch (VERDICT.md round 1, weak #4 / next-step 5).

Run on the bench host:  python -m pytest tpu_tests/ -q   (~5 min, compiles)
Tests SKIP when no TPU is attached.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="real TPU required (compiled Mosaic)")
    for item in items:
        item.add_marker(skip)
