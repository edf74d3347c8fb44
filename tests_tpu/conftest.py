"""On-chip test configuration.

Unlike ``tests/`` (which forces an 8-virtual-device CPU platform so the
suite runs anywhere), this directory runs against the REAL TPU backend and
is skipped wholesale when none is attached. It exists to turn the
on-hardware claims in BASELINE.md — kernel argmin fidelity, train parity
vs the float64 golden model, the public-API drive — into executable
checks (SURVEY.md §4's oracle-parity strategy, applied on the chip the
framework actually targets).

Run from the repo root:  python -m pytest tests_tpu/ -q

Keep shapes modest: every distinct (shape, mode) is a remote Mosaic
compile over the tunnel (~5-25 s each on this rig).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


def _tpu_available() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_available():
        return
    skip = pytest.mark.skip(reason="no TPU backend attached")
    for item in items:
        item.add_marker(skip)
