"""Utilities: hardware introspection / chunk auto-sizing and progress
reporting (counterparts of the reference's ``utils.py`` and the
``print_progress`` helper, xpysom.py:47-69)."""

from .hw import backend_kind, default_n_parallel, find_cpu_cores, round_up
from .progress import ProgressReporter

__all__ = [
    "find_cpu_cores",
    "default_n_parallel",
    "backend_kind",
    "round_up",
    "ProgressReporter",
]
