"""Benchmark harness utilities.

Rebuild of the reference harness (``benchmarks/bench_utils.py``): warmup +
repeat timing with mean/std/min/max, plus input generators. Differences by
design (documented reference bugs not reproduced, SURVEY.md §7):

- timing synchronizes via JAX device fetch instead of CUDA events; the
  reference's ``time_np`` touched an undefined CUDA event when CuPy was
  absent (reference bench_utils.py:25);
- generators return float32 (the dtype the library computes in).

Note on synchronization: some experimental TPU transports treat
``block_until_ready`` as advisory, so ``bench`` forces a tiny host fetch of
each output leaf — the only reliable barrier everywhere.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

import jax

__all__ = ["bench", "BenchResult", "rand_samples", "rand_codebook"]


@dataclass
class BenchResult:
    name: str
    mean: float
    std: float
    min: float
    max: float
    reps: int

    def __str__(self):
        return (
            f"{self.name}: mean={self.mean*1e3:.3f}ms std={self.std*1e3:.3f}ms "
            f"min={self.min*1e3:.3f}ms max={self.max*1e3:.3f}ms (n={self.reps})"
        )


def _sync(result):
    for leaf in jax.tree.leaves(result):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(fn, *args, name="bench", reps=10, warmup=2) -> BenchResult:
    """Time ``fn(*args)`` with warmup; synchronizes on every rep."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return BenchResult(
        name=name,
        mean=float(arr.mean()),
        std=float(arr.std()),
        min=float(arr.min()),
        max=float(arr.max()),
        reps=reps,
    )


def rand_samples(n, d, seed=0):
    return np.random.RandomState(seed).rand(n, d).astype(np.float32)


def rand_codebook(x, y, d, seed=1):
    return np.random.RandomState(seed).rand(x, y, d).astype(np.float32)
