"""Hardware introspection and mini-batch auto-sizing.

TPU-native counterpart of ``xpysom_dask/utils.py`` (``find_max_cuda_threads``
/ ``find_cpu_cores``) and the ``n_parallel`` auto-sizing logic
(xpysom.py:242-251). On TPU the right sizing target is not thread residency
but keeping the MXU fed while bounding the transient ``(chunk, XY)``
distance matrix: we budget a fixed element count for that matrix and derive
the chunk from the grid size.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "find_cpu_cores",
    "default_n_parallel",
    "backend_kind",
    "round_up",
]

# Distance-matrix element budget per chunk. 2^24 fp32 elements = 64 MB HBM
# transient on accelerators; scaled down on CPU hosts.
_ACCEL_BUDGET = 1 << 24
_CPU_BUDGET = 1 << 20


def find_cpu_cores() -> int:
    """Number of host CPU cores (reference utils.py:15-20)."""
    return os.cpu_count() or 1


def backend_kind() -> str:
    """'tpu', 'gpu' or 'cpu' for the default JAX backend."""
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def training_chunk(n: int, n_parallel: int) -> int:
    """THE training-branch chunk size: budget cap, shrunk to the data,
    floored to the fused kernel's 1024 sample tile when above one tile
    (unaligned chunks force an in-graph pad per scan step — measured to
    blow Mosaic/XLA compile time from ~1.5 s to >100 s on some shapes).
    Rounds DOWN so ``n_parallel`` (a memory budget, reference
    xpysom.py:131-137) is never exceeded. Shared by ``XPySom._chunked``
    and ``SomPopulation._train_serial`` so the serial sweep's
    'bit-identical to training each member individually' guarantee can
    never drift (advisor, round 4)."""
    chunk = min(n_parallel, round_up(max(n, 1), 8))
    if chunk > 1024:
        chunk = max(1024, (chunk // 1024) * 1024)
    return chunk


def default_n_parallel(
    xy: int, backend: str | None = None, fused: bool = False
) -> int:
    """Auto-size the mini-batch (samples per chunk) like the reference's
    ``n_parallel`` default (xpysom.py:242-251), but budgeted against the
    transient ``(chunk, XY)`` distance matrix instead of CUDA thread
    residency. Clamped to [256, 65536] and rounded to a multiple of 256 so
    chunks tile the VPU/MXU cleanly.

    ``fused=True`` (euclidean activation on TPU): the Pallas BMU kernel
    never materializes the distance matrix in HBM, so the budget does not
    apply — chunk 16384 measured fastest end-to-end (36.5 ms/epoch vs
    42.4 at 8192 and 38.8 at 32768 on the 2^19×16384×64 flagship;
    fewer scan steps amortize per-chunk scatter/dispatch)."""
    backend = backend or backend_kind()
    if fused and backend == "tpu":
        return 16384
    budget = _ACCEL_BUDGET if backend in ("tpu", "gpu") else _CPU_BUDGET
    chunk = budget // max(xy, 1)
    # round DOWN to the 256 multiple (floor 256): rounding up after the
    # division could exceed the documented element budget by ~2x at
    # awkward XY (review r4: xy=4000 -> 262 -> round-up 512 ≈ 1.95x over)
    chunk = max(256, min(65536, (chunk // 256) * 256))
    return chunk
