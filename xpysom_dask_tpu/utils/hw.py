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
    "training_chunk",
    "inference_chunk",
]

# Inference chunk-size ladder: geometric rungs (×8) bound the set of
# compiled shapes across arbitrary call sizes — see inference_chunk.
INFER_RUNGS = (8, 64, 512)

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


def inference_chunk(n: int, cap: int) -> tuple[int, int]:
    """THE inference-branch (bucketed) chunk sizing: snap the padded shape
    onto a small ladder so repeated calls with varying batch sizes reuse
    executables instead of retracing per distinct length. Returns
    ``(chunk, min_chunks)`` for ``chunk_data``: the chunk rounds up to the
    next ``INFER_RUNGS`` rung under the budget cap (then the cap), and the
    chunk COUNT rounds up to a power of two with fully-masked padding
    chunks — distinct compiled shapes across ANY call sequence ≤
    len(rungs)+1 ladder × log₂(max C). The cap itself rounds DOWN to its
    alignment (1024 sample tiles above one tile, 8 lanes above one group)
    and a cap below 8 stands as-is: a user-specified ``n_parallel`` (a
    memory budget, reference xpysom.py:131-137) is never exceeded
    (round-5 review: ``max(8, ...)`` silently doubled an explicit
    ``n_parallel=4``). Shared by ``XPySom._chunked(bucket=True)`` and the
    streaming ``SomPopulation`` metrics so the compile-class bound can
    never drift between them."""
    if cap > 1024:
        cap = max(1024, (cap // 1024) * 1024)
    elif cap >= 8:
        cap = (cap // 8) * 8
    # cap < 8: the user's explicit budget stands, unaligned but honored
    chunk = next((r for r in INFER_RUNGS if n <= r <= cap), cap)
    c = max(1, -(-n // chunk))
    return chunk, 1 << (c - 1).bit_length()


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
