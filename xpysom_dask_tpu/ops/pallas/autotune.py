"""On-device tile autotuning for the fused BMU kernel.

``_tiles_for`` in ``bmu.py`` ships measured defaults for the shapes in
BASELINE.md, but the best (TN, TJ) distance-tile shape drifts with the
feature width, the codebook size and the TPU generation. This utility
measures the candidates ON THE ATTACHED DEVICE at the caller's problem
shape and returns the fastest, so deployments off the measured envelope
can pin their own tiles instead of trusting a table tuned on a v5e:

    from xpysom_dask_tpu.ops.pallas.autotune import autotune_bmu_tiles
    res = autotune_bmu_tiles(n=16384, xy=65536, d=256, apply=True)
    # apply=True exports XPYSOM_BMU_TILES="TNxTJ" for subsequent traces

Timing is synchronized by fetching a scalar to the host (tunnel-safe; see
CLAUDE.md — ``block_until_ready`` is advisory over a relay) and takes the
median of ``reps`` runs after a compile/warmup call. Candidates that fail
to compile (e.g. VMEM overflow at wide D) are skipped and recorded with
``float('inf')``.

NB ``apply=True`` exports the env pin, which is read at SPEC
CONSTRUCTION (``SomSpec.__post_init__`` — the one documented config
boundary, docs/API.md): it affects SOMs/specs constructed after the
call; already-built models keep their tiles (``XPySom.autotune_kernel``
additionally pins the winner on its own instance). And pick ``n``
large enough that kernel time dominates per-call dispatch (~30 ms on a
tunneled dev rig, ~10 us on a real TPU host) — candidates within noise of
each other are interchangeable anyway; the tuner's job is to dodge the
pathological ones (3x+ spreads, see BASELINE.md).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bmu import bmu_euclidean, bmu_manhattan, supported

__all__ = ["TuneResult", "autotune_bmu_tiles", "DEFAULT_CANDIDATES"]

# (TN, TJ) sample/lane tile candidates. At D=64 the measured spread
# across these is ~±7% (BASELINE.md; the once-reported 3x (1024, 1024)
# penalty was relay measurement contamination, since retracted) — the
# sweep matters at other D/XY regimes and on other TPU generations.
DEFAULT_CANDIDATES = (
    (512, 1024),
    (512, 2048),
    (1024, 1024),
    (1024, 2048),
    (2048, 1024),
    (1024, 4096),
    (2048, 2048),
)


class TuneResult(NamedTuple):
    tiles: tuple  # best (TN, TJ)
    timings_ms: dict  # {(TN, TJ): median ms, inf = failed to compile/run}
    first_call_s: dict  # {(TN, TJ): first-call (compile+load+warmup) s}


def _kernel_call(kernel, x, w, mode, tiles, interpret):
    if kernel == "manhattan":
        # `mode` doubles as the L1 accumulation strategy
        # (serial|split2|split4|bf16, see bmu_manhattan)
        return bmu_manhattan(
            x, w, tiles=tiles, interpret=interpret, accum=mode or "serial"
        )
    if kernel.startswith("norm_p_odd"):
        # 'norm_p_odd_<p>' (round 5): the odd-p elementwise kernel; p is
        # static in the kernel so it rides in the name. Parse everything
        # after the fixed prefix — NOT rsplit('_'), which would split
        # inside a scientific-notation float repr (e.g. '1e-05').
        from .bmu import bmu_norm_p_odd

        suffix = kernel[len("norm_p_odd"):]
        p = int(suffix[1:]) if suffix.startswith("_") else 3
        return bmu_norm_p_odd(x, w, p=p, tiles=tiles, interpret=interpret)
    if kernel.startswith("norm_p_frac"):
        # 'norm_p_frac_<p>' (round 5 close-out): fractional-p elementwise
        # kernel, p (any float repr, incl. '1e-05') rides in the name
        from .bmu import bmu_norm_p_frac

        suffix = kernel[len("norm_p_frac"):]
        p = float(suffix[1:]) if suffix.startswith("_") else 1.5
        return bmu_norm_p_frac(x, w, p=p, tiles=tiles, interpret=interpret)
    return bmu_euclidean(x, w, mode=mode, tiles=tiles, interpret=interpret)


@partial(
    jax.jit,
    static_argnames=("kernel", "mode", "tiles", "interpret", "inner", "consume"),
)
def _scanned_kernel(kernel, x, w, mode, tiles, interpret, inner, consume="val"):
    """Run the kernel ``inner`` times inside one dispatch. The carry is
    threaded through the input as a numerically-negligible perturbation
    (±1e-30 · x) purely so each iteration DEPENDS on the last — a
    loop-invariant body would let XLA hoist the kernel out of the scan
    and time a single execution.

    ``consume`` picks which kernel output feeds the carry: ``'val'``
    (autotune default) or ``'idx'`` — the training path consumes only
    indices, so ``bench.py``'s BMU-throughput metric times the
    idx-consuming program (the shared harness exists so the
    anti-hoisting trick cannot drift between the two callers)."""

    def body(c, _):
        idx, val = _kernel_call(
            kernel, x * (1.0 + c), w, mode, tiles, interpret
        )
        z = jnp.sum(idx.astype(jnp.float32)) if consume == "idx" else jnp.sum(val)
        return jnp.float32(1e-30) * jnp.tanh(z), (idx[0], val[0])

    c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
    return c


def _time_once(x, w, mode, tiles, reps, interpret, inner, kernel):
    # First call timed separately from steady state. NB on a relayed dev
    # rig the first call is dominated by tunnel/program-load latency and
    # can be minutes under load (BASELINE.md round-2 addendum: actual
    # XLA/Mosaic compile measured ~1 s even when the first call took
    # 57-703 s) — an anomalous first_call_s flags relay load, while
    # timings_ms (steady state) is what selects the tile.
    if inner > 1:
        def run():
            float(
                _scanned_kernel(
                    kernel, x, w, mode, tuple(tiles), interpret, inner
                )
            )
    else:
        def run():
            idx, val = _kernel_call(kernel, x, w, mode, tuple(tiles), interpret)
            float(jnp.sum(val))  # host fetch = device sync

    t0 = time.perf_counter()
    run()
    first_call_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1e3 / inner)
    return float(np.median(times)), float(first_call_s)


def autotune_bmu_tiles(
    n=16384,
    xy=16384,
    d=64,
    mode=None,
    candidates=None,
    reps=3,
    seed=0,
    apply=False,
    verbose=False,
    interpret=None,
    inner=1,
    kernel="euclidean",
):
    """Measure ``candidates`` at shape (n, xy, d) on the current backend
    and return a :class:`TuneResult` with the fastest tiles.

    ``apply=True`` additionally sets ``XPYSOM_BMU_TILES`` so specs/SOMs
    constructed afterwards pick the winner up (construction-time read).
    ``interpret`` defaults to auto: the Mosaic kernel on TPU, the Pallas
    interpreter elsewhere (mechanics only — off-TPU timings are not
    meaningful tile comparisons).
    ``inner > 1`` executes the kernel that many times per dispatch
    (timings_ms is per-execution): use it when per-call dispatch overhead
    rivals the kernel (relayed dev rigs: ~30 ms/call; or small shapes),
    otherwise the sweep ranks dispatch noise, not tiles.
    ``kernel`` selects which fused kernel to time: 'euclidean' (also
    serves cosine and — at the EXPANDED feature width, with
    mode='highest' — even-p norm_p), 'manhattan', 'norm_p_odd_<p>'
    (e.g. 'norm_p_odd_3') or 'norm_p_frac_<p>' (e.g. 'norm_p_frac_1.5')
    — the elementwise VPU kernels are a different tile-cost class than
    the MXU GEMM kernel, so tune them under their own name (these are
    the names ``XPySom.autotune_kernel`` generates)."""
    candidates = tuple(candidates) if candidates else DEFAULT_CANDIDATES
    if interpret is None:
        interpret = not supported()
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))

    timings = {}
    first_calls = {}
    for cand in candidates:
        tn, tj = int(cand[0]), int(cand[1])
        if tn % 8 or tj % 128:
            raise ValueError(
                f"candidate {cand}: TN must be a multiple of 8, TJ of 128"
            )
        try:
            ms, first_s = _time_once(
                x, w, mode, (tn, tj), reps, interpret, int(inner), kernel
            )
        except Exception as e:  # VMEM overflow / Mosaic reject: skip
            if verbose:
                print(f"  tiles {cand}: failed ({type(e).__name__})")
            timings[(tn, tj)] = float("inf")
            first_calls[(tn, tj)] = float("inf")
            continue
        timings[(tn, tj)] = ms
        first_calls[(tn, tj)] = first_s
        if verbose:
            print(f"  tiles {cand}: {ms:.2f} ms (first call {first_s:.1f} s)")
    best = min(timings, key=timings.get)
    if not np.isfinite(timings[best]):
        raise RuntimeError(
            f"no tile candidate compiled at shape ({n}, {xy}, {d})"
        )
    if apply:
        os.environ["XPYSOM_BMU_TILES"] = f"{best[0]}x{best[1]}"
    return TuneResult(best, timings, first_calls)
