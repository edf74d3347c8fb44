"""Round-4 extras: evaluation-path throughput and a long-run soak.

1. **Eval throughput** — `quantization_error`'s compiled program
   (euclidean BMU + residual-norm fold, the model-selection hot loop;
   reference equivalent xpysom.py:673-707 runs it per candidate) timed
   at the flagship shape on device-resident chunks. Uses the autotune
   inner-scan discipline (CLAUDE.md: only batched many-execs-per-
   dispatch timings rank reliably on this relay): the QE program runs
   ``inner`` times per dispatch, carry-perturbed so XLA cannot hoist
   it, and the per-exec time is the slope between two inner depths.

2. **Soak** — one whole-run dispatch of 2048 training epochs at the
   flagship shape (the `lax.fori_loop` train program + f32 increment
   guard at full depth): weights must stay finite and QE must improve.

Appends JSON lines to ``tools/r4_results.jsonl``. Env overrides for
CPU smoke: XSOM_ES_N, XSOM_ES_XY, XSOM_ES_D, XSOM_ES_SOAK_EPOCHS,
XSOM_ES_HI.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu import XPySom  # noqa: E402
from xpysom_dask_tpu import core  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r4_results.jsonl")


def emit(rec):
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    side = int(os.environ.get("XSOM_ES_XY", 128))
    d = int(os.environ.get("XSOM_ES_D", 64))
    n = int(os.environ.get("XSOM_ES_N", 1 << 19))
    hi = int(os.environ.get("XSOM_ES_HI", 8))
    lo = 2
    soak_epochs = int(os.environ.get("XSOM_ES_SOAK_EPOCHS", 2048))

    print(f"backend={jax.default_backend()} {side}x{side}x{d} N={n}", file=sys.stderr)
    som = XPySom(side, side, d, sigma=side / 2, random_seed=3)
    spec = som._spec
    rng = np.random.RandomState(0)
    data = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = som._chunked(data)
    w = som._device_weights()
    qe = core.make_quantization_stats_fn(spec)

    @partial(jax.jit, static_argnames=("inner",))
    def qe_scanned(w, chunks, mask, inner):
        # carry threads a ±1e-30 perturbation so each iteration depends
        # on the last (ops/pallas/autotune._scanned_kernel discipline)
        def body(c, _):
            tot, cnt = qe(w * (1.0 + c), chunks, mask)
            return jnp.float32(1e-30) * jnp.tanh(tot), (tot, cnt)

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c

    t_min = {}
    for depth in (lo, hi):
        t0 = time.perf_counter()
        float(qe_scanned(w, chunks, mask, depth))  # compile + warmup
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(qe_scanned(w, chunks, mask, depth))
            best = min(best, time.perf_counter() - t0)
        t_min[depth] = best
        print(f"inner={depth}: first {first:.1f}s best {best:.3f}s", file=sys.stderr)
    if t_min[hi] > t_min[lo]:
        per_exec = (t_min[hi] - t_min[lo]) / (hi - lo)
        method = "slope"
    else:
        per_exec = t_min[hi] / hi
        method = "direct"
    emit(
        {
            "tool": "r4_eval_soak",
            "probe": "qe_eval_throughput",
            "backend": jax.default_backend(),
            "shape": [side, side, d],
            "n": n,
            "ms_per_eval": round(per_exec * 1e3, 3),
            "samples_per_sec_per_chip": round(n / per_exec, 1),
            "method": method,
        }
    )

    # ---- TE: the heaviest eval op (top-2 BMU over the full distance
    # matrix, reference xpysom.py:709-746), chunked at _matrix_chunk ----
    te = core.make_topographic_stats_fn(spec)
    # mirror som._te_counts' chunk policy: training-sized chunks when the
    # fused top-2 kernel runs (matrix never materializes), _matrix_chunk
    # for the lax.top_k fallback
    te_chunk = None if core.te_uses_fused(spec) else som._matrix_chunk
    te_chunks, te_mask, _ = som._chunked(data, chunk=te_chunk)

    @partial(jax.jit, static_argnames=("inner",))
    def te_scanned(w, chunks, mask, inner):
        def body(c, _):
            errs, cnt = te(w * (1.0 + c), chunks, mask)
            return jnp.float32(1e-30) * jnp.tanh(errs), (errs, cnt)

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c

    t_min = {}
    for depth in (lo, hi):
        t0 = time.perf_counter()
        float(te_scanned(w, te_chunks, te_mask, depth))
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(te_scanned(w, te_chunks, te_mask, depth))
            best = min(best, time.perf_counter() - t0)
        t_min[depth] = best
        print(f"TE inner={depth}: first {first:.1f}s best {best:.3f}s", file=sys.stderr)
    if t_min[hi] > t_min[lo]:
        per_exec = (t_min[hi] - t_min[lo]) / (hi - lo)
        method = "slope"
    else:
        per_exec = t_min[hi] / hi
        method = "direct"
    emit(
        {
            "tool": "r4_eval_soak",
            "probe": "te_eval_throughput",
            "backend": jax.default_backend(),
            "shape": [side, side, d],
            "n": n,
            "te_chunk": int(te_chunk) if te_chunk else int(som._n_parallel),
            "fused_top2": bool(core.te_uses_fused(spec)),
            "ms_per_eval": round(per_exec * 1e3, 3),
            "samples_per_sec_per_chip": round(n / per_exec, 1),
            "method": method,
        }
    )

    # ---- soak: one whole-run dispatch of soak_epochs training epochs ----
    fn = core.make_train_fn(spec, soak_epochs)
    tot0, cnt0 = qe(w, chunks, mask)
    qe_before = float(tot0) / float(cnt0)
    t0 = time.perf_counter()
    w2 = fn(w, chunks, mask, jnp.int32(0), jnp.int32(soak_epochs))
    float(jnp.sum(w2))  # host fetch = sync
    wall = time.perf_counter() - t0
    tot1, cnt1 = qe(w2, chunks, mask)
    qe_after = float(tot1) / float(cnt1)
    finite = bool(np.isfinite(np.asarray(jax.device_get(w2))).all())
    emit(
        {
            "tool": "r4_eval_soak",
            "probe": "soak_single_dispatch",
            "backend": jax.default_backend(),
            "shape": [side, side, d],
            "n": n,
            "epochs": soak_epochs,
            "wall_s": round(wall, 2),
            "ms_per_epoch_incl_dispatch": round(wall * 1e3 / soak_epochs, 3),
            "qe_before": round(qe_before, 5),
            "qe_after": round(qe_after, 5),
            "weights_finite": finite,
        }
    )
    assert finite and qe_after < qe_before


if __name__ == "__main__":
    main()
