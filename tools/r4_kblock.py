"""Rank the K-blocked wide-D BMU kernel candidate on the chip (round 4).

Hypothesis (ops/pallas/bmu._kernel_gemm_argmin_kb): at wide D the 2-D
kernel's full-K operand tiles (~10 MB/step at packed D=512) defeat
Mosaic's double-buffering inside the scoped-VMEM budget, explaining the
measured efficiency drop vs the D=64 flagship (BASELINE.md round 3:
~82 vs ~117 TF/s effective). K-blocking shrinks the per-step working
set; this tool ranks ``kblock ∈ {None, 512, 1024}`` in-context with the
project's measurement discipline: inner-scan batched timing (many kernel
executions per dispatch), two depths, slope.

Run on the TPU:  python -u tools/r4_kblock.py [d] [xy] [n]
Appends JSON lines to tools/r4_results.jsonl. CPU smoke:
XSOM_KB_INNER_LO/HI + interpret fallback engage automatically off-TPU.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu.ops.pallas.bmu import bmu_euclidean, supported  # noqa: E402


def scanned(mode, kblock, interpret, inner):
    @jax.jit
    def run(x, w):
        def body(c, _):
            idx, val = bmu_euclidean(
                x * (1.0 + c), w, mode=mode, kblock=kblock,
                interpret=interpret,
            )
            return jnp.float32(1e-30) * jnp.tanh(
                jnp.sum(idx.astype(jnp.float32))
            ), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c

    return run


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    xy = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    lo = int(os.environ.get("XSOM_KB_INNER_LO", 4))
    hi = int(os.environ.get("XSOM_KB_INNER_HI", 16))
    reps = 3
    interpret = not supported()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
    ref = None

    print(
        f"backend={jax.default_backend()} shape=({n},{xy},{d}) "
        f"inner=({lo},{hi}) interpret={interpret}",
        file=sys.stderr,
    )
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r4_results.jsonl"
    )
    for mode in ("packed", "bf16"):
        for kb in (None, 512, 1024):
            try:
                runs = {
                    depth: scanned(mode, kb, interpret, depth)
                    for depth in (lo, hi)
                }
                t_min = {}
                for depth in (lo, hi):
                    float(runs[depth](x, w))  # compile + warmup
                for depth in (lo, hi):
                    best = float("inf")
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        float(runs[depth](x, w))
                        best = min(best, time.perf_counter() - t0)
                    t_min[depth] = best
                per = (t_min[hi] - t_min[lo]) / (hi - lo)
                # exactness spot-check on the real kernel output
                idx, _ = bmu_euclidean(
                    x, w, mode=mode, kblock=kb, interpret=interpret
                )
                if mode == "packed":
                    if ref is None:
                        d64 = -2 * np.asarray(x, np.float64) @ np.asarray(
                            w, np.float64
                        ).T + (np.asarray(w, np.float64) ** 2).sum(1)
                        ref = d64.argmin(1)
                    flips = int((np.asarray(idx) != ref).sum())
                else:
                    flips = None
                rec = {
                    "tool": "r4_kblock",
                    "backend": jax.default_backend(),
                    "shape": [n, xy, d],
                    "mode": mode,
                    "kblock": kb,
                    "ms_per_exec": round(per * 1e3, 3),
                    "t_lo": round(t_min[lo], 3),
                    "t_hi": round(t_min[hi], 3),
                    "packed_flips_vs_f64": flips,
                }
            except Exception as e:  # Mosaic reject: record and move on
                rec = {
                    "tool": "r4_kblock",
                    "backend": jax.default_backend(),
                    "shape": [n, xy, d],
                    "mode": mode,
                    "kblock": kb,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            print(json.dumps(rec))
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
