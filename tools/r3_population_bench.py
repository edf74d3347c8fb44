"""Population-sweep speedup: SomPopulation vs P serial XPySom trains.

Measures the wall-clock ratio of training P sweep-sized SOMs serially
(the reference workflow — each member is its own program, running the
shipped single-model fast path with the fused BMU kernel) vs as one
SomPopulation program (one concatenated-codebook GEMM per chunk).

Method: two-depth slope per program (bench.py discipline — the tunnel's
per-dispatch constant cancels), alternated within one window. The serial
cost is the SUM of each member's per-epoch slope; dispatch-inclusive
numbers are printed alongside (on this relay the serial path also pays P
dispatch constants per epoch-batch, which the slope deliberately
excludes — so the slope ratio is the honest on-hardware compute ratio
and UNDERSTATES the user-visible win on dispatch-heavy rigs).

Run on the TPU: ``python -u tools/r3_population_bench.py [P]``.
Appends one JSON line per configuration to ``tools/r3_results.jsonl``.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu import SomPopulation, XPySom  # noqa: E402
from xpysom_dask_tpu.core import chunk_data, make_train_fn  # noqa: E402
from xpysom_dask_tpu.models.population import (  # noqa: E402
    make_population_train_fn,
)


def sync(arr):
    return float(jnp.sum(arr))


def slope_time(fn, w, chunks, mask, lo, hi, reps=3):
    """min-of-reps two-depth slope of ``fn(w, chunks, mask, beg, end)``
    seconds/epoch; returns (per_epoch_s, t_lo, t_hi, w)."""
    t_min = {lo: float("inf"), hi: float("inf")}
    beg = 1
    for _ in range(reps):
        for depth in (lo, hi):
            t0 = time.perf_counter()
            w = fn(w, chunks, mask, jnp.int32(beg), jnp.int32(beg + depth))
            sync(w)
            t_min[depth] = min(t_min[depth], time.perf_counter() - t0)
            beg += depth
    per_epoch = (t_min[hi] - t_min[lo]) / (hi - lo)
    return per_epoch, t_min[lo], t_min[hi], w


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    x = y = int(os.environ.get("XSOM_POP_XY", 24))
    d = int(os.environ.get("XSOM_POP_D", 32))
    n = int(os.environ.get("XSOM_POP_N", 1 << 17))
    lo = int(os.environ.get("XSOM_POP_LO", 5))
    hi = int(os.environ.get("XSOM_POP_HI", 35))
    num_epochs = 1 + 3 * (lo + hi) + 1

    rng = np.random.RandomState(0)
    data = rng.rand(n, d).astype(np.float32)

    print(
        f"backend={jax.default_backend()} P={p} grid {x}x{y} D={d} N={n}",
        file=sys.stderr,
    )

    # --- population program -------------------------------------------------
    pop = SomPopulation(p, x, y, d, sigma=2.0, random_seed=1)
    chunks_p, mask_p, _ = pop._chunked(data)
    w_p = pop._stacked_device_weights()
    fn_p = make_population_train_fn(pop._specs(), num_epochs, None)
    w_p = fn_p(w_p, chunks_p, mask_p, jnp.int32(0), jnp.int32(1))  # warmup
    sync(w_p)
    s_pop, tlo_p, thi_p, w_p = slope_time(fn_p, w_p, chunks_p, mask_p, lo, hi)
    print(
        f"population: t(lo={lo})={tlo_p:.3f}s t(hi={hi})={thi_p:.3f}s -> "
        f"{s_pop*1e3:.2f} ms/epoch (all {p} members)",
        file=sys.stderr,
    )

    # --- serial baseline: each member is its own shipped-default program ----
    som = XPySom(x, y, d, sigma=2.0, random_seed=1)
    chunks_s, mask_s, _ = som._chunked(data)
    spec = som._spec
    fn_s = make_train_fn(spec, num_epochs)
    w_s = som._device_weights()
    w_s = fn_s(w_s, chunks_s, mask_s, jnp.int32(0), jnp.int32(1))  # warmup
    sync(w_s)
    s_ser, tlo_s, thi_s, w_s = slope_time(fn_s, w_s, chunks_s, mask_s, lo, hi)
    print(
        f"serial one member: t(lo={lo})={tlo_s:.3f}s t(hi={hi})={thi_s:.3f}s "
        f"-> {s_ser*1e3:.2f} ms/epoch; x{p} members = {s_ser*p*1e3:.2f} "
        f"ms/epoch",
        file=sys.stderr,
    )

    speedup = (s_ser * p) / s_pop
    rec = {
        "tool": "r3_population_bench",
        "backend": jax.default_backend(),
        "p": p,
        "shape": [x, y, d],
        "n": n,
        "pop_ms_per_epoch": round(s_pop * 1e3, 3),
        "serial_member_ms_per_epoch": round(s_ser * 1e3, 3),
        "speedup_vs_serial": round(speedup, 2),
        "t_lo_pop": round(tlo_p, 3),
        "t_hi_pop": round(thi_p, 3),
        "t_lo_serial": round(tlo_s, 3),
        "t_hi_serial": round(thi_s, 3),
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
