"""Three-way population-program ranking (VERDICT r4 #1, round 5).

Ranks the per-epoch cost of the three population execution programs at
sweep-sized maps, within ONE window, slope method (two whole-run depths;
the tunnel's per-dispatch constant cancels):

- ``batched``: concatenated-codebook GEMM + block argmin (the r4
  streaming default, measured 0.60–0.75× of serial);
- ``fused``  : round-5 lax.map-over-members with the fused single-model
  stats body (one dispatch per epoch AND per-member fused kernels);
- ``serial`` : one member's shipped single-model program, ×P (the r4
  resident winner; P host dispatches per epoch, slope-excluded).

The fused and batched rows are the streaming-fold decision (both are
one-pass, one-dispatch-per-superbatch programs — their stats halves are
what ``SomPopulation._train_streaming`` folds); serial is the resident
reference point.

Run on the TPU: ``python -u tools/r5_population_fused.py [P ...]``.
Appends JSON lines to ``tools/r5_results.jsonl``.
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
from xpysom_dask_tpu.core import make_train_fn  # noqa: E402
from xpysom_dask_tpu.models.population import (  # noqa: E402
    make_population_train_fn,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")


def sync(arr):
    return float(jnp.sum(arr))


def slope_time(fn, w, chunks, mask, lo, hi, reps=3):
    t_min = {lo: float("inf"), hi: float("inf")}
    beg = 1
    for _ in range(reps):
        for depth in (lo, hi):
            t0 = time.perf_counter()
            w = fn(w, chunks, mask, jnp.int32(beg), jnp.int32(beg + depth))
            sync(w)
            t_min[depth] = min(t_min[depth], time.perf_counter() - t0)
            beg += depth
    return (t_min[hi] - t_min[lo]) / (hi - lo), t_min[lo], t_min[hi], w


def run_p(p, x, y, d, n, lo, hi):
    num_epochs = 1 + 3 * (lo + hi) + 1
    rng = np.random.RandomState(0)
    data = rng.rand(n, d).astype(np.float32)
    print(
        f"backend={jax.default_backend()} P={p} grid {x}x{y} D={d} N={n}",
        file=sys.stderr,
    )

    pop = SomPopulation(p, x, y, d, sigma=2.0, random_seed=1)
    specs = pop._specs()
    rows = {}
    for impl in ("batched", "fused"):
        # chunk with the SAME budget the shipped strategy uses (round-5
        # review: the fused lax.map program runs member-sized 16384-row
        # chunks in production; timing it over concat-budget chunks
        # understates fused by the extra per-scan-step overhead)
        kind = "fused" if impl == "fused" else "concat"
        chunks_p, mask_p, _ = pop._chunked(data, kind)
        w_p = pop._stacked_device_weights()
        fn = make_population_train_fn(specs, num_epochs, None, kind)
        w_p = fn(w_p, chunks_p, mask_p, jnp.int32(0), jnp.int32(1))
        sync(w_p)
        s, tlo, thi, w_p = slope_time(fn, w_p, chunks_p, mask_p, lo, hi)
        rows[impl] = s
        print(
            f"{impl}: t({lo})={tlo:.3f}s t({hi})={thi:.3f}s -> "
            f"{s*1e3:.2f} ms/epoch (all {p} members)",
            file=sys.stderr,
        )

    som = XPySom(x, y, d, sigma=2.0, random_seed=1)
    chunks_s, mask_s, _ = som._chunked(data)
    fn_s = make_train_fn(som._spec, num_epochs)
    w_s = som._device_weights()
    w_s = fn_s(w_s, chunks_s, mask_s, jnp.int32(0), jnp.int32(1))
    sync(w_s)
    s_ser, tlo, thi, w_s = slope_time(fn_s, w_s, chunks_s, mask_s, lo, hi)
    rows["serial"] = s_ser * p
    print(
        f"serial one member {s_ser*1e3:.2f} ms/epoch; x{p} = "
        f"{s_ser*p*1e3:.2f} ms/epoch",
        file=sys.stderr,
    )

    rec = {
        "tool": "r5_population_fused",
        "backend": jax.default_backend(),
        "p": p,
        "shape": [x, y, d],
        "n": n,
        "batched_ms_per_epoch": round(rows["batched"] * 1e3, 3),
        "fused_ms_per_epoch": round(rows["fused"] * 1e3, 3),
        "serial_x_p_ms_per_epoch": round(rows["serial"] * 1e3, 3),
        "fused_vs_batched": round(rows["batched"] / rows["fused"], 3),
        "fused_vs_serial": round(rows["serial"] / rows["fused"], 3),
    }
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ps = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    x = y = int(os.environ.get("XSOM_POP_XY", 24))
    d = int(os.environ.get("XSOM_POP_D", 16))
    n = int(os.environ.get("XSOM_POP_N", 1 << 17))
    lo = int(os.environ.get("XSOM_POP_LO", 5))
    hi = int(os.environ.get("XSOM_POP_HI", 35))
    for p in ps:
        run_p(p, x, y, d, n, lo, hi)


if __name__ == "__main__":
    main()
