"""Scale envelope on hardware (VERDICT r3 #4): 256x256x64 and 512x512x64.

The flagship measurements all live at 128x128 — but `_matrix_chunk`
budgets, `fits_vmem` gates, the lane-boundary scatter choice and compile
times only *bite* at the sizes the reference's memory-bound `n_parallel`
story exists for (reference xpysom.py:41-45,131-137). This tool trains
the big maps end-to-end on the chip (rect + hex, euclidean packed),
slope-times samples/s/chip, and sanity-checks the auto-sizing gates.

One configuration per invocation (keep TPU scripts short, CLAUDE.md):

    python -u tools/r4_scale_envelope.py 256 rectangular
    python -u tools/r4_scale_envelope.py 256 hexagonal
    python -u tools/r4_scale_envelope.py 512 rectangular
    python -u tools/r4_scale_envelope.py 512 hexagonal

Appends one JSON line per run to ``tools/r4_results.jsonl``. Env
overrides (CPU smoke): XSOM_SE_N, XSOM_SE_LO, XSOM_SE_HI, XSOM_SE_D.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu import XPySom  # noqa: E402
from xpysom_dask_tpu import core  # noqa: E402
from xpysom_dask_tpu.core import make_train_fn  # noqa: E402


def sync(arr):
    return float(jnp.sum(arr))


def main():
    xy_side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    topology = sys.argv[2] if len(sys.argv) > 2 else "rectangular"
    d = int(os.environ.get("XSOM_SE_D", 64))
    n = int(os.environ.get("XSOM_SE_N", 1 << 16))
    lo = int(os.environ.get("XSOM_SE_LO", 5))
    hi = int(os.environ.get("XSOM_SE_HI", 35))
    reps = 3
    num_epochs = 1 + reps * (lo + hi) + 4

    print(
        f"backend={jax.default_backend()} {xy_side}x{xy_side}x{d} "
        f"{topology} N={n}",
        file=sys.stderr,
    )

    # public-API construction: the auto-sizing under test happens here
    som = XPySom(
        xy_side, xy_side, d, sigma=xy_side / 2, random_seed=1,
        topology=topology,
    )
    spec = som._spec
    dist = spec.distance_fn()
    kind = core._pallas_bmu_kind(dist, d, spec.use_pallas)
    gates = {
        "n_parallel": som._n_parallel,
        "bmu_kind": kind,
        "split_scatter": core._use_split_scatter(d),
        "matrix_chunk": som._matrix_chunk,
    }
    try:
        from xpysom_dask_tpu.ops.pallas.stats import fits_vmem

        gates["stats_fits_vmem"] = bool(fits_vmem(spec.xy, d))
    except Exception:
        gates["stats_fits_vmem"] = None
    print(f"gates: {gates}", file=sys.stderr)

    rng = np.random.RandomState(0)
    data = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = som._chunked(data)
    w = som._device_weights()
    fn = make_train_fn(spec, num_epochs)

    t0 = time.perf_counter()
    w = fn(w, chunks, mask, jnp.int32(0), jnp.int32(1))  # compile + warmup
    sync(w)
    first_call_s = time.perf_counter() - t0
    print(f"first call (compile+load+1 epoch): {first_call_s:.1f}s", file=sys.stderr)

    t_min = {lo: float("inf"), hi: float("inf")}
    beg = 1
    for _ in range(reps):
        for depth in (lo, hi):
            t0 = time.perf_counter()
            w = fn(w, chunks, mask, jnp.int32(beg), jnp.int32(beg + depth))
            sync(w)
            t_min[depth] = min(t_min[depth], time.perf_counter() - t0)
            beg += depth
    # degenerate-window guard (bench.py discipline): relay-queue swings
    # (2s->16s round-trips, CLAUDE.md) can make t(hi) <= t(lo); fall back
    # to the dispatch-inclusive estimate and mark the method so a bad
    # window can never write a negative/inflated record
    if hi > lo and t_min[hi] > t_min[lo]:
        per_epoch = (t_min[hi] - t_min[lo]) / (hi - lo)
        method = "slope"
    else:
        per_epoch = t_min[hi] / hi
        method = "direct"
    sps = n / per_epoch

    # end-to-end sanity through the public API: short train + QE drop
    som._weights = np.asarray(jax.device_get(w))
    qe = float(som.quantization_error(data[:16384]))
    finite = bool(np.isfinite(som._weights).all())

    rec = {
        "tool": "r4_scale_envelope",
        "backend": jax.default_backend(),
        "shape": [xy_side, xy_side, d],
        "topology": topology,
        "n": n,
        "samples_per_sec_per_chip": round(sps, 1),
        "method": method,
        "ms_per_epoch": round(per_epoch * 1e3, 3),
        "t_lo": round(t_min[lo], 3),
        "t_hi": round(t_min[hi], 3),
        "first_call_s": round(first_call_s, 1),
        "qe_after": round(qe, 5),
        "weights_finite": finite,
        "gates": gates,
    }
    print(json.dumps(rec))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r4_results.jsonl"
    )
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
