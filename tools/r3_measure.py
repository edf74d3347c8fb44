"""Round-3 on-chip measurement harness: slope-decontaminated timings.

Round-2/3 lesson (BASELINE.md addendum, CLAUDE.md): over the axon relay
even inner-batched per-exec medians carry an ADDITIVE per-dispatch
contamination R/inner (R = tunnel round-trip + queue, time-varying,
~20-100 ms) — the round-3 opening window measured packed at
2.80 ms/exec where round 2's clean window said 1.49, yet the packed−bf16
DELTA matched round 2 exactly (0.44 ms). So: time each config at TWO
inner-batch depths and take the slope,

    per_exec = (t_hi − t_lo) / (inner_hi − inner_lo)

which cancels any per-dispatch constant. The intercept (t_lo −
inner_lo·per_exec) is reported as the dispatch overhead estimate — a
sanity readout for the window, not a kernel property.

Every timed dispatch is synchronized by a host scalar fetch
(block_until_ready is advisory over the relay, CLAUDE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER_LO = 8
INNER_HI = 40


def scanned(call, inner, consume="val"):
    """Jit a scan that executes ``call(x) -> (idx, val)`` ``inner`` times,
    each iteration depending on the last through a ±1e-30 perturbation of
    x (prevents hoisting). ``consume`` picks which output feeds the carry:
    'val' keeps the full value path alive; 'idx' consumes ONLY the winner
    indices — the training-path contract (core._bmu_chunk discards val),
    letting XLA dead-code-eliminate value-only glue such as the margin
    mode's exact-value recompute."""

    @jax.jit
    def run(x, *rest):
        def body(c, _):
            idx, val = call(x * (1.0 + c), *rest)
            z = (
                jnp.sum(val)
                if consume == "val"
                else jnp.sum(idx.astype(jnp.float32))
            )
            return jnp.float32(1e-30) * jnp.tanh(z), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c

    return run


def measure(call, args, consume="val", reps=5, lo=INNER_LO, hi=INNER_HI):
    """Slope-decontaminated per-execution time of ``call(*args)``.

    Returns dict with per_exec_ms (slope), overhead_ms (intercept),
    first_call_s per depth, and the raw dispatch medians."""
    out = {"consume": consume, "lo": lo, "hi": hi}
    med = {}
    for inner in (lo, hi):
        fn = scanned(call, inner, consume)
        t0 = time.perf_counter()
        float(fn(*args))
        out[f"first_call_s_{inner}"] = round(time.perf_counter() - t0, 2)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        med[inner] = float(np.median(ts))
        out[f"dispatch_ms_{inner}"] = round(med[inner] * 1e3, 3)
    per_exec = (med[hi] - med[lo]) / (hi - lo)
    out["per_exec_ms"] = round(per_exec * 1e3, 4)
    out["overhead_ms"] = round((med[lo] - lo * per_exec) * 1e3, 3)
    return out


def emit(path, record):
    """Append one JSON line; print it too (incremental, kill-safe)."""
    line = json.dumps(record)
    print(line, flush=True)
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")
