"""Slope-clean hexagonal-topology training throughput at the flagship
shape — updates the round-2 "hex within ~1.1x of rectangular" claim
(measured then as 13.08M dispatch-inclusive) with the round-3 method.
Same harness as bench.py (two epoch depths, min-of-3, one window);
appends a JSON line to tools/r3_results.jsonl.
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "./tools")

import numpy as np
import jax
import jax.numpy as jnp

from xpysom_dask_tpu.core import SomSpec, chunk_data, make_train_fn
from r3_measure import emit

OUT = "tools/r3_results.jsonl"


def main():
    x = y = 128
    d = 64
    n = 1 << 19
    lo, hi, reps = 5, 35, 3
    spec = SomSpec(
        x=x, y=y, input_len=d, sigma=x / 2, sigmaN=1.0,
        learning_rate=0.5, learning_rateN=0.01, topology="hexagonal",
    )
    num_epochs = max(128, 1 + reps * (lo + hi))
    rng = np.random.RandomState(0)
    chunks, mask, _ = chunk_data(rng.rand(n, d).astype(np.float32), 16384)
    chunks, mask = jnp.asarray(chunks), jnp.asarray(mask)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))
    train_fn = make_train_fn(spec, num_epochs)
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    w = train_fn(w, chunks, mask, jnp.int32(0), jnp.int32(1))
    float(jnp.sum(w))
    t_min = {lo: float("inf"), hi: float("inf")}
    beg = 1
    for _ in range(reps):
        for depth in (lo, hi):
            t0 = time.perf_counter()
            w = train_fn(w, chunks, mask, jnp.int32(beg), jnp.int32(beg + depth))
            float(jnp.sum(w))
            t_min[depth] = min(t_min[depth], time.perf_counter() - t0)
            beg += depth
    per_epoch = (t_min[hi] - t_min[lo]) / (hi - lo)
    emit(OUT, {
        "exp": "hex_train_slope",
        "shape": [n, x * y, d],
        "t_lo_s": round(t_min[lo], 3),
        "t_hi_s": round(t_min[hi], 3),
        "per_epoch_ms": round(per_epoch * 1e3, 2),
        "samples_per_sec": round(n / per_epoch, 0),
    })


if __name__ == "__main__":
    main()
