"""Benchmark: SOM batch-training throughput on the flagship workload.

Runs whole training epochs (fused BMU search + sufficient-statistics
update, on-device epoch loop) for the north-star configuration shape —
a 128×128 codebook over 64-dimensional fp32 samples (BASELINE.md) — on the
default JAX backend (the real TPU chip under the driver) and prints ONE
JSON line:

    {"metric": "som_batch_step_samples_per_sec_per_chip", "value": ...,
     "unit": "samples/s/chip", "vs_baseline": ...}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is taken against the BASELINE.json north-star requirement expressed
per chip: 10^8 samples/epoch/min on a v5p-64 slice = 10^8 / 64 / 60
≈ 26,042 samples/s/chip on this workload. vs_baseline = value / 26042.

Synchronization note: ``block_until_ready`` is advisory on some tunneled
TPU transports, so timing syncs by fetching a reduction to host.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from xpysom_dask_tpu.core import SomSpec, chunk_data, make_train_fn

NORTH_STAR_SAMPLES_PER_SEC_PER_CHIP = 1e8 / 64 / 60  # BASELINE.json north star


def main():
    import os

    # env overrides for smoke-testing on small hosts; driver runs defaults
    x = y = int(os.environ.get("XSOM_BENCH_XY", 128))
    d = int(os.environ.get("XSOM_BENCH_D", 64))
    n = int(os.environ.get("XSOM_BENCH_N", 1 << 19))
    chunk = int(os.environ.get("XSOM_BENCH_CHUNK", 16384))
    epochs_warmup = 1
    # 15 timed epochs ≈ 0.55 s of device work: long enough that the one
    # dispatch+host-sync round-trip (~5-20 ms on tunneled transports)
    # stays <4% of the measurement.
    epochs_timed = int(os.environ.get("XSOM_BENCH_EPOCHS", 15))

    spec = SomSpec(
        x=x,
        y=y,
        input_len=d,
        sigma=x / 2,
        sigmaN=1.0,
        learning_rate=0.5,
        learning_rateN=0.01,
    )
    # schedule length (static); we time fresh slices of it — sized so the
    # warmup + three timed reps always stay inside the schedule
    num_epochs = max(100, epochs_warmup + 3 * epochs_timed)

    rng = np.random.RandomState(0)
    data_np = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = chunk_data(data_np, chunk)
    chunks = jnp.asarray(chunks)
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))

    train_fn = make_train_fn(spec, num_epochs)

    def sync(arr):
        return float(jnp.sum(arr))

    print(
        f"backend={jax.default_backend()} devices={jax.devices()} "
        f"workload: {x}x{y}x{d} SOM, N={n}, chunk={chunk}",
        file=sys.stderr,
    )

    w = train_fn(w, chunks, mask, jnp.int32(0), jnp.int32(epochs_warmup))
    sync(w)

    # Best of 3 timed dispatches: on relayed transports the per-dispatch
    # queue latency is load-dependent (measured 2 s -> 16 s round-trips
    # under load, BASELINE.md round-2 addendum) — the minimum is the
    # honest device-throughput estimate. Each rep times a fresh slice of
    # the 100-epoch schedule, so compiled code and decay math are real.
    dt = float("inf")
    beg = epochs_warmup
    for _ in range(3):
        t0 = time.perf_counter()
        w = train_fn(
            w,
            chunks,
            mask,
            jnp.int32(beg),
            jnp.int32(beg + epochs_timed),
        )
        checksum = sync(w)
        dt = min(dt, time.perf_counter() - t0)
        beg += epochs_timed

    samples_per_sec = n * epochs_timed / dt
    print(
        f"{epochs_timed} epochs in {dt:.3f}s -> {samples_per_sec:,.0f} "
        f"samples/s/chip (checksum {checksum:.1f})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "som_batch_step_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(
                    samples_per_sec / NORTH_STAR_SAMPLES_PER_SEC_PER_CHIP, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
