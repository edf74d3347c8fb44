"""Benchmark: SOM batch-training throughput on the flagship workload.

Runs the full training step (BMU search + sufficient-statistics update)
for the north-star configuration shape — a 128×128 codebook over
64-dimensional fp32 samples (BASELINE.md) — on the default JAX backend
(the real TPU chip under the driver) and prints ONE JSON line:

    {"metric": "som_batch_step_samples_per_sec_per_chip", "value": ...,
     "unit": "samples/s/chip", "vs_baseline": ...}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is taken against the BASELINE.json north-star requirement expressed
per chip: 10^8 samples/epoch/min on a v5p-64 slice = 10^8 / 64 / 60
≈ 26,042 samples/s/chip on this workload. vs_baseline = value / 26042.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from xpysom_dask_tpu.core import SomSpec, chunk_data, make_epoch_fn

NORTH_STAR_SAMPLES_PER_SEC_PER_CHIP = 1e8 / 64 / 60  # BASELINE.json north star


def main():
    x = y = 128
    d = 64
    n = 1 << 19  # 512k samples per timed epoch (32 MB fp32)
    chunk = 8192
    epochs_warmup = 2
    epochs_timed = 5

    spec = SomSpec(
        x=x,
        y=y,
        input_len=d,
        sigma=x / 2,
        sigmaN=1.0,
        learning_rate=0.5,
        learning_rateN=0.01,
    )
    num_epochs = epochs_warmup + epochs_timed

    rng = np.random.RandomState(0)
    data_np = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = chunk_data(data_np, chunk)
    chunks = jnp.asarray(chunks)
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))

    step = make_epoch_fn(spec, num_epochs)

    print(
        f"backend={jax.default_backend()} devices={jax.devices()} "
        f"workload: {x}x{y}x{d} SOM, N={n}, chunk={chunk}",
        file=sys.stderr,
    )

    for t in range(epochs_warmup):
        w = step(w, chunks, mask, jnp.int32(t))
    w.block_until_ready()

    t0 = time.perf_counter()
    for t in range(epochs_warmup, num_epochs):
        w = step(w, chunks, mask, jnp.int32(t))
    w.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_sec = n * epochs_timed / dt
    print(
        f"{epochs_timed} epochs in {dt:.3f}s -> {samples_per_sec:,.0f} samples/s/chip",
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
