"""Confirm the SHIPPED SomPopulation serial path rides the measured
per-member program after the round-5 close-out fix (auto members
self-size like standalone XPySoms: fused 16384-row chunks instead of
the population's concatenated-matrix budget, ~256 rows at P=16).

The r5 crossover table's 'serial x P' rows were measured through a
STANDALONE som's chunking (tools/r5_population_fused.py:91), so they
already reflect the member-sized chunk — this tool checks the public
`SomPopulation.train(strategy='serial')` now matches that slope
(P=16, 24x24x16, N=2^17: measured 17.91 ms/ep -> ~1.12 ms/member/ep).

Epoch-slope method: time train(E_hi) - train(E_lo) on the SAME
device-resident program family; the whole-run fori_loop executes
on-device, the write-back is the host sync. Run from the repo root on
the TPU. Appends a row to tools/r5_results.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xpysom_dask_tpu import SomPopulation  # noqa: E402

P, X, Y, D = 16, 24, 24, 16
N = 1 << 17
E_LO, E_HI = 4, 20


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    data = rng.rand(N, D).astype(np.float32)

    pop = SomPopulation(P, X, Y, D, sigma=3.0, random_seed=1)
    member_chunk = pop.member(0)._n_parallel
    print("member n_parallel:", member_chunk)

    # warm both executables (E_LO and E_HI depths compile separately)
    pop.train(data, E_LO, strategy="serial")
    pop.train(data, E_HI, strategy="serial")

    def run(epochs, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pop.train(data, epochs, strategy="serial")
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(E_LO)
    t_hi = run(E_HI)
    ms_per_epoch = (t_hi - t_lo) / (E_HI - E_LO) * 1e3
    row = {
        "tool": "r5_serial_shipped",
        "P": P, "map": [X, Y, D], "n": N,
        "member_n_parallel": int(member_chunk),
        "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
        "shipped_serial_ms_per_epoch": round(ms_per_epoch, 3),
        "measured_program_ms_per_epoch": 17.91,  # r5 crossover table, P=16
    }
    print(json.dumps(row))
    with open(os.path.join(os.path.dirname(__file__), "r5_results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
