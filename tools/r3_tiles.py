"""Slope-clean (TN, TJ) tile scan for the packed euclidean BMU kernel at
the flagship chunk shape (16384, 16384, 64).

The shipped default (1024, 1024) was chosen late round 2 with inner-
batched medians — a method round 3 showed still carries an additive
R/inner relay term that can reorder ~1 ms kernels. This re-ranks the
autotuner's candidate set with the two-depth slope (tools/r3_measure.py)
so any per-dispatch constant cancels. Appends to tools/r3_results.jsonl.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "./tools")

import jax
import jax.numpy as jnp
import numpy as np
from r3_measure import measure, emit

from xpysom_dask_tpu.ops.pallas.bmu import bmu_euclidean
from xpysom_dask_tpu.ops.pallas.autotune import DEFAULT_CANDIDATES

OUT = "tools/r3_results.jsonl"
N, XY, D = 16384, 16384, 64

print(f"backend={jax.default_backend()}", file=sys.stderr)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, D).astype(np.float32))
w = jnp.asarray(rng.rand(XY, D).astype(np.float32))
w_sq = jnp.sum(jnp.square(w), axis=1, keepdims=True)
c = jnp.mean(w, axis=0)

for tiles in DEFAULT_CANDIDATES:
    def call(xx, tiles=tiles):
        return bmu_euclidean(xx, w, w_sq, center=c, mode="packed", tiles=tiles)

    rec = {"exp": "tile_scan_slope", "shape": [N, XY, D], "tiles": list(tiles)}
    try:
        rec.update(measure(call, (x,), consume="idx", reps=3))
    except Exception as e:  # VMEM overflow / Mosaic reject is a result
        rec["error"] = f"{type(e).__name__}: {e}"[:200]
    emit(OUT, rec)
