"""E3: rank manhattan L1 accumulation variants (VERDICT r2 #6).

    python tools/r3_manhattan.py [out.jsonl]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np
from r3_measure import measure, emit

from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu

out = sys.argv[1] if len(sys.argv) > 1 else None
N, XY, D = 16384, 16384, 64
print(f"backend={jax.default_backend()}", file=sys.stderr)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, D).astype(np.float32))
w = jnp.asarray(rng.rand(XY, D).astype(np.float32))

for accum in ("serial", "split2", "split4", "bf16"):
    call = lambda xx, a=accum: pl_bmu.bmu_manhattan(xx, w, accum=a)
    rec = {"exp": "manhattan", "shape": [N, XY, D], "accum": accum}
    rec.update(measure(call, (x,), consume="val"))
    emit(out, rec)
