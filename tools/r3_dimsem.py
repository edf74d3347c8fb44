"""E2: re-measure the dimension_semantics penalty claim (VERDICT r2 #5).

The env var is read at bmu_euclidean trace time, so each setting runs in
its own process:

    python tools/r3_dimsem.py out.jsonl            # default
    XPYSOM_BMU_DIMSEM=1 python tools/r3_dimsem.py out.jsonl
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np
from r3_measure import measure, emit

from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu

out = sys.argv[1] if len(sys.argv) > 1 else None
tag = "parallel-arbitrary" if os.environ.get("XPYSOM_BMU_DIMSEM") else "default"
print(f"backend={jax.default_backend()} dimsem={tag}", file=sys.stderr)

rng = np.random.RandomState(0)
for (N, XY, D) in ((16384, 16384, 64), (16384, 4096, 512)):
    x = jnp.asarray(rng.rand(N, D).astype(np.float32))
    w = jnp.asarray(rng.rand(XY, D).astype(np.float32))
    for mode in ("packed", "bf16"):
        call = lambda xx, m=mode, ww=w: pl_bmu.bmu_euclidean(xx, ww, mode=m)
        rec = {
            "exp": "dimsem", "dimsem": tag, "shape": [N, XY, D], "mode": mode,
        }
        rec.update(measure(call, (x,), consume="val"))
        emit(out, rec)
