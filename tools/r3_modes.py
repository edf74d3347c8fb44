"""E1: rank euclidean BMU precision modes at the in-epoch chunk shape.

Configs: packed / bf16 (f32 + bf16 d-tile) / margin (f32 + bf16 d-tile,
each consumed idx-only = training path, and val = full glue) — slope-
decontaminated per-exec times (tools/r3_measure.py). Usage:

    python tools/r3_modes.py [out.jsonl] [N XY D]
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
N, XY, D = (
    (int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    if len(sys.argv) > 4
    else (16384, 16384, 64)
)
print(f"backend={jax.default_backend()} shape=({N},{XY},{D})", file=sys.stderr)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, D).astype(np.float32))
w = jnp.asarray(rng.rand(XY, D).astype(np.float32))

CONFIGS = [
    ("packed", "f32", "val"),
    ("bf16", "f32", "val"),
    ("bf16", "bf16", "val"),
    ("margin", "f32", "idx"),
    ("margin", "f32", "val"),
    ("margin", "bf16", "idx"),
    ("margin", "bf16", "val"),
]
# optional filter: XSOM_MODES="margin:f32:idx,bf16:bf16:val"
import os

_filt = os.environ.get("XSOM_MODES")
if _filt:
    want = {tuple(c.split(":")) for c in _filt.split(",")}
    CONFIGS = [c for c in CONFIGS if c in want]

for mode, dtile, consume in CONFIGS:
    call = lambda xx, m=mode, dt=dtile: pl_bmu.bmu_euclidean(
        xx, w, mode=m, dtile=dt
    )
    rec = {"exp": "modes", "shape": [N, XY, D], "mode": mode, "dtile": dtile}
    try:
        rec.update(measure(call, (x,), consume=consume))
    except Exception as e:  # one failed config must not kill the sweep
        rec["error"] = f"{type(e).__name__}: {e}"[:300]
    emit(out, rec)
