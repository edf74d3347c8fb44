"""E4: XLA scatter-add vs Mosaic VMEM-accumulator scatter_stats
(VERDICT r2 #4).

    python tools/r3_scatter.py [out.jsonl]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np
from r3_measure import measure, emit

from xpysom_dask_tpu.ops.pallas.stats import scatter_stats

out = sys.argv[1] if len(sys.argv) > 1 else None
N, D, XY = 16384, 64, 16384
print(f"backend={jax.default_backend()}", file=sys.stderr)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, D).astype(np.float32))
m = jnp.asarray(np.ones(N, np.float32))
idx = jnp.asarray(rng.randint(XY, size=N).astype(np.int32))


def xla_impl(xx):
    aug = jnp.concatenate([xx, jnp.ones((N, 1), jnp.float32)], 1) * m[:, None]
    acc = jnp.zeros((XY, D + 1), jnp.float32).at[idx].add(aug)
    return acc[:, D].astype(jnp.int32), acc[:, :D]  # (as (idx,val) duck)


def mosaic_impl(xx):
    S, cnt = scatter_stats(xx, m, idx, XY)
    return cnt.astype(jnp.int32), S


for name, impl in (("xla", xla_impl), ("mosaic", mosaic_impl)):
    rec = {"exp": "scatter", "shape": [N, D, XY], "impl": name}
    try:
        rec.update(measure(impl, (x,), consume="val"))
    except Exception as e:  # lowering rejection is itself a result
        rec["error"] = f"{type(e).__name__}: {e}"[:300]
    emit(out, rec)
