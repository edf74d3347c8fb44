"""Grid-mesh TE: fused top-2 branch vs matrix+top_k fallback (VERDICT r4 #3).

Round 5 routed the 2-D (data, model) mesh's topographic-error search
through the fused top-2 kernel (per-shard ``bmu_euclidean(top2=True)``
with the shard-invariant global center + the existing lexicographic
cross-shard merge, ``parallel/grid_sharded.py``). A single chip can form
a degenerate (data=1, model=1) grid mesh, which lowers the REAL sharded
program (shard_map, axis_index, psum center, fused kernel, merge) through
Mosaic — the closest 2-shard-feasible measurement this rig admits, and
the same program shape that runs per-shard on a real 2-D mesh.

Measures both formulations with the two-depth inner-scan slope
(r3_measure) at the flagship eval shape, plus end-to-end TE equality.

Run on the TPU: ``python -u tools/r5_grid_te.py``.
Appends JSON lines to ``tools/r5_results.jsonl``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3_measure import emit  # noqa: E402
from xpysom_dask_tpu.core import SomSpec, chunk_data  # noqa: E402
from xpysom_dask_tpu.parallel.grid_sharded import (  # noqa: E402
    make_grid_mesh,
    make_topographic_stats_fn_2d,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")


def main():
    import time

    x = y = int(os.environ.get("XSOM_GRID_TE_XY", 128))
    d = int(os.environ.get("XSOM_GRID_TE_D", 64))
    n = int(os.environ.get("XSOM_GRID_TE_N", 1 << 16))
    chunk = 16384

    spec_fused = SomSpec(x, y, d, 2.0, 1.0, 0.5, 0.01)
    # use_pallas=False closes the kernel gate -> the lax.top_k fallback
    # program (distinct spec, so the lru-cached factory rebuilds)
    spec_fallback = SomSpec(
        x, y, d, 2.0, 1.0, 0.5, 0.01, use_pallas=False
    )
    mesh = make_grid_mesh(1, 1)

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))
    data_np = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = chunk_data(data_np, chunk)
    chunks, mask = jnp.asarray(chunks), jnp.asarray(mask)

    print(f"backend={jax.default_backend()} grid(1,1) {x}x{y}x{d} N={n}",
          file=sys.stderr)

    vals = {}
    for name, spec in (("fused", spec_fused), ("fallback", spec_fallback)):
        fn = make_topographic_stats_fn_2d(spec, mesh)

        def once(fn=fn):
            errs, cnt = fn(w, chunks, mask)
            return float(errs), float(cnt)

        e, c = once()  # compile + warmup
        vals[name] = e / c
        med = {}
        for reps_inner in (1, 4):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(reps_inner):
                    once()
                ts.append(time.perf_counter() - t0)
            med[reps_inner] = min(ts)
        per_call = (med[4] - med[1]) / 3
        rate = n / per_call if per_call > 0 else float("nan")
        emit(OUT, {
            "tool": "r5_grid_te", "variant": name,
            "shape": [x, y, d], "n": n,
            "te": round(vals[name], 6),
            "per_call_s": round(per_call, 4),
            "samples_per_sec": round(rate, 1),
            "backend": jax.default_backend(),
        })
    assert abs(vals["fused"] - vals["fallback"]) < 2e-3, vals
    print("TE equal:", vals, file=sys.stderr)


if __name__ == "__main__":
    main()
