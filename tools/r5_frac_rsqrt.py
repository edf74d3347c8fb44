"""frac=½ transcendental lowering experiment: sqrt vs t·rsqrt(t).

NEW-mechanism hypothesis (CLAUDE.md re-open rule): the fractional-p
kernel at p=1.5 measured 54.2 ms/exec at (16384, 16384, 64) vs the odd-p
kernel's 15.8 — the per-element ``sqrt`` transcendental dominates. If
Mosaic lowers ``jax.lax.rsqrt`` onto a cheaper hardware
reciprocal-sqrt sequence than full ``sqrt``, evaluating ``t^½`` as
``t·rsqrt(t)`` (plus two masking selects for the 0·inf products) could
claw back part of that gap; if the two lower to the same sequence the
selects make it a measured negative.

Run on the TPU: ``python -u tools/r5_frac_rsqrt.py``. Appends JSON
lines to ``tools/r5_results.jsonl``.
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3_measure import emit, measure  # noqa: E402
from xpysom_dask_tpu.ops.pallas.bmu import (  # noqa: E402
    _elementwise_bmu_call,
    _kernel_lp_frac_argmin,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")

P = 1.5


@partial(jax.jit, static_argnames=("half_impl",))
def frac_bmu(x, w, half_impl):
    return _elementwise_bmu_call(
        partial(_kernel_lp_frac_argmin, p=P, half_impl=half_impl),
        x, w, None, False,
    )


def main():
    n, xy, d = 16384, 16384, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))

    # fidelity first (cheap): the two variants must agree away from
    # float64 near-ties, and rsqrt's masking must keep padding losing
    ik_s = np.asarray(frac_bmu(x[:4096], w[:4096], "sqrt")[0])
    ik_r = np.asarray(frac_bmu(x[:4096], w[:4096], "rsqrt")[0])
    d64 = (
        np.abs(np.asarray(x[:4096])[:, None].astype(np.float64)
               - np.asarray(w[:4096])[None].astype(np.float64)) ** P
    ).sum(-1)
    order = np.sort(d64, axis=1)
    margin = (order[:, 1] - order[:, 0]) / order[:, 0]
    dis_r = ik_r != d64.argmin(1)
    emit(OUT, {
        "tool": "r5_frac_rsqrt", "kind": "fidelity", "p": P,
        "shape": [4096, 4096, d], "backend": jax.default_backend(),
        "rsqrt_flips_vs_float64": int(dis_r.sum()),
        "rsqrt_flips_outside_1e4_margin": int(np.sum(dis_r & (margin > 1e-4))),
        "rsqrt_vs_sqrt_disagreements": int((ik_s != ik_r).sum()),
    })

    for impl in ("sqrt", "rsqrt"):
        rec = measure(
            lambda xv, wv, i=impl: frac_bmu(xv, wv, i), (x, w),
            consume="idx", lo=2, hi=10,
        )
        emit(OUT, {
            "tool": "r5_frac_rsqrt", "kind": "speed", "variant": impl,
            "shape": [n, xy, d], "p": P,
            "backend": jax.default_backend(), **rec,
        })


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    main()
