"""split2 BMU mode: speed ranking + fidelity catalog (VERDICT r4 #2).

The round-4 verdict asked for the unexplored 2-term euclidean split —
``[xh|xl] @ [wh;wh]`` with a self-consistent ``‖w_h‖²`` operand, K=2D+3
— predicted ~1.25-1.35x of packed (gap ∝ ΔK from the r3 MXU-bound
analysis) with a second-order flip error (exact distance to the
bf16-rounded codebook). This tool measures both claims on-chip:

1. slope-ranked per-exec ms for packed / split2 / bf16 at the flagship
   and wide-D shapes (consume='idx', the training-path contract);
2. winner flips vs a float64 oracle on (a) random data and (b) the
   offset near-tied smoothed-codebook regime, centered like training;
3. the r4 accuracy catalog (iris / digits / color quantization) trained
   under 'split2' vs 'packed' through the public API.

Run on the TPU:   python -u tools/r5_split2.py [speed|fidelity|catalog]
Appends JSON lines to ``tools/r5_results.jsonl``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3_measure import measure, emit  # noqa: E402
from xpysom_dask_tpu.ops.pallas.bmu import bmu_euclidean  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")

SHAPES = [(16384, 16384, 64), (16384, 4096, 512)]
MODES = ("packed", "split2", "bf16")


def speed():
    for n, xy, d in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(n, d).astype(np.float32))
        w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
        for mode in MODES:
            def call(xv, wv, m=mode):
                return bmu_euclidean(xv, wv, mode=m)

            rec = measure(call, (x, w), consume="idx")
            emit(OUT, {
                "tool": "r5_split2", "kind": "speed", "mode": mode,
                "shape": [n, xy, d], "backend": jax.default_backend(),
                **rec,
            })


def _flips(x, w, mode, center):
    idx, _ = bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w),
        center=jnp.asarray(center) if center is not None else None,
        mode=mode,
    )
    d64 = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
        w.astype(np.float64) ** 2
    ).sum(1)
    return int((np.asarray(idx) != d64.argmin(1)).sum()), x.shape[0]


def fidelity():
    rng = np.random.RandomState(0)
    # (a) random/untrained regime at a real search shape
    x = rng.rand(8192, 64).astype(np.float32)
    w = rng.rand(4096, 64).astype(np.float32)
    # (b) offset + smoothed (trained-codebook-like near ties)
    xo = (rng.rand(8192, 64) * 4 + 10).astype(np.float32)
    wo = (rng.rand(4096, 64) * 4 + 10).astype(np.float32)
    wo = 0.9 * wo.mean(0) + 0.1 * wo
    for name, xx, ww in (("random", x, w), ("offset_smoothed", xo, wo)):
        for mode in MODES:
            f, n = _flips(xx, ww, mode, ww.mean(0))
            emit(OUT, {
                "tool": "r5_split2", "kind": "fidelity", "regime": name,
                "mode": mode, "flips": f, "rows": n,
                "backend": jax.default_backend(),
            })


def catalog():
    from xpysom_dask_tpu import XPySom
    sys.path.insert(
        0, os.path.dirname(os.path.abspath(__file__))
    )
    from r4_bf16_accuracy import workloads

    for name, data, kw, epochs in workloads():
        out = {}
        maps = {}
        for prec in ("packed", "split2"):
            som = XPySom(
                kw["x"], kw["y"], data.shape[1], bmu_precision=prec,
                **{k: v for k, v in kw.items() if k not in ("x", "y")},
            )
            som.train(data, epochs)
            out[f"qe_{prec}"] = float(som.quantization_error(data))
            out[f"te_{prec}"] = float(som.topographic_error(data))
            maps[prec] = som
        out["qe_delta_rel"] = abs(out["qe_split2"] - out["qe_packed"]) / max(
            out["qe_packed"], 1e-12
        )
        out["te_delta_abs"] = abs(out["te_split2"] - out["te_packed"])
        wa = maps["packed"].predict(data)
        wb = maps["split2"].predict(data)
        out["trained_map_winner_disagreement"] = float(np.mean(wa != wb))
        emit(OUT, {
            "tool": "r5_split2", "kind": "catalog", "workload": name,
            "epochs": epochs, "backend": jax.default_backend(),
            **{k: round(v, 6) for k, v in out.items()},
        })


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    if which in ("speed", "all"):
        speed()
    if which in ("fidelity", "all"):
        fidelity()
    if which in ("catalog", "all"):
        catalog()
