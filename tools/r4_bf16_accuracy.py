"""bf16 BMU mode: accuracy cost on the workload catalog (VERDICT r3 #9).

The 1.60x throughput claim for ``bmu_precision='bf16'`` ships with a
flip-rate abstraction (~1.5-2% near-tie winners); this tool grounds it
in the catalog workloads users actually run (SURVEY §2.9): iris,
handwritten digits, color quantization. For each workload it trains the
same SOM config in 'packed' (exact argmin) and 'bf16' and records
QE / TE deltas plus the winner-disagreement rate of the *trained* maps.

Run on the TPU (the bf16 mode only differs there — the CPU test backend
dispatches both to the same XLA path, making this a null measurement
off-chip):

    python -u tools/r4_bf16_accuracy.py

Appends one JSON line per workload to ``tools/r4_results.jsonl``.
"""

import json
import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu import XPySom  # noqa: E402


def synth_image(h=128, w=128):
    """Same synthetic RGB image as examples/color_quantization.py."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sin(xx / 17) * 0.5 + 0.5
    g = np.cos(yy / 11) * 0.5 + 0.5
    b = ((xx + yy) % 64) / 64
    return np.stack([r, g, b], axis=-1).reshape(-1, 3).astype(np.float32)


def workloads():
    from sklearn import datasets

    iris = datasets.load_iris().data.astype(np.float32)
    iris = (iris - iris.mean(0)) / iris.std(0)
    yield "iris", iris, dict(x=7, y=7, sigma=3, random_seed=10), 50

    digits = datasets.load_digits().data.astype(np.float32) / 16.0
    yield "digits", digits, dict(x=20, y=20, sigma=8, random_seed=1), 30

    yield (
        "color_quantization",
        synth_image(),
        dict(x=4, y=4, sigma=1.5, neighborhood_function="bubble", random_seed=3),
        15,
    )


def run_one(name, data, kw, epochs):
    out = {}
    maps = {}
    for prec in ("packed", "bf16"):
        x = kw.pop("x")
        y = kw.pop("y")
        som = XPySom(x, y, data.shape[1], bmu_precision=prec, **kw)
        kw["x"], kw["y"] = x, y
        som.train(data, epochs)
        out[f"qe_{prec}"] = float(som.quantization_error(data))
        te = float(som.topographic_error(data))
        out[f"te_{prec}"] = te
        maps[prec] = som
    out["qe_delta_rel"] = (
        abs(out["qe_bf16"] - out["qe_packed"]) / max(out["qe_packed"], 1e-12)
    )
    out["te_delta_abs"] = abs(out["te_bf16"] - out["te_packed"])
    # winner disagreement between the two trained maps (cross-program
    # comparison — chaotic near-tie divergence expected; QE is the metric)
    wa = maps["packed"].predict(data)
    wb = maps["bf16"].predict(data)
    out["trained_map_winner_disagreement"] = float(np.mean(wa != wb))
    rec = {
        "tool": "r4_bf16_accuracy",
        "workload": name,
        "n": int(data.shape[0]),
        "d": int(data.shape[1]),
        "epochs": epochs,
        "backend": jax.default_backend(),
        **{k: (round(v, 6) if isinstance(v, float) else v) for k, v in out.items()},
    }
    print(json.dumps(rec))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r4_results.jsonl"
    )
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for name, data, kw, epochs in workloads():
        run_one(name, data, kw, epochs)


if __name__ == "__main__":
    main()
