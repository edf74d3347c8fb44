"""Fractional-p norm_p kernel: speed + fidelity vs the XLA path (round 5
close-out).

The fractional-p elementwise kernel (`bmu_norm_p_frac`) extends the
odd-p kernel's claim to non-integer p: same fidelity class as the XLA
broadcast path (both lower the non-integer pow as exp(p·log t)), O(N)
transient instead of O(chunk·XY·D). Measures, at (16384, 16384, 64)
p=1.5:

1. slope-ranked per-exec ms for the kernel vs the XLA formulation
   (consume='idx', r3_measure discipline);
2. winner agreement between the two programs on a 4096-row sample
   (both are inexact in the same class; disagreements should sit on
   float64 near-ties only);
3. the envelope point: a (16384, 262144-node, 64) search the XLA
   broadcast transient cannot run.

Run on the TPU: ``python -u tools/r5_normp_frac.py [speed|envelope]``.
Appends JSON lines to ``tools/r5_results.jsonl``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3_measure import emit, measure  # noqa: E402
from xpysom_dask_tpu.ops.pallas.bmu import bmu_norm_p_frac  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")

P = 1.5


def xla_norm_p_frac(x, w, p=P):
    d = jnp.sum(jnp.abs(x[:, None, :] - w[None, :, :]) ** p, axis=-1)
    return jnp.argmin(d, axis=1).astype(jnp.int32), jnp.min(d, axis=1)


def speed():
    n, xy, d = 16384, 16384, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
    for name, call in (
        ("kernel", lambda xv, wv: bmu_norm_p_frac(xv, wv, p=P)),
        ("xla", lambda xv, wv: xla_norm_p_frac(xv, wv, p=P)),
    ):
        try:
            rec = measure(call, (x, w), consume="idx", lo=2, hi=10)
        except Exception as e:  # noqa: BLE001
            emit(OUT, {
                "tool": "r5_normp_frac", "kind": "speed", "variant": name,
                "shape": [n, xy, d], "p": P,
                "error": f"{type(e).__name__}: {e}"[:300],
                "backend": jax.default_backend(),
            })
            continue
        emit(OUT, {
            "tool": "r5_normp_frac", "kind": "speed", "variant": name,
            "shape": [n, xy, d], "p": P,
            "backend": jax.default_backend(), **rec,
        })

    # fidelity: kernel vs XLA winner agreement on a sample, near-tie-aware
    ns = 4096
    xs, ws = x[:ns], w[:4096]
    ik = np.asarray(bmu_norm_p_frac(xs, ws, p=P)[0])
    ix = np.asarray(xla_norm_p_frac(xs, ws, p=P)[0])
    d64 = (
        np.abs(np.asarray(xs)[:, None].astype(np.float64)
               - np.asarray(ws)[None].astype(np.float64)) ** P
    ).sum(-1)
    order = np.sort(d64, axis=1)
    margin = (order[:, 1] - order[:, 0]) / order[:, 0]
    dis_k = ik != d64.argmin(1)
    dis_x = ix != d64.argmin(1)
    emit(OUT, {
        "tool": "r5_normp_frac", "kind": "fidelity", "shape": [ns, 4096, d],
        "p": P, "backend": jax.default_backend(),
        "kernel_flips_vs_float64": int(dis_k.sum()),
        "xla_flips_vs_float64": int(dis_x.sum()),
        "kernel_flips_outside_1e4_margin": int(np.sum(dis_k & (margin > 1e-4))),
        "xla_flips_outside_1e4_margin": int(np.sum(dis_x & (margin > 1e-4))),
        "kernel_vs_xla_disagreements": int((ik != ix).sum()),
    })


def envelope():
    n, xy, d = 16384, 1 << 18, 64
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
    rec = measure(
        lambda xv, wv: bmu_norm_p_frac(xv, wv, p=P), (x, w),
        consume="idx", lo=1, hi=4,
    )
    emit(OUT, {
        "tool": "r5_normp_frac", "kind": "envelope", "variant": "kernel",
        "shape": [n, xy, d], "p": P,
        "searches_per_sec": round(n / (rec["per_exec_ms"] / 1e3), 1),
        "backend": jax.default_backend(), **rec,
    })


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    if which in ("speed", "all"):
        speed()
    if which in ("envelope", "all"):
        envelope()
