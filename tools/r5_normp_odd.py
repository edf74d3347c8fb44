"""Odd-p norm_p kernel: speed + transient-memory envelope (VERDICT r4 #7).

The odd-p elementwise kernel's claim is the L1 kernel's (BASELINE.md):
speed parity with the XLA broadcast path is acceptable — the win is the
O(N) transient instead of the XLA path's O(chunk·XY·D) broadcast tensor,
which is what allows big-codebook searches at training-sized chunks.

Measures, at (16384, 16384, 64) p=3:
1. slope-ranked per-exec ms for the kernel vs the XLA formulation
   (consume='idx', r3_measure discipline);
2. the envelope point: a (16384, 262144-node, 64) search — the XLA
   path's broadcast transient would be 16384·262144·64·4 B = 1 TB-class
   (it cannot run); the kernel's VMEM working set is tile-sized. Runs
   the kernel only, records the rate.

Run on the TPU: ``python -u tools/r5_normp_odd.py [speed|envelope]``.
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
from xpysom_dask_tpu.ops.pallas.bmu import bmu_norm_p_odd  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")


def xla_norm_p_odd(x, w, p=3):
    d = jnp.sum(jnp.abs(x[:, None, :] - w[None, :, :]) ** p, axis=-1)
    return jnp.argmin(d, axis=1).astype(jnp.int32), jnp.min(d, axis=1)


def speed():
    n, xy, d = 16384, 16384, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
    for name, call in (
        ("kernel", lambda xv, wv: bmu_norm_p_odd(xv, wv, p=3)),
        ("xla", lambda xv, wv: xla_norm_p_odd(xv, wv, p=3)),
    ):
        # the XLA broadcast at this shape transiently wants
        # 16384·16384·64·4 B ≈ 64 GB unless XLA fuses the reduce; if it
        # OOMs that IS the envelope result — record and continue
        try:
            rec = measure(call, (x, w), consume="idx", lo=2, hi=10)
        except Exception as e:  # noqa: BLE001
            emit(OUT, {
                "tool": "r5_normp_odd", "kind": "speed", "variant": name,
                "shape": [n, xy, d], "p": 3,
                "error": f"{type(e).__name__}: {e}"[:300],
                "backend": jax.default_backend(),
            })
            continue
        emit(OUT, {
            "tool": "r5_normp_odd", "kind": "speed", "variant": name,
            "shape": [n, xy, d], "p": 3,
            "backend": jax.default_backend(), **rec,
        })


def envelope():
    n, xy, d = 16384, 1 << 18, 64
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(xy, d).astype(np.float32))
    rec = measure(
        lambda xv, wv: bmu_norm_p_odd(xv, wv, p=3), (x, w),
        consume="idx", lo=1, hi=4,
    )
    emit(OUT, {
        "tool": "r5_normp_odd", "kind": "envelope", "variant": "kernel",
        "shape": [n, xy, d], "p": 3,
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
