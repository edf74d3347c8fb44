"""Tiled Manhattan-distance Pallas kernel.

TPU counterpart of the reference's one native component — the CuPy/CUDA
``ReductionKernel`` for L1 distance (reference distances.py:109-135, ~3×
over the broadcast fallback per its own docstring). The XLA broadcast
fallback materializes the ``(N, XY, D)`` difference tensor; this kernel
streams ``(TN, D)`` sample and ``(D, TJ)`` codebook tiles into VMEM and
accumulates ``Σ_d |x - w|`` directly into the ``(TN, TJ)`` output tile,
reading each input once and writing the ``(N, XY)`` result once — the
HBM-traffic lower bound for this op.

The feature loop is unrolled at trace time (D is static), keeping every
VPU op in the natural (sublane=samples, lane=codebook) layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["manhattan_distance", "supported"]

_TN = 256
_TJ = 1024
_MAX_UNROLL_D = 256


def _kernel(x_ref, wt_ref, out_ref):
    x = x_ref[:]  # (TN, D)
    wt = wt_ref[:]  # (D, TJ)
    d_dim = x.shape[1]
    acc = jnp.zeros((x.shape[0], wt.shape[1]), dtype=jnp.float32)
    for k in range(d_dim):  # static unroll, layout-preserving VPU ops
        acc = acc + jnp.abs(x[:, k : k + 1] - wt[k : k + 1, :])
    out_ref[:] = acc


def supported(x, w) -> bool:
    """Use the fused kernel on TPU for moderate feature counts (the unroll
    is per-feature; huge D would bloat the kernel body)."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return x.ndim == 2 and w.ndim == 2 and x.shape[1] <= _MAX_UNROLL_D


@partial(jax.jit, static_argnames=("interpret",))
def manhattan_distance(x, w, *, interpret=False):
    """(N, XY) Manhattan distance matrix via the tiled Pallas kernel."""
    n, d_dim = x.shape
    xy = w.shape[0]

    tn = min(_TN, max(8, -(-n // 8) * 8))
    tj = min(_TJ, max(128, -(-xy // 128) * 128))
    n_pad = -(-n // tn) * tn
    xy_pad = -(-xy // tj) * tj

    x_p = jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    wt = jnp.pad(w.astype(jnp.float32).T, ((0, 0), (0, xy_pad - xy)))

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // tn, xy_pad // tj),
        in_specs=[
            pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tn, tj), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, xy_pad), jnp.float32),
        interpret=interpret,
    )(x_p, wt)
    return out[:n, :xy]
