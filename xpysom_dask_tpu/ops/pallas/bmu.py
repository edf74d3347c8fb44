"""Fused BMU-search Pallas kernel.

Computes, for each sample, the argmin over grid nodes of the partial
squared euclidean distance ``-2 x·w + ‖w‖²`` (the reference's 'euclidean'
activation, distances.py:11-23 + argmin at xpysom.py:416) WITHOUT ever
materializing the ``(N, XY)`` distance matrix in HBM.

Why this is the kernel that matters: at the north-star shape
(chunk=8192, XY=16384, D=64) the XLA path writes + re-reads a 512 MB
distance matrix per chunk — ~20× more HBM traffic than the inputs
themselves. Here each ``(TN, TJ)`` distance tile lives only in VMEM: the
MXU computes ``x_tile @ w_tileᵀ``, the VPU folds it into a running
(min, argmin) carried in VMEM scratch across codebook tiles, and only the
``(N, 1)`` winner indices/values leave the chip.

Tie-breaking matches NumPy argmin (first index wins): within a tile the
first-minimum lane is selected via an iota trick, across tiles a strict
``<`` keeps the earlier tile's winner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bmu_euclidean", "supported"]

_BIG_I32 = np.int32(2**31 - 1)

# Tile sizes: TN samples × TJ codebook nodes per VMEM-resident distance
# tile. TN*TJ*4 bytes (distance tile) + TJ*D*4 (codebook tile) must fit
# comfortably in ~16 MB VMEM alongside double-buffered inputs.
_TN = 256
_TJ = 2048


def _kernel(x_ref, wt_ref, wsq_ref, idx_ref, val_ref, best_ref, bestidx_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    x = x_ref[:]  # (TN, D)
    wt = wt_ref[:]  # (D, TJ)
    # MXU matmul at full fp32 accuracy (argmin is precision-sensitive).
    cross = jnp.dot(
        x,
        wt,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = -2.0 * cross + wsq_ref[:]  # (TN, TJ), wsq broadcast (1, TJ)

    tile_min = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    # first-index-of-min within the tile (NumPy argmin tie-breaking)
    tile_arg = jnp.min(
        jnp.where(d == tile_min, lane, _BIG_I32), axis=1, keepdims=True
    )
    tile_arg = tile_arg + j * d.shape[1]

    better = tile_min < best_ref[:]
    best_ref[:] = jnp.where(better, tile_min, best_ref[:])
    bestidx_ref[:] = jnp.where(better, tile_arg, bestidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = bestidx_ref[:]
        val_ref[:] = best_ref[:]


def _pad_to(a, size, axis, value):
    pad = size - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


def supported() -> bool:
    """The fused kernel targets the TPU Mosaic backend."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("interpret",))
def bmu_euclidean(x, w_flat, w_sq=None, *, interpret=False):
    """Fused BMU search: returns ``(idx, minval)`` with shapes ``(N,)``
    int32 / ``(N,)`` float32, where ``idx[n] = argmin_j(-2 x_n·w_j + ‖w_j‖²)``
    and ``minval`` is that partial squared distance (add ``‖x‖²`` for the
    true squared distance).

    Inputs of any (N, D)/(XY, D) shape: samples are padded to the sample
    tile, codebook nodes to the lane tile with ``+inf`` ‖w‖² so padding can
    never win the argmin.
    """
    n, d_dim = x.shape
    xy = w_flat.shape[0]
    if w_sq is None:
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
    w_sq = w_sq.reshape(1, xy)

    tn = min(_TN, max(8, -(-n // 8) * 8))
    tj = min(_TJ, max(128, -(-xy // 128) * 128))
    n_pad = -(-n // tn) * tn
    xy_pad = -(-xy // tj) * tj

    x_p = _pad_to(x.astype(jnp.float32), n_pad, 0, 0.0)
    wt = _pad_to(w_flat.astype(jnp.float32).T, xy_pad, 1, 0.0)  # (D, XYp)
    wsq_p = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, jnp.inf)

    grid = (n_pad // tn, xy_pad // tj)
    idx, val = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x_p, wt, wsq_p)
    return idx[:n, 0], val[:n, 0]
