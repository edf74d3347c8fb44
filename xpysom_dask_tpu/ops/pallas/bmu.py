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

Precision: the argmin is sensitive to the TPU's bf16 matmul default (~2%
flipped winners at fp32-data magnitudes), but full ``Precision.HIGHEST``
costs 6 MXU passes. The kernel uses a **3-term bf16 split**
(``x·w ≈ xh·wh + xh·wl + xl·wh`` with ``xh = bf16(x)``, ``xl = x - xh``)
— ~f32-accurate (the dropped ``xl·wl`` term is O(2⁻²²) relative). The
default ``packed`` mode additionally packs the two ``·wh`` terms into one
K=2D matmul (``[xh|xl] @ [wh;wh]``), so the whole cross-term costs ~1.5
K=D-passes: measured 2.3× over HIGHEST with zero argmin disagreements vs
float64. Splits are computed with ``jax.lax.reduce_precision`` — the
naive ``bf16(x - f32(bf16(x)))`` is silently elided to zero under XLA's
``--xla_allow_excess_precision``. ``XPYSOM_BMU_PRECISION`` selects
``packed`` (default) / ``split3`` (in-kernel splits) / ``highest``
(exact 6-pass f32).

Tie-breaking matches NumPy argmin (first index wins): within a tile the
first-minimum lane is selected via an iota trick, across tiles a strict
``<`` keeps the earlier tile's winner.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bmu_euclidean", "supported"]

_BIG_I32 = np.int32(2**31 - 1)

# Tile sizes: TN samples × TJ codebook nodes per VMEM-resident distance
# tile; (TN·TJ + temps) · 4B must fit ~16 MB VMEM with double-buffered
# inputs. (1024, 1024) measured fastest among fitting configs on v5e for
# narrow features; tiles shrink with D (input tiles scale with D).
_TN = 1024
_TJ = 1024


def _tiles_for(d_dim: int):
    """Shrink the sample/lane tiles as the feature width grows so the
    per-step VMEM footprint (inputs ~4·T·D bytes + 8·TN·TJ distance/temp
    bytes) stays inside an ~8 MB working budget."""
    if d_dim <= 256:
        return _TN, _TJ  # (1024, 1024): measured fastest on v5e
    if d_dim <= 512:
        return 512, 1024  # 9.4 ms at 8192x4096x512 (square tiles were 15x slower)
    if d_dim <= 1024:
        return 256, 512
    return 128, 256


def _split_bf16(a):
    """Elision-safe Dekker-style bf16 split: ``a ≈ f32(hi) + f32(lo)``."""
    hi = jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)
    return hi.astype(jnp.bfloat16), (a - hi).astype(jnp.bfloat16)


def _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref):
    tile_min = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
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


def _kernel_split3(
    x_ref, wth_ref, wtl_ref, wsq_ref, idx_ref, val_ref, best_ref, bestidx_ref
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    x = x_ref[:]  # (TN, D) f32
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = wth_ref[:]  # (D, TJ) bf16 (pre-split)
    wl = wtl_ref[:]
    cross = (
        jnp.dot(xh, wh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, wl, preferred_element_type=jnp.float32)
        + jnp.dot(xl, wh, preferred_element_type=jnp.float32)
    )
    d = -2.0 * cross + wsq_ref[:]
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref)


def _kernel_packed(
    a_ref, whwh_ref, wtl_ref, wsq_ref, idx_ref, val_ref, best_ref, bestidx_ref
):
    """Inputs pre-split in XLA: ``a = [xh | xl]`` (TN, 2D) bf16,
    ``whwh = [wh; wh]`` (2D, TJ) bf16, ``wtl`` (D, TJ) bf16. One K=2D
    matmul covers xh·wh + xl·wh; a K=D matmul adds xh·wl."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    a = a_ref[:]
    d_dim = a.shape[1] // 2
    xh = a[:, :d_dim]
    cross = jnp.dot(
        a, whwh_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(xh, wtl_ref[:], preferred_element_type=jnp.float32)
    d = -2.0 * cross + wsq_ref[:]
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref)


def _kernel_highest(
    x_ref, wt_ref, wsq_ref, idx_ref, val_ref, best_ref, bestidx_ref
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    cross = jnp.dot(
        x_ref[:],
        wt_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = -2.0 * cross + wsq_ref[:]
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref)


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


def _mode() -> str:
    """Resolved at trace time of the enclosing jit: later env changes in
    the same process do not retrace (documented in docs/API.md)."""
    m = os.environ.get("XPYSOM_BMU_PRECISION", "").lower()
    if m in ("highest", "split3", "packed"):
        return m
    if m:
        import warnings

        warnings.warn(
            f"XPYSOM_BMU_PRECISION={m!r} not recognized "
            "(expected packed|split3|highest); using 'packed'"
        )
    return "packed"


@partial(jax.jit, static_argnames=("interpret", "mode"))
def bmu_euclidean(x, w_flat, w_sq=None, *, interpret=False, mode=None):
    """Fused BMU search: returns ``(idx, minval)`` with shapes ``(N,)``
    int32 / ``(N,)`` float32, where ``idx[n] = argmin_j(-2 x_n·w_j + ‖w_j‖²)``
    and ``minval`` is that partial squared distance (add ``‖x‖²`` for the
    true squared distance).

    Inputs of any (N, D)/(XY, D) shape: samples are padded to the sample
    tile, codebook nodes to the lane tile with ``+inf`` ‖w‖² so padding can
    never win the argmin.
    """
    if mode is None:
        mode = _mode()
    n, d_dim = x.shape
    xy = w_flat.shape[0]
    if w_sq is None:
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
    w_sq = w_sq.reshape(1, xy)

    tn_max, tj_max = _tiles_for(d_dim)
    tn = min(tn_max, max(8, -(-n // 8) * 8))
    tj = min(tj_max, max(128, -(-xy // 128) * 128))
    n_pad = -(-n // tn) * tn
    xy_pad = -(-xy // tj) * tj

    x_p = _pad_to(x.astype(jnp.float32), n_pad, 0, 0.0)
    wt = _pad_to(w_flat.astype(jnp.float32).T, xy_pad, 1, 0.0)  # (D, XYp)
    wsq_p = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, jnp.inf)

    grid = (n_pad // tn, xy_pad // tj)
    common = dict(
        grid=grid,
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
    )
    x_spec = pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    wsq_spec = pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    if mode == "packed":
        xh, xl = _split_bf16(x_p)
        a = jnp.concatenate([xh, xl], axis=1)  # (Np, 2D) bf16
        wth, wtl = _split_bf16(wt)
        whwh = jnp.concatenate([wth, wth], axis=0)  # (2D, XYp) bf16
        a_spec = pl.BlockSpec(
            (tn, 2 * d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        w2_spec = pl.BlockSpec(
            (2 * d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
        idx, val = pl.pallas_call(
            _kernel_packed,
            in_specs=[a_spec, w2_spec, w_spec, wsq_spec],
            **common,
        )(a, whwh, wtl, wsq_p)
    elif mode == "split3":
        # NB: the obvious `wh = bf16(wt); wl = bf16(wt - f32(wh))` is UNSAFE
        # under XLA's --xla_allow_excess_precision (set by some platforms):
        # the f32->bf16->f32 round-trip is elided and wl folds to ZERO,
        # silently degrading the kernel to bf16 accuracy. reduce_precision
        # performs the rounding explicitly and cannot be elided.
        wth, wtl = _split_bf16(wt)
        idx, val = pl.pallas_call(
            _kernel_split3,
            in_specs=[x_spec, w_spec, w_spec, wsq_spec],
            **common,
        )(x_p, wth, wtl, wsq_p)
    else:
        idx, val = pl.pallas_call(
            _kernel_highest,
            in_specs=[x_spec, w_spec, wsq_spec],
            **common,
        )(x_p, wt, wsq_p)
    return idx[:n, 0], val[:n, 0]
