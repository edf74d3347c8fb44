"""Fused BMU + sufficient-statistics kernel (prototype, VERDICT r2 #4).

One Pallas kernel that performs the packed-mode euclidean BMU search
(identical math to ``bmu.bmu_euclidean(mode='packed')``: one augmented
K=3D+3 GEMM per (TN, TJ) tile, running (min, argmin) carry) AND, at each
sample tile's final codebook step — when that tile's winners are final —
scatters the masked augmented rows ``[x | 1]·m`` into an ``(XY, D+1)``
f32 accumulator held as a VMEM-resident revisited output block.

Why this might have beaten the shipped XLA scatter-add (3.2 ms/epoch on
the flagship, BASELINE.md round 3): the standalone Mosaic scatter kernel
lost in-context (7.8 ms/epoch) because its serial row loop is an opaque
barrier between BMU dispatches; HERE the loop runs inside the BMU
kernel's own grid, where Mosaic's step pipelining could in principle
overlap it with the next sample tile's MXU work.

ANSWER (measured on-chip, one-window slope anatomy,
tools/r3_epoch_anatomy.py / r3_results.jsonl): **NEGATIVE, decisively.**
The fused stats stage costs 57.9 ms/epoch at (1024, 512) tiles and
55.2 at (1024, 1024) vs 34.6 for BMU + XLA scatter in the same window —
the serial RMW loop does NOT pipeline under the MXU; it serializes the
final grid step of every sample tile AND the VMEM-resident accumulator
block degrades the rest of the pipeline. This closes VERDICT r2 #4 with
a measurement: the XLA scatter-add stays the shipped path, and the
epoch's ~10% non-kernel floor is the real cost of an exact scatter on
this hardware generation. The kernel is kept (correctness-pinned in
interpreter mode, tests/test_fused_stats.py) as the measured artifact —
it is NOT dispatched by any model path.

VMEM budget: acc (XY, D+1)→lane-padded (XY, 128) f32 + the (TN, TJ)
distance tile + operands. At the 128×128×64 flagship with (1024, 512)
tiles: 8.4 + 2 + ~1.5 MB ≈ 12 MB — inside the ~16 MB Mosaic scoped
ceiling. ``fits_budget`` gates dispatch.

Parity contract: winners identical to ``bmu_euclidean(mode='packed')``
(same operands, same finish); (S, cnt) identical to the XLA
``zeros.at[idx].add([x|1]·m)`` up to f32 add order (row-serial here,
like ops/pallas/stats.py — pinned bit-identical on-chip there).
Reference hot path: xpysom.py:410-417 (search) + :436-440 (update).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bmu import _split_bf16, _split3_bf16, _pad_to

__all__ = ["bmu_stats_fused", "fits_budget"]

_BIG_I32 = np.int32(2**31 - 1)

# (TN, TJ) for this kernel: TJ=512 halves the d-tile VMEM so the
# accumulator block fits next to it (see module docstring).
_TN = 1024
_TJ = 512

_BUDGET = 15 * 1024 * 1024


def fits_budget(xy: int, d_dim: int) -> bool:
    """acc (lane-padded to 128) + d tile + operands inside the Mosaic
    scoped-VMEM ceiling."""
    acc = xy * max(128, -(-(d_dim + 1) // 128) * 128) * 4
    dtile = _TN * _TJ * 4
    operands = _TN * (3 * d_dim + 3) * 2 * 2 + _TN * (d_dim + 1) * 4 * 2
    return acc + dtile + operands <= _BUDGET


def _kernel(
    a_ref,      # (TN, K) bf16 packed left operand
    w_ref,      # (K, TJ) bf16 packed right operand
    x_ref,      # (TN, D) f32 raw samples
    m_ref,      # (TN, 1) f32 validity mask
    idx_ref,    # out: (TN, 1) int32 winners
    acc_ref,    # out: (XY_pad, D+1) f32 accumulator (revisited block)
    best_ref,   # scratch (TN, 1) f32
    bestidx_ref,  # scratch (TN, 1) int32
    aug_ref,    # scratch (TN, D+1) f32 staged augmented rows
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    d = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    tile_min = jnp.min(d, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tile_arg = (
        jnp.min(jnp.where(d == tile_min, lane, _BIG_I32), axis=1, keepdims=True)
        + j * d.shape[1]
    )
    better = tile_min < best_ref[:]
    best_ref[:] = jnp.where(better, tile_min, best_ref[:])
    bestidx_ref[:] = jnp.where(better, tile_arg, bestidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = bestidx_ref[:]
        tn = x_ref.shape[0]
        aug_ref[:] = (
            jnp.concatenate(
                [x_ref[:], jnp.ones((tn, 1), jnp.float32)], axis=1
            )
            * m_ref[:]
        )

        def body(s, _):
            row = bestidx_ref[s, 0]
            acc_ref[pl.ds(row, 1), :] = (
                acc_ref[pl.ds(row, 1), :] + aug_ref[pl.ds(s, 1), :]
            )
            return 0

        jax.lax.fori_loop(0, tn, body, 0, unroll=False)


@partial(jax.jit, static_argnames=("interpret", "tiles"))
def bmu_stats_fused(x, w_flat, mask, *, interpret=False, tiles=None):
    """Packed-exact BMU winners AND per-BMU sufficient statistics of one
    chunk in one kernel. Returns ``(idx (N,) int32, acc (XY, D+1) f32)``
    with ``acc = [S | cnt]``. Masked rows contribute nothing (their
    winner index is still computed and returned).

    Centering is the caller's business (core passes the codebook mean to
    bmu_euclidean; here the prototype keeps the uncentered packed form —
    the 3-term split is exact either way for the argmin comparison on
    same-magnitude operands, and the anatomy probe compares like with
    like)."""
    n, d_dim = x.shape
    xy = w_flat.shape[0]
    w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True).reshape(1, xy)

    tn_max, tj_max = tiles if tiles is not None else (_TN, _TJ)
    tn = min(tn_max, max(8, -(-n // 8) * 8))
    tj = min(tj_max, max(128, -(-xy // 128) * 128))
    n_pad = -(-n // tn) * tn
    xy_pad = -(-xy // tj) * tj

    x_p = _pad_to(x.astype(jnp.float32), n_pad, 0, 0.0)
    m_p = _pad_to(mask.astype(jnp.float32).reshape(-1, 1), n_pad, 0, 0.0)
    wt = _pad_to(w_flat.astype(jnp.float32).T, xy_pad, 1, 0.0)
    wsq_big = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, 1e38)

    s1, s2, s3 = _split3_bf16(wsq_big)
    w2t = -2.0 * wt
    xh, xl = _split_bf16(x_p)
    wh, wl = _split_bf16(w2t)
    ones = jnp.ones((n_pad, 3), jnp.bfloat16)
    a = jnp.concatenate([xh, xl, xh, ones], axis=1)
    w_aug = jnp.concatenate([wh, wh, wl, s1, s2, s3], axis=0)
    k_aug = -(-a.shape[1] // 16) * 16
    a = _pad_to(a, k_aug, 1, 0)
    w_aug = _pad_to(w_aug, k_aug, 0, 0)

    grid = (n_pad // tn, xy_pad // tj)
    idx_p, acc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, k_aug), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_aug, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (xy_pad, d_dim + 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((xy_pad, d_dim + 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.int32),
            pltpu.VMEM((tn, d_dim + 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(a, w_aug, x_p, m_p)
    return idx_p[:n, 0], acc[:xy, :]
