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

Architecture (round 2, measurement-driven): every extra full pass over
the (TN, TJ) distance tile costs real time — at the flagship shape
(2^19×16384×64) a dot-only probe ran 10.3 ms and each additional
elementwise pass ~10 ms. (Round-3 correction: with the single-GEMM
form shipped, the packed kernel is MXU-bound at D=64 — the clean
packed−bf16 gap equals the GEMM-size delta at ~87% of the FLOP floor,
BASELINE.md round 3 — so the bandwidth argument justifies the fused
design, not the current bottleneck.) Two consequences:

- **Everything arithmetic is folded into ONE augmented GEMM.** The right
  operand stacks bf16 splits of ``-2·wᵀ`` with an *exact* 3-term bf16
  split of ``‖w‖²`` (8+8+8 mantissa bits = f32); the left appends
  matching ones-columns. The MXU then emits the partial distance
  ``d = -2 x·w + ‖w‖²`` directly and the VPU only reduces — the old
  ``-2*cross + wsq`` elementwise passes are gone.
- **The finish is the minimum-pass reduction**: per codebook tile one
  min-reduce + one fused masked-iota reduce, carrying (min, argmin) in
  (TN, 1) scratch. Clean batched-median comparison (BASELINE.md): this
  form 40.5/26.4 ms (packed/bf16) vs 42.2/29.0 for the variadic
  min-with-index reduce, 5-6 ms over the no-argmin floor — the inherent
  price of an exact first-index argmin.

Precision: the argmin is sensitive to the TPU's bf16 matmul default (~2%
flipped winners at fp32-data magnitudes), but full ``Precision.HIGHEST``
costs 6 MXU passes. The default ``packed`` mode uses a **3-term bf16
split** (``x·w ≈ xh·wh + xl·wh + xh·wl``, dropped ``xl·wl`` is O(2⁻²²)
relative) laid out as ``[xh|xl|xh|1,1,1] @ [wh;wh;wl;‖w‖²-splits]`` —
one K≈3D+3 GEMM; measured zero argmin disagreements vs float64.
``bf16`` mode is the single-pass throughput option (~1.6× faster,
~1.5–2% flipped winners; ``‖w‖²`` still exact). Splits are computed
with ``jax.lax.reduce_precision`` — the naive ``bf16(x - f32(bf16(x)))``
is silently elided to zero under XLA's ``--xla_allow_excess_precision``.
``XPYSOM_BMU_PRECISION`` selects ``packed`` (default) / ``bf16`` /
``split2`` / ``split3`` (pre-split operands, 3 separate dots) /
``highest`` (exact 6-pass f32). All splits happen OUTSIDE the kernels —
Mosaic's lowering does not implement ``reduce_precision``, and the astype
round-trip spelling is elision-prone in the interpret path. split3's
three separate f32 dot results sum in a different order than packed's
single K-chain accumulation, so it can flip float64-near-tie BMUs
(measured round 4: 1/16384 on a 1.6e-5 gap); ``packed`` is the
measured-zero-flips default.

``split2`` (round 5, VERDICT r4 #2) is the K=2D+3 midpoint between
packed and bf16: ``[xh|xl] @ [wh;wh]`` = ``x̃·wh`` where ``x̃ = xh+xl``
keeps 16 of x's 24 mantissa bits (a 2-term Dekker split — relative
truncation ≤ ~2⁻¹⁷), paired with an exact 3-term split of ``‖w_h‖²``
computed from the ROUNDED codebook. The result is the exact-to-f32-
accumulation partial distance between the 16-bit-truncated sample and
the bf16-quantized codebook ``w_h`` — a perturbed *problem* solved
(near-)exactly, not the true problem evaluated noisily. Its winner-flip
error has two terms: the dominant second-order ``2(x − w_j)·(w_j −
w_h,j)`` from codebook rounding, plus a first-order-but-2⁻¹⁷-scale
``2(x − x̃)·w_h`` from the sample truncation — both far inside bf16's
first-order ``~2⁻⁸·Σ|x||2w|`` envelope. The returned ``minval`` is the
distance to the rounded codebook.

``dtile`` (round 3): the kernel is bound on VMEM traffic over the
(TN, TJ) distance tile (1 write + ~2.6 reads of 4·TN·TJ bytes);
``dtile='bf16'`` stores that tile in bf16 — the MXU still accumulates
in f32 (Mosaic requires a 32-bit matmul acc), the cast rides the
accumulator output — halving the bound. Valid for the ``bf16`` and
``margin`` modes; ``margin``'s rescue gate widens by the storage-
rounding term (±u·|d|, |d| ≤ S + max‖w‖²) so its exact-argmin contract
is preserved (tests_tpu pins it on-chip).

Tie-breaking matches NumPy argmin (first index wins): within a tile the
first-minimum lane is selected via an iota trick, across tiles a strict
``<`` keeps the earlier tile's winner.

The other activations ride the same machinery (round-2 late):
``bmu_cosine`` feeds the GEMM kernel the normalized codebook with a zero
``‖w‖²`` operand (11.8× over the XLA formulation, BASELINE.md),
``bmu_norm_p_even`` feeds it binomial feature expansions (centered,
'highest' default — the expansion cancels), and ``bmu_manhattan`` folds
the unrolled L1 tile into the shared running-(min, argmin) finish.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.envflags import env_flag

# single source of truth with the dispatch gate (core._pallas_bmu_kind):
# sharing the constant means the gate's routing bound and the kernels'
# own guard cannot drift (review, round 5). core never imports this
# module at top level, so the import is cycle-free.
from ...core import _ELEMENTWISE_UNROLL_BUDGET as ELEMENTWISE_UNROLL_BUDGET

# Re-measurement hook (VERDICT r2 #5, measured NEUTRAL round 3 — see the
# dimension_semantics note in bmu_euclidean): read ONCE at import so the
# hook stays usable for per-process experiments (tools/r3_dimsem.py sets
# the env before interpreter start) without a trace-time env read.
_DIMSEM = env_flag("XPYSOM_BMU_DIMSEM")

# dtile='bf16' crashes the v5e Mosaic remote compiler at EVERY shape
# (casting the matmul accumulator tile to bf16; BASELINE.md round 3,
# TPU_TESTS_r03.json "compile-crash") — the compiled path is gated off
# so the public kernel API cannot reach a guaranteed backend crash.
# Import-time opt-in to re-attempt on newer toolchains; interpret mode
# always works (the lowering's fidelity is pinned by tests/test_margin_bmu).
_DTILE_BF16_OPTIN = env_flag("XPYSOM_DTILE_BF16")

__all__ = [
    "bmu_euclidean",
    "bmu_cosine",
    "bmu_manhattan",
    "bmu_norm_p_even",
    "bmu_norm_p_odd",
    "bmu_norm_p_frac",
    "supported",
]

_BIG_I32 = np.int32(2**31 - 1)

# Base tile sizes: TN samples × TJ codebook nodes per VMEM-resident
# distance tile; see _tiles_for for the measured defaults per feature
# width.
_TN = 1024
_TJ = 1024


def _tiles_for(d_dim: int):
    """Shrink the sample/lane tiles as the feature width grows so the
    per-step VMEM footprint (inputs ~4·T·D bytes + ~24·TN·TJ distance/
    reduction-temp bytes) stays well inside the raised VMEM limit.

    Defaults re-tuned late round 2 with dispatch-amortized batched
    medians (autotune_bmu_tiles inner mode — earlier per-dispatch tile
    rankings, including a retracted 3× (1024, 1024) penalty, were relay
    measurement contamination; see BASELINE.md round-2 addendum):
    (1024, 1024) wins at D=64 (1.49 vs 1.60 ms/exec at the in-epoch
    chunk shape; +1.9% end-to-end on bench.py), D=512 (10.09 vs 10.56
    at 65536×4096) and D=1024 (9.95 vs 10.28 at 32768×4096);
    (256, 2048) wins at D=2048 (7.30 vs 7.65 at 16384×2048). Spreads
    across sane tiles are only ±5-10% — re-tune per deployment with
    ``autotune_bmu_tiles(inner=32)`` when it matters."""
    if d_dim <= 1024:
        return _TN, _TJ  # (1024, 1024)
    return 256, 2048


def _split_bf16(a):
    """Elision-safe Dekker-style bf16 split: ``a ≈ f32(hi) + f32(lo)``."""
    hi = jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)
    return hi.astype(jnp.bfloat16), (a - hi).astype(jnp.bfloat16)


def _split3_bf16(a):
    """Exact 3-term bf16 split of f32: ``a == f32(h)+f32(m)+f32(l)`` —
    8+8+8 mantissa bits cover f32's 24 (each residual is exactly
    representable, standard Dekker chain via reduce_precision)."""
    h = jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)
    r = a - h
    m = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
    l = r - m
    return h.astype(jnp.bfloat16), m.astype(jnp.bfloat16), l.astype(jnp.bfloat16)


def _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant="iota"):
    if variant == "argmin":
        # single variadic min-with-index reduce (what jnp.argmin lowers to)
        tile_min = jnp.min(d, axis=1, keepdims=True)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
    elif variant == "minonly":
        # measurement floor only (argmin output is WRONG): one read pass
        tile_min = jnp.min(d, axis=1, keepdims=True)
        tile_arg = jnp.zeros((d.shape[0], 1), jnp.int32)
    else:  # "iota" (shipped): min-reduce + fused masked-iota reduce
        tile_min = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tile_arg = jnp.min(
            jnp.where(d == tile_min, lane, _BIG_I32), axis=1, keepdims=True
        )
    tile_arg = tile_arg + j * d.shape[1]
    # reduces ran on d's native dtype (bf16 when dtile='bf16' — that is
    # where the traffic saving lives); the (TN, 1) carry stays f32
    tile_min = tile_min.astype(jnp.float32)

    better = tile_min < best_ref[:]
    best_ref[:] = jnp.where(better, tile_min, best_ref[:])
    bestidx_ref[:] = jnp.where(better, tile_arg, bestidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = bestidx_ref[:]
        val_ref[:] = best_ref[:]


def _kernel_split3(
    xh_ref,
    xl_ref,
    wth_ref,
    wtl_ref,
    wsq_ref,
    idx_ref,
    val_ref,
    best_ref,
    bestidx_ref,
    *,
    variant="iota",
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    # x arrives PRE-SPLIT (two bf16 operands — same HBM bytes as one
    # f32). In-kernel splitting has no safe spelling across lowerings:
    # lax.reduce_precision is NotImplementedError in the Mosaic
    # lowering (TPU_TESTS_r04 first capture), and the naive
    # ``bf16(x - f32(bf16(x)))`` folds xl to ZERO in interpret mode
    # under --xla_allow_excess_precision (module docstring). The split
    # therefore happens once at the call site via _split_bf16, and both
    # lowerings consume identical operands.
    xh = xh_ref[:]  # (TN, D) bf16
    xl = xl_ref[:]
    wh = wth_ref[:]  # (D, TJ) bf16 (pre-split)
    wl = wtl_ref[:]
    cross = (
        jnp.dot(xh, wh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, wl, preferred_element_type=jnp.float32)
        + jnp.dot(xl, wh, preferred_element_type=jnp.float32)
    )
    d = -2.0 * cross + wsq_ref[:]
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant)


def _kernel_gemm_argmin(
    a_ref,
    w_ref,
    idx_ref,
    val_ref,
    best_ref,
    bestidx_ref,
    *,
    variant="iota",
    dtile=jnp.float32,
):
    """One augmented GEMM per step: the distance ``d = -2 x·w + ‖w‖²``
    comes straight off the MXU (``-2w`` and an exact 3-term bf16 split of
    ``‖w‖²`` are folded into the right operand; the matching ones-columns
    into the left), so the VPU does ZERO distance arithmetic — it only
    reduces. The kernel is VMEM-bandwidth-bound on reads of the d tile
    (measured: each full pass over d costs ~10 ms at the flagship shape,
    vs a 10.3 ms dot-only floor), so the finish is the minimum-pass
    form: one min-reduce + one fused masked-iota reduce per step, with a
    (TN, 1) running (min, argmin) carry. A lane-wise running-min variant
    (3 elementwise passes/step) measured 29.0 ms vs 26.0 ms for this."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    # Mosaic requires a 32-bit matmul accumulator; the cast to a bf16
    # d tile (dtile experiment) happens on the accumulator output, so
    # the reduces consume half-width data
    d = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if dtile != jnp.float32:
        d = d.astype(dtile)
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant)


def _kernel_gemm_argmin_kb(
    a_ref,
    w_ref,
    idx_ref,
    val_ref,
    d_acc_ref,
    best_ref,
    bestidx_ref,
    *,
    variant="iota",
    dtile=jnp.float32,
):
    """K-BLOCKED augmented-GEMM argmin (round-4 wide-D candidate, opt-in
    via ``bmu_euclidean(kblock=)``): grid ``(i, j, k)`` accumulates
    partial dots over K tiles into an f32 VMEM scratch and runs the
    shared running-argmin finish on the last K step. Rationale: at wide
    D the full-K operand tiles of the 2-D kernel reach ~10 MB/step
    (packed D=512: K=1552), which can defeat Mosaic's double-buffering
    inside the scoped-VMEM budget; K-blocking shrinks the per-step
    working set so the pipeline can overlap loads with MXU work. Whether
    that wins in practice is measured on-chip (tools/r4_kblock.py) —
    this is a CANDIDATE, not a default (round-3 lesson: rank variants
    in context before claiming)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when((j == 0) & (k == 0))
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    @pl.when(k == 0)
    def _():
        d_acc_ref[:] = jnp.zeros_like(d_acc_ref)

    d_acc_ref[:] += jnp.dot(
        a_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        d = d_acc_ref[:]
        if dtile != jnp.float32:
            d = d.astype(dtile)
        _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant)


def _kernel_gemm_top2(
    a_ref,
    w_ref,
    *refs,
    dtile=jnp.float32,
    want_idx2=True,
):
    """Augmented-GEMM kernel (one MXU pass over whatever operand packing
    the caller prepared — bf16 single-pass for ``mode='margin'``, the
    exact packed split for ``top2=True``) whose finish carries the
    second-best distance — and, with ``want_idx2=True``, its index. The
    margin ``val2 − val`` gates the exact re-rank in ``mode='margin'``;
    ``idx2`` is what ``topographic_error``'s top-2 BMU search consumes
    (top2=True in bmu_euclidean). ``want_idx2=False`` (the margin path —
    ``_margin_rescue`` discards idx2) drops the bestidx2 VMEM carry, its
    output, and the index halves of the two pick chains (advisor, round
    4: margin's training hot path should not pay for top2's index).
    Top-2 merge across tiles: ``m2' = min(m2, t2, max(m1, t1))`` with
    value-then-lowest-index ordering, so the result matches a stable
    argsort's first two columns; within a tile the second-best excludes
    the first winning LANE (not the winning value), so a duplicate
    minimum IS the second-best (margin 0, always re-ranked; idx2 = the
    duplicate's index, as argsort gives)."""
    if want_idx2:
        (idx_ref, val_ref, val2_ref, idx2_ref,
         best_ref, bestidx_ref, best2_ref, bestidx2_ref) = refs
    else:
        idx_ref, val_ref, val2_ref, best_ref, bestidx_ref, best2_ref = refs
        idx2_ref = bestidx2_ref = None
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)
        best2_ref[:] = jnp.full_like(best2_ref, jnp.inf)
        if want_idx2:
            bestidx2_ref[:] = jnp.full_like(bestidx2_ref, _BIG_I32)

    d = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if dtile != jnp.float32:
        d = d.astype(dtile)
    tile_min = jnp.min(d, axis=1, keepdims=True)  # (TN, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tile_lane = jnp.min(
        jnp.where(d == tile_min, lane, _BIG_I32), axis=1, keepdims=True
    )
    # second-best within the tile: mask out only the winning lane, so an
    # equal-valued duplicate lane keeps tile_min2 == tile_min (margin 0)
    masked = jnp.where(lane == tile_lane, jnp.asarray(jnp.inf, d.dtype), d)
    tile_min2 = jnp.min(masked, axis=1, keepdims=True)
    tile_arg = tile_lane + j * d.shape[1]
    # reduces consumed the (possibly bf16) d tile; carries stay f32
    tile_min = tile_min.astype(jnp.float32)
    tile_min2 = tile_min2.astype(jnp.float32)

    better = tile_min < best_ref[:]
    # the loser of the min contest is a second-best candidate
    cand2 = jnp.where(better, best_ref[:], tile_min)

    if want_idx2:
        tile_arg2 = (
            jnp.min(
                jnp.where(masked == tile_min2, lane, _BIG_I32),
                axis=1,
                keepdims=True,
            )
            + j * d.shape[1]
        )
        cand2i = jnp.where(better, bestidx_ref[:], tile_arg)

        def pick(va, ia, vb, ib):
            # value-then-lowest-index: exactly a stable argsort's ordering
            a_wins = (va < vb) | ((va == vb) & (ia < ib))
            return jnp.where(a_wins, va, vb), jnp.where(a_wins, ia, ib)

        v2, i2 = pick(best2_ref[:], bestidx2_ref[:], tile_min2, tile_arg2)
        v2, i2 = pick(v2, i2, cand2, cand2i)
        best2_ref[:] = v2
        bestidx2_ref[:] = i2
    else:
        # margin only needs the second-best VALUE: a plain 3-way min
        best2_ref[:] = jnp.minimum(
            best2_ref[:], jnp.minimum(tile_min2, cand2)
        )
    best_ref[:] = jnp.where(better, tile_min, best_ref[:])
    bestidx_ref[:] = jnp.where(better, tile_arg, bestidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = bestidx_ref[:]
        val_ref[:] = best_ref[:]
        val2_ref[:] = best2_ref[:]
        if want_idx2:
            idx2_ref[:] = bestidx2_ref[:]


def _kernel_highest(
    x_ref, wt_ref, wsq_ref, idx_ref, val_ref, best_ref, bestidx_ref, *, variant="iota"
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
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant)


# Margin-gated rescue bound (mode='margin'): the bf16 pass's distance
# error is ≤ (2u + u² + Kε_f32)·Σ_d|x_d||2w_d| with u = 2⁻⁸ (bf16 unit
# roundoff; the ‖w‖² operand is an exact 3-term split, so only the cross
# term errs). A winner flip needs err(winner) + err(runner-up) ≥ margin,
# so rows with margin ≤ 2·2.1u·S are ambiguous; 6u (≈1.4× slack) is the
# shipped gate. Validated against float64 on-chip (tests_tpu).
_MARGIN_BOUND = 6.0 * 2.0**-8
# With dtile='bf16' the stored distance adds a rounding error ≤ u·|d|
# with |d| ≤ S + max_j‖w_j‖², so the pairwise gate widens to
# 2·(2.1u·S + u·(S + w2max)) = 6.2u·S + 2u·w2max; shipped with ~1.3×
# slack as 8u·S + 3u·w2max.
_MARGIN_BOUND_DTILE = 8.0 * 2.0**-8
_MARGIN_BOUND_W2 = 3.0 * 2.0**-8


def _margin_rescue(
    idx_v,
    val_v,
    val2_v,
    x_p,
    w_flat,
    w_sq,
    w2t,
    n,
    tiles,
    interpret,
    rescue_frac,
    dtile_bf16=False,
):
    """Exact re-rank of the bf16 top-2 pass's ambiguous rows.

    Rows whose margin ``val2 − val`` falls inside the bf16 error bound
    are compacted (cumsum positions — no sort) into a STATIC-capacity
    buffer (``rescue_frac`` of the padded rows) and re-ranked by the
    packed (measured-exact) kernel against the full codebook; should the
    buffer ever overflow, a ``lax.cond`` falls back to the packed kernel
    on ALL rows — exactness is unconditional, the capacity only bounds
    the fast path. The returned ``val`` is recomputed exactly in f32 for
    EVERY row (one O(N·D) gather+dot), so per-shard minima stay
    comparable in grid-mesh pmin merges (parallel/grid_sharded.py)."""
    n_pad = x_p.shape[0]
    xy = w_flat.shape[0]
    # per-row error envelope S = Σ_d |x_d| · max_j |2w_dj|
    wmax2 = jnp.max(jnp.abs(w2t), axis=1)  # (D,)
    s_row = jnp.abs(x_p) @ wmax2  # (n_pad,)
    if dtile_bf16:
        eps = _MARGIN_BOUND_DTILE * s_row + _MARGIN_BOUND_W2 * jnp.max(w_sq)
    else:
        eps = _MARGIN_BOUND * s_row
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    suspect = (val2_v - val_v <= eps) & (rows < n)
    cnt = jnp.sum(suspect.astype(jnp.int32))

    k_cap = min(n_pad, max(8, -(-int(n_pad * rescue_frac) // 8) * 8))
    pos = jnp.cumsum(suspect.astype(jnp.int32)) - 1
    dest = jnp.where(suspect & (pos < k_cap), pos, k_cap)
    # Unused buffer slots point at the out-of-range dump index n_pad, so
    # the patch scatter DROPS them. (A zero-filled buffer here was a real
    # bug caught by an on-chip train-divergence probe: tail slots issued
    # duplicate writes of the STALE bf16 winner to row 0, clobbering its
    # rescue whenever row 0 was itself a suspect — duplicate-index
    # scatter order is unspecified, and on TPU the stale write won.)
    buf = jnp.full((k_cap,), n_pad, jnp.int32).at[dest].set(rows, mode="drop")
    # gather clamps buf's dump index to the last row — harmless: its
    # re-rank result is dropped by the same out-of-range patch write
    idx_sus, _ = bmu_euclidean(
        x_p[jnp.minimum(buf, n_pad - 1)], w_flat, w_sq.reshape(xy, 1),
        interpret=interpret, mode="packed", tiles=tiles,
    )
    patched = idx_v.at[buf].set(idx_sus, mode="drop")

    def _full_packed():
        fi, _ = bmu_euclidean(
            x_p, w_flat, w_sq.reshape(xy, 1),
            interpret=interpret, mode="packed", tiles=tiles,
        )
        return fi

    idx_final = jax.lax.cond(cnt > k_cap, _full_packed, lambda: patched)
    # exact f32 winner value (the kernel's val is bf16-pass accuracy)
    w_sel = w_flat[idx_final]
    val_exact = -2.0 * jnp.sum(x_p * w_sel, axis=1) + w_sq.reshape(-1)[idx_final]
    return idx_final[:n], val_exact[:n]


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


def _env_mode(default="packed") -> str:
    """EAGER env resolution of ``XPYSOM_BMU_PRECISION`` — called from the
    one documented config boundary (``SomSpec.__post_init__`` / XPySom
    construction, docs/API.md "Kernel configuration"), never at trace
    time. An unrecognized env value warns and falls back to ``default``
    (a stale env var set for an unrelated experiment must not break
    every constructor call in the process — explicit kwargs, by
    contrast, raise ValueError in the XPySom constructor)."""
    m = os.environ.get("XPYSOM_BMU_PRECISION", "").lower()
    if m in ("highest", "split2", "split3", "packed", "bf16", "margin"):
        return m
    if m:
        import warnings

        warnings.warn(
            f"XPYSOM_BMU_PRECISION={m!r} not recognized "
            f"(expected packed|split2|split3|highest|bf16|margin); "
            f"using {default!r}"
        )
    return default


def _env_tiles():
    """EAGER env resolution of the optional ``XPYSOM_BMU_TILES=TNxTJ``
    override — read at spec construction (``SomSpec.__post_init__`` /
    XPySom construction), the one documented config boundary. The
    kernels themselves never read env: ``tiles=None`` means the measured
    per-width default table (``_tiles_for``)."""
    s = os.environ.get("XPYSOM_BMU_TILES", "")
    if not s:
        return None
    try:
        tn, tj = (int(v) for v in s.lower().split("x"))
        if tn <= 0 or tj <= 0 or tn % 8 or tj % 128:
            raise ValueError
        return tn, tj
    except ValueError:
        import warnings

        warnings.warn(
            f"XPYSOM_BMU_TILES={s!r} invalid (expected e.g. '1024x2048', "
            "TN a multiple of 8, TJ of 128); using measured defaults"
        )
        return None


@partial(
    jax.jit,
    static_argnames=(
        "interpret", "mode", "tiles", "finish", "rescue_frac", "dtile",
        "kblock", "top2", "w_sq_raw",
    ),
)
def bmu_euclidean(
    x,
    w_flat,
    w_sq=None,
    *,
    interpret=False,
    mode=None,
    tiles=None,
    center=None,
    finish="iota",
    rescue_frac=0.125,
    dtile="f32",
    kblock=None,
    top2=False,
    w_sq_raw=False,
):
    """Fused BMU search: returns ``(idx, minval)`` with shapes ``(N,)``
    int32 / ``(N,)`` float32, where ``idx[n] = argmin_j(-2 x_n·w_j + ‖w_j‖²)``
    and ``minval`` is that partial squared distance (add ``‖x‖²`` for the
    true squared distance).

    ``top2=True`` (modes 'packed'/'bf16') returns ``(idx, minval, idx2,
    minval2)`` — the two best-matching units per sample with
    stable-argsort ordering (value, then lowest index), the fused form
    of the reference's ``argsort(d)[:, :2]`` in ``topographic_error``
    (xpysom.py:731-734): the (N, XY) distance matrix never leaves VMEM.

    ``finish`` selects the in-kernel reduction strategy (all modes):
    ``'iota'`` (default, fastest measured), ``'argmin'`` (the variadic
    min-with-index form, for benchmarking), and ``'minonly'`` — a
    BENCHMARK-ONLY floor probe whose idx output is MEANINGLESS (always
    the first lane of the winning tile); never use it for real searches.

    Inputs of any (N, D)/(XY, D) shape: samples are padded to the sample
    tile, codebook nodes to the lane tile with ``+inf`` ‖w‖² so padding can
    never win the argmin. ``tiles=(TN, TJ)`` overrides the measured
    defaults (benchmark/auto-tune hook).

    ``center``: optional (D,) translation subtracted from both operands.
    ``‖x−w‖`` is translation-invariant, but the bf16-split modes' error is
    ~2⁻¹⁷·Σ_d|x_d||2w_d| — ABSOLUTE in the operand magnitudes — so
    centering by (roughly) the codebook mean shrinks the error floor by
    the square of the magnitude reduction for offset data (e.g. trained
    codebooks over non-origin-centered features). Pass the SAME center on
    every shard when winners are compared across shards (the minval
    output shifts by ``2x·c − ‖c‖²+…``, identically for all w).

    ``w_sq_raw=True`` declares that ``w_sq`` carries caller-defined
    semantics rather than the euclidean ``Σw²`` of ``w_flat`` (the cosine
    and norm_p wrappers ride this kernel with a semantic-zero ``w_sq``).
    The 'split2' mode then splits the given operand exactly (like
    'packed') instead of substituting its self-consistent
    rounded-codebook norm ``¼·Σ(w_h)²`` — which is only a valid
    replacement when ``w_sq`` IS the euclidean norm.
    """
    if mode is None:
        mode = "packed"  # kernel default; env resolves at spec construction
    if mode not in ("packed", "bf16", "split2", "split3", "highest", "margin"):
        raise ValueError(
            f"mode={mode!r} not recognized "
            "(packed|bf16|split2|split3|highest|margin)"
        )
    if finish not in ("iota", "argmin", "minonly"):
        raise ValueError(
            f"finish={finish!r} not recognized (iota|argmin|minonly)"
        )
    if dtile not in ("f32", "bf16"):
        raise ValueError(f"dtile={dtile!r} not recognized (f32|bf16)")
    if dtile == "bf16" and not interpret and not _DTILE_BF16_OPTIN:
        raise NotImplementedError(
            "dtile='bf16' is gated off on the compiled path: it crashes "
            "the v5e Mosaic remote compiler at every shape (BASELINE.md "
            "round 3, TPU_TESTS_r03.json). Set XPYSOM_DTILE_BF16=1 before "
            "interpreter start to re-attempt on a newer toolchain; "
            "interpret=True always runs the lowering (fidelity tests)."
        )
    if dtile == "bf16" and mode not in ("bf16", "margin"):
        # packed/split3/highest exist to make the distance exact — a
        # rounded d tile would silently undo that
        raise ValueError("dtile='bf16' requires mode 'bf16' or 'margin'")
    if kblock is not None and mode not in ("packed", "bf16"):
        raise ValueError(
            "kblock (the K-blocked wide-D candidate) requires mode "
            "'packed' or 'bf16'"
        )
    if top2:
        if mode not in ("packed", "bf16"):
            raise ValueError("top2=True requires mode 'packed' or 'bf16'")
        if kblock is not None:
            raise ValueError("top2=True does not support kblock")
    dtile_t = jnp.bfloat16 if dtile == "bf16" else jnp.float32
    if center is not None:
        x = x - center[None, :]
        w_flat = w_flat - center[None, :]
        w_sq = None  # cache is for the uncentered codebook — recompute
    n, d_dim = x.shape
    xy = w_flat.shape[0]
    if w_sq is None:
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
    w_sq = w_sq.reshape(1, xy)

    tn_max, tj_max = tiles if tiles is not None else _tiles_for(d_dim)
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
    if not interpret:
        # dimension_semantics=("parallel","arbitrary"): RESOLVED round 3
        # (VERDICT r2 #5). The round-2 "3.5x slower" claim was relay
        # measurement contamination like the retracted tile claim —
        # slope-decontaminated re-measurement (tools/r3_results.jsonl,
        # BASELINE.md round 3) puts it NEUTRAL: packed 0.909 (on) vs
        # 0.949 (off) ms/exec at (16384,16384,64); 1.413 vs 1.306/1.384
        # at (16384,4096,512) — within cross-window noise both ways, no
        # free parallelism to claim. Default stays off; the env switch
        # remains for future re-measurement on other TPU generations.
        params = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if _DIMSEM:  # import-time constant, see module header
            params["dimension_semantics"] = ("parallel", "arbitrary")
        common["compiler_params"] = pltpu.CompilerParams(**params)
    x_spec = pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    wsq_spec = pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    if mode in ("packed", "bf16", "split2", "margin"):
        # Augmented-GEMM formulation (see _kernel_gemm_argmin): the right
        # operand stacks the (bf16-split) rows of -2·wᵀ with an EXACT
        # 3-term bf16 split of ‖w‖², the left appends matching ones, so
        # the MXU emits the partial distance directly. Codebook padding
        # carries ‖w‖² = 1e38 (a finite +inf stand-in: ±inf splits to NaN)
        # so padded nodes never win. 'margin' uses the bf16 single-pass
        # operands with the top-2 finish, then re-ranks ambiguous rows
        # exactly (_margin_rescue) — exact argmin near bf16 speed.
        w2t = -2.0 * wt
        ones = jnp.ones((n_pad, 3), jnp.bfloat16)
        if mode == "split2":
            # K=2D+3 midpoint (module docstring): partial distance from
            # the 16-bit-truncated sample x̃=xh+xl to the bf16-ROUNDED
            # codebook. [xh|xl]@[wh;wh] = x̃·w_h2t (x's low 8 mantissa
            # bits are dropped — ~2⁻¹⁷ relative), and the ‖w‖² operand is
            # recomputed from the ROUNDED codebook (w_h = -w2t_h/2 ⇒
            # ‖w_h‖² = ¼·Σ w2t_h²) so the distance is self-consistent in
            # w_h — flip error: second-order 2(x−w)·(w−w_h) + 2⁻¹⁷-scale
            # 2(x−x̃)·w_h, both far inside bf16's first-order |x||w|.
            wh, _ = _split_bf16(w2t)
            if w_sq_raw:
                # the caller's w_sq is NOT Σw² (cosine/norm_p semantics):
                # substituting the rounded-codebook norm would inject a
                # per-node bias — split the given operand exactly instead
                wsq_big = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, 1e38)
            else:
                wsq_h = 0.25 * jnp.sum(
                    jnp.square(wh.astype(jnp.float32)), axis=0, keepdims=True
                )
                # padded codebook columns are zero → ‖w_h‖² = 0 would WIN
                # the argmin for any x with x·w > 0; mask them to the
                # finite +inf
                col = jax.lax.broadcasted_iota(jnp.int32, wsq_h.shape, 1)
                wsq_big = jnp.where(col < xy, wsq_h, 1e38)
            s1, s2, s3 = _split3_bf16(wsq_big)
            xh, xl = _split_bf16(x_p)
            a = jnp.concatenate([xh, xl, ones], axis=1)
            w_aug = jnp.concatenate([wh, wh, s1, s2, s3], axis=0)
        elif mode == "packed":
            wsq_big = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, 1e38)
            s1, s2, s3 = _split3_bf16(wsq_big)
            xh, xl = _split_bf16(x_p)
            wh, wl = _split_bf16(w2t)
            a = jnp.concatenate([xh, xl, xh, ones], axis=1)
            w_aug = jnp.concatenate([wh, wh, wl, s1, s2, s3], axis=0)
        else:  # bf16/margin: single-pass x·w, exact ‖w‖²
            wsq_big = _pad_to(w_sq.astype(jnp.float32), xy_pad, 1, 1e38)
            s1, s2, s3 = _split3_bf16(wsq_big)
            a = jnp.concatenate([x_p.astype(jnp.bfloat16), ones], axis=1)
            w_aug = jnp.concatenate(
                [w2t.astype(jnp.bfloat16), s1, s2, s3], axis=0
            )
        k_aug = -(-a.shape[1] // 16) * 16  # bf16 sublane-tile multiple
        a = _pad_to(a, k_aug, 1, 0)
        w_aug = _pad_to(w_aug, k_aug, 0, 0)
        a_spec = pl.BlockSpec(
            (tn, k_aug), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        waug_spec = pl.BlockSpec(
            (k_aug, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
        if kblock is not None:
            # K-blocked wide-D candidate (see _kernel_gemm_argmin_kb):
            # 3-D grid accumulating partial dots over K tiles into a
            # (TN, TJ) f32 VMEM scratch. Opt-in measurement path.
            if kblock % 128 or kblock <= 0:
                raise ValueError(
                    f"kblock={kblock} must be a positive multiple of 128"
                )
            k_pad = -(-k_aug // kblock) * kblock
            a = _pad_to(a, k_pad, 1, 0)
            w_aug = _pad_to(w_aug, k_pad, 0, 0)
            common_kb = dict(common)
            common_kb["grid"] = (n_pad // tn, xy_pad // tj, k_pad // kblock)
            common_kb["out_specs"] = [
                pl.BlockSpec(
                    (tn, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tn, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
            common_kb["scratch_shapes"] = [
                pltpu.VMEM((tn, tj), jnp.float32),  # d accumulator
                pltpu.VMEM((tn, 1), jnp.float32),
                pltpu.VMEM((tn, 1), jnp.int32),
            ]
            if not interpret:
                params = dict(vmem_limit_bytes=100 * 1024 * 1024)
                if _DIMSEM:
                    params["dimension_semantics"] = (
                        "parallel", "arbitrary", "arbitrary",
                    )
                common_kb["compiler_params"] = pltpu.CompilerParams(**params)
            idx, val = pl.pallas_call(
                partial(_kernel_gemm_argmin_kb, variant=finish, dtile=dtile_t),
                in_specs=[
                    pl.BlockSpec(
                        (tn, kblock),
                        lambda i, j, k: (i, k),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (kblock, tj),
                        lambda i, j, k: (k, j),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                **common_kb,
            )(a, w_aug)
            return idx[:n, 0], val[:n, 0]
        if mode == "margin" or top2:
            out_spec = pl.BlockSpec(
                (tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
            common_m = dict(common)
            common_m["out_specs"] = [out_spec] * (4 if top2 else 3)
            common_m["out_shape"] = [
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            ] + ([jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)] if top2 else [])
            common_m["scratch_shapes"] = [
                pltpu.VMEM((tn, 1), jnp.float32),
                pltpu.VMEM((tn, 1), jnp.int32),
                pltpu.VMEM((tn, 1), jnp.float32),
            ] + ([pltpu.VMEM((tn, 1), jnp.int32)] if top2 else [])
            outs = pl.pallas_call(
                partial(_kernel_gemm_top2, dtile=dtile_t, want_idx2=top2),
                in_specs=[a_spec, waug_spec],
                **common_m,
            )(a, w_aug)
            if top2:
                idx_p, val_p, val2_p, idx2_p = outs
                return (
                    idx_p[:n, 0],
                    val_p[:n, 0],
                    idx2_p[:n, 0],
                    val2_p[:n, 0],
                )
            idx_p, val_p, val2_p = outs
            return _margin_rescue(
                idx_p[:, 0], val_p[:, 0], val2_p[:, 0],
                x_p, w_flat, w_sq, w2t, n, tiles, interpret, rescue_frac,
                dtile_bf16=(dtile == "bf16"),
            )
        idx, val = pl.pallas_call(
            partial(_kernel_gemm_argmin, variant=finish, dtile=dtile_t),
            in_specs=[a_spec, waug_spec],
            **common,
        )(a, w_aug)
    elif mode == "split3":
        # NB: the obvious `wh = bf16(wt); wl = bf16(wt - f32(wh))` is UNSAFE
        # under XLA's --xla_allow_excess_precision (set by some platforms):
        # the f32->bf16->f32 round-trip is elided and wl folds to ZERO,
        # silently degrading the kernel to bf16 accuracy. reduce_precision
        # performs the rounding explicitly and cannot be elided.
        wth, wtl = _split_bf16(wt)
        xh_p, xl_p = _split_bf16(x_p)
        idx, val = pl.pallas_call(
            partial(_kernel_split3, variant=finish),
            in_specs=[x_spec, x_spec, w_spec, w_spec, wsq_spec],
            **common,
        )(xh_p, xl_p, wth, wtl, wsq_p)
    else:
        idx, val = pl.pallas_call(
            partial(_kernel_highest, variant=finish),
            in_specs=[x_spec, w_spec, wsq_spec],
            **common,
        )(x_p, wt, wsq_p)
    return idx[:n, 0], val[:n, 0]


@partial(jax.jit, static_argnames=("interpret", "mode", "tiles"))
def bmu_cosine(x, w_flat, *, interpret=False, mode=None, tiles=None):
    """Fused BMU search under the COSINE activation (reference
    distances.py:45-59 + argmin): returns ``(idx, dist)`` where
    ``idx[n] = argmin_j (1 − x_n·w_j / (‖x_n‖‖w_j‖))`` and ``dist`` is
    that cosine distance.

    Rides the euclidean augmented-GEMM kernel unchanged: with the
    row-normalized codebook ``ŵ`` and a ZERO ``‖w‖²`` operand, the MXU
    emits ``−x·ŵ`` whose per-row argmin is exactly the cosine argmin
    (``‖x‖`` is a positive per-row constant; zero rows reproduce the
    reference's ``nan_to_num`` convention — all-equal distance 1). The
    min value is rescaled to the true cosine distance afterwards."""
    xy = w_flat.shape[0]
    w_norm = jnp.sqrt(jnp.sum(jnp.square(w_flat), axis=1, keepdims=True))
    w_hat = jnp.where(w_norm > 0, w_flat / jnp.where(w_norm > 0, w_norm, 1.0), 0.0)
    idx, negdot = bmu_euclidean(
        x,
        0.5 * w_hat,  # kernel computes −2·x·(ŵ/2) + 0 = −x·ŵ
        jnp.zeros((xy, 1), jnp.float32),
        interpret=interpret,
        mode=mode,
        tiles=tiles,
        w_sq_raw=True,  # the zero ‖w‖² is semantic — split2 must not
        # substitute the rounded-codebook norm (a per-node ~¼·(1±2⁻⁸) bias)
    )
    x_norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1))
    sim = jnp.nan_to_num(-negdot / x_norm)
    return idx, 1.0 - sim


def _elementwise_bmu_call(kernel_body, x, w_flat, tiles, interpret):
    """Shared launch wrapper for the elementwise (VPU-tile) BMU kernels
    (manhattan / odd-p / fractional-p): pad samples to the (TN multiple
    of 8) row tile with zeros, pad the transposed codebook to the (TJ
    multiple of 128) lane tile with +inf so padded nodes never win, run
    ``kernel_body`` over the 2-D (sample, codebook) grid with the shared
    running-(min, argmin) VMEM carries, and slice the winners back to the
    true sample count. One copy of the sizing so the three kernels cannot
    drift (the L1 tile default (512, 1024) is the round-3 measured
    optimum; the other two inherit its VMEM envelope)."""
    n, d_dim = x.shape
    xy = w_flat.shape[0]
    tn_max, tj_max = tiles if tiles is not None else (512, 1024)
    tn = min(tn_max, max(8, -(-n // 8) * 8))
    tj = min(tj_max, max(128, -(-xy // 128) * 128))
    n_pad = -(-n // tn) * tn
    xy_pad = -(-xy // tj) * tj

    x_p = _pad_to(x.astype(jnp.float32), n_pad, 0, 0.0)
    # pad codebook with +inf so the padded nodes' distances are inf
    wt = _pad_to(w_flat.astype(jnp.float32).T, xy_pad, 1, jnp.inf)

    common = dict(
        grid=(n_pad // tn, xy_pad // tj),
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
    if not interpret:
        common["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    idx, val = pl.pallas_call(
        kernel_body,
        in_specs=[
            pl.BlockSpec((tn, d_dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        **common,
    )(x_p, wt)
    return idx[:n, 0], val[:n, 0]


def _kernel_manhattan_argmin(
    x_ref,
    wt_ref,
    idx_ref,
    val_ref,
    best_ref,
    bestidx_ref,
    *,
    variant="iota",
    accum="serial",
):
    """L1-distance tile (static D unroll, layout-preserving VPU ops, as in
    manhattan.py) folded into the shared running (min, argmin) finish —
    the (N, XY) distance matrix never reaches HBM.

    ``accum`` selects the accumulation strategy (VERDICT r2 #6 probes —
    the kernel is VPU-bound, so both the op rate and the accumulator
    dependency chain are candidates for the limiter):
    'serial' — the shipped exact form, one f32 chain;
    'split2'/'split4' — k interleaved f32 accumulators merged at the end
    (breaks the add dependency chain for ILP; exact up to f32
    reassociation of non-negative terms);
    'bf16' — |x−w| computed in bf16 (operands pre-rounded), accumulated
    in f32: reduced-precision op stream, ~u(|x|+|w|) per-term error —
    an OPT-IN throughput mode with euclidean-bf16-like flip rates."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    x = x_ref[:]  # (TN, D)
    wt = wt_ref[:]  # (D, TJ)
    if accum == "bf16":
        xs, ws = x.astype(jnp.bfloat16), wt.astype(jnp.bfloat16)
        lanes = 4
    else:
        xs, ws = x, wt
        lanes = {"serial": 1, "split2": 2, "split4": 4}[accum]
    accs = [
        jnp.zeros((x.shape[0], wt.shape[1]), dtype=jnp.float32)
        for _ in range(lanes)
    ]
    for k in range(x.shape[1]):
        t = jnp.abs(xs[:, k : k + 1] - ws[k : k + 1, :])
        accs[k % lanes] = accs[k % lanes] + t  # bf16 t upcasts to f32
    d = accs[0]
    for a in accs[1:]:
        d = d + a
    _finish(j, nj, d, idx_ref, val_ref, best_ref, bestidx_ref, variant)


@partial(jax.jit, static_argnames=("interpret", "tiles", "accum"))
def bmu_manhattan(x, w_flat, *, interpret=False, tiles=None, accum="serial"):
    """Fused BMU search under the MANHATTAN activation: ``(idx, minval)``
    with ``idx[n] = argmin_j Σ_d |x_nd − w_jd|`` (exact f32 L1, NumPy
    first-index ties). Codebook padding rows are +inf so they never win.
    ``accum`` selects the accumulation strategy (serial | split2 |
    split4 | bf16 — see _kernel_manhattan_argmin; bf16 is the opt-in
    reduced-precision stream)."""
    if accum not in ("serial", "split2", "split4", "bf16"):
        raise ValueError(
            f"accum={accum!r} not recognized (serial|split2|split4|bf16)"
        )
    # tile default lives in _elementwise_bmu_call: (512, 1024) measured
    # 14.9 ms vs 15.9 for (256, 1024) at 16384x16384x64 (batched
    # medians; (512, 2048) ties at 14.8)
    return _elementwise_bmu_call(
        partial(_kernel_manhattan_argmin, accum=accum), x, w_flat, tiles,
        interpret,
    )


def _check_unroll_budget(d_dim: int, p_int: int):
    """Guard the elementwise L^p wrappers against a trace-time blowup:
    their kernel bodies unroll ~d·(p+1) vector ops per tile step (the D
    loop times the p-power multiply chain), so a huge static ``p`` would
    hang the remote Mosaic compile. Shares the dispatch gate's constant
    (imported from ``core._ELEMENTWISE_UNROLL_BUDGET``) so the gate and
    the kernels cannot drift: dispatched calls never trip this — it
    exists for direct kernel callers (review, round 5)."""
    if d_dim * (p_int + 1) > ELEMENTWISE_UNROLL_BUDGET:
        raise ValueError(
            f"d={d_dim}, p={p_int}: kernel body would unroll "
            f"d*(p+1)={d_dim * (p_int + 1)} ops per tile step, over the "
            f"{ELEMENTWISE_UNROLL_BUDGET}-op trace-time budget; use the "
            "XLA pow path for this (d, p)"
        )


def _kernel_lp_odd_argmin(
    x_ref,
    wt_ref,
    idx_ref,
    val_ref,
    best_ref,
    bestidx_ref,
    *,
    p=3,
    variant="iota",
):
    """Odd-p L^p tile (round 5, VERDICT r4 #7): per-dim ``|x − w|`` like
    the L1 kernel, raised to the static ``p`` by an explicit multiply
    chain (no transcendental pow — Mosaic lowers it as VPU muls), folded
    into the shared running (min, argmin) finish. Exact f32 like the L1
    kernel — odd powers admit no GEMM expansion (the reference evaluates
    them elementwise too, distances.py:61-75), so the win is the O(N)
    transient envelope instead of the XLA path's O(chunk·XY) matrix, at
    the L1 kernel's VPU-bound speed class. Serial accumulation only: the
    round-3 L1 ranking measured every split/bf16 variant behind it, and
    the extra p−1 muls per term only deepen the op-bound regime."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    x = x_ref[:]  # (TN, D)
    wt = wt_ref[:]  # (D, TJ)
    acc = jnp.zeros((x.shape[0], wt.shape[1]), dtype=jnp.float32)
    for k in range(x.shape[1]):
        t = jnp.abs(x[:, k : k + 1] - wt[k : k + 1, :])
        tp = t
        for _ in range(p - 1):
            tp = tp * t
        acc = acc + tp
    _finish(j, nj, acc, idx_ref, val_ref, best_ref, bestidx_ref, variant)


@partial(jax.jit, static_argnames=("p", "interpret", "tiles"))
def bmu_norm_p_odd(x, w_flat, p=3, *, interpret=False, tiles=None):
    """Fused BMU search under ODD integer-p ``norm_p`` activations:
    ``(idx, val)`` with ``idx[n] = argmin_j Σ_d |x_nd − w_jd|^p`` and
    ``val`` the p-th-power distance (the XLA form's comparison scale,
    reference distances.py:61-75). Exact f32, NumPy first-index ties;
    codebook padding rows are +inf so they never win. ``p`` must be a
    positive odd integer (p=1 is the L1 kernel's math through the
    norm_p name)."""
    # accept integer-VALUED floats (dist kwargs often carry p=3.0) the
    # way bmu_norm_p_frac coerces with float(p) — without this, a float
    # p that passes the odd check dies as an opaque TypeError in the
    # kernel's range(p-1) unroll (review, round 5)
    if not float(p).is_integer() or p < 1 or int(p) % 2 == 0:
        raise ValueError(f"p={p} must be a positive odd integer")
    p = int(p)
    _check_unroll_budget(x.shape[-1], p)
    # L1 kernel's measured default tile; the same VMEM envelope holds
    return _elementwise_bmu_call(
        partial(_kernel_lp_odd_argmin, p=p), x, w_flat, tiles, interpret
    )


def _kernel_lp_frac_argmin(
    x_ref,
    wt_ref,
    idx_ref,
    val_ref,
    best_ref,
    bestidx_ref,
    *,
    p=1.5,
    variant="iota",
    half_impl="sqrt",
):
    """Fractional-p L^p tile (round 5 close-out): per-dim ``t = |x − w|``
    like the L1 kernel, raised to the static non-integer ``p`` as
    ``t^⌊p⌋ · t^frac`` — the integer part is an exact multiply chain and
    only the fractional remainder goes through a transcendental
    (``sqrt`` when it is exactly ½, else ``exp(frac·log t)`` on the
    VPU). This is the SAME identity XLA uses to lower the broadcast
    path's non-integer ``pow`` (reference distances.py:61-75), with a
    smaller transcendental exponent — so fidelity is at least the XLA
    path's while the transient stays O(N) instead of O(chunk·XY·D).

    Edge behavior is IEEE-clean with no masking: ``t=0`` gives
    ``exp(frac·log 0) = exp(−inf) = 0`` (and ``sqrt(0) = 0``); the +inf
    codebook padding gives ``exp(frac·inf) = inf`` so padded nodes still
    never win.

    ``half_impl`` is a MEASUREMENT HOOK for the frac=½ class (not
    reachable from the public API): ``'rsqrt'`` evaluates ``t^½`` as
    ``t·rsqrt(t)`` to test whether the hardware reciprocal-sqrt unit
    outruns the full sqrt lowering; it needs two masking selects
    (``t=0 → 0·inf``, padding ``t=inf → inf·0``) that the sqrt form
    avoids. Measured via ``tools/r5_frac_rsqrt.py``."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        bestidx_ref[:] = jnp.zeros_like(bestidx_ref)

    x = x_ref[:]  # (TN, D)
    wt = wt_ref[:]  # (D, TJ)
    m = int(np.floor(p))
    f = float(p) - m
    acc = jnp.zeros((x.shape[0], wt.shape[1]), dtype=jnp.float32)
    for k in range(x.shape[1]):
        t = jnp.abs(x[:, k : k + 1] - wt[k : k + 1, :])
        if f == 0.5:
            if half_impl == "rsqrt":
                # t^½ = t·rsqrt(t); mask the two 0·inf products the
                # identity creates (t=0 and the +inf codebook padding)
                tp = jnp.where(t > 0, t * jax.lax.rsqrt(t), 0.0)
                tp = jnp.where(jnp.isfinite(t), tp, jnp.inf)
            else:
                tp = jnp.sqrt(t)
        else:
            tp = jnp.exp(jnp.float32(f) * jnp.log(t))
        for _ in range(m):
            tp = tp * t
        acc = acc + tp
    _finish(j, nj, acc, idx_ref, val_ref, best_ref, bestidx_ref, variant)


@partial(jax.jit, static_argnames=("p", "interpret", "tiles"))
def bmu_norm_p_frac(x, w_flat, p=1.5, *, interpret=False, tiles=None):
    """Fused BMU search under FRACTIONAL (non-integer) ``norm_p``
    activations: ``(idx, val)`` with ``idx[n] = argmin_j Σ_d
    |x_nd − w_jd|^p`` and ``val`` the p-th-power distance (the XLA
    form's comparison scale, reference distances.py:61-75). NumPy
    first-index ties; codebook padding rows are +inf so they never win.

    Fidelity class matches the XLA broadcast path it replaces — both
    evaluate the non-integer power as ``exp(p·log t)`` on the VPU (here
    with the integer part factored into an exact multiply chain) — so
    routing to this kernel never degrades numerics, it only removes the
    O(chunk·XY·D) broadcast transient. ``p`` must be positive and
    non-integer (integer p has its own exact kernels)."""
    p = float(p)
    if not p > 0 or p.is_integer():
        raise ValueError(
            f"p={p} must be a positive non-integer (odd/even integer p "
            "ride bmu_norm_p_odd / bmu_norm_p_even)"
        )
    _check_unroll_budget(x.shape[-1], int(p))
    return _elementwise_bmu_call(
        partial(_kernel_lp_frac_argmin, p=p), x, w_flat, tiles, interpret
    )


@partial(jax.jit, static_argnames=("p", "interpret", "mode", "tiles"))
def bmu_norm_p_even(
    x, w_flat, p=2, *, interpret=False, mode="highest", tiles=None, center=None
):
    """Fused BMU search under the even-p NORM_P activation: the binomial
    GEMM form (reference distances.py:77-96) is a pure dot of
    feature-expanded operands, ``Σ_e (−1)^e C(p,e) x^(p−e)·w^e
    = φ(x)·ψ(w)`` with ``φ, ψ : (·, D) → (·, D(p+1))`` — so the argmin
    rides the euclidean augmented-GEMM kernel with a ZERO ``‖w‖²``
    operand and ``ψ(w)·(−1/2)`` as the codebook (the kernel computes
    ``−2·φ(x)·(−ψ(w)/2) = φ(x)·ψ(w)`` exactly the distance). Returns
    ``(idx, dist_p)`` where ``dist_p`` is the norm-p distance RAISED TO
    THE p-TH POWER, like the XLA form.

    Numerics: the expansion cancels catastrophically (terms O(|x|^p)
    against distances that can be ≪ 1), so (a) both operands are centered
    by the codebook mean first — the norm-p distance is translation
    invariant and centering shrinks every expanded term — and (b) the
    default mode is 'highest' (exact f32 dots; the bf16-split modes'
    absolute error lands on the cancelled digits). ``center`` overrides
    the centering vector — pass the GLOBAL codebook mean on sharded
    codebooks so per-shard min values stay comparable in pmin merges."""
    # accept integer-VALUED floats (p=4.0) like the odd/frac kernels —
    # a float p would otherwise die in range(p+1) below (review, round 5);
    # p < 2 (zero/negative even) has no binomial expansion at all — the
    # dispatch gate keeps those on the XLA path, and a direct caller gets
    # a real error instead of an empty-concatenate crash
    if not float(p).is_integer() or int(p) % 2 != 0 or int(p) < 2:
        raise ValueError("p must be even and >= 2")
    p = int(p)
    if mode == "margin":
        # the margin gate's error envelope S = Σ|φ(x)||ψ(w)| dwarfs the
        # catastrophically-cancelled distances, so every row would be a
        # suspect and the fallback would run the packed kernel anyway —
        # but packed is NOT exact under this cancellation; refuse rather
        # than silently degrade
        raise ValueError(
            "mode='margin' is not supported for the norm_p expansion; "
            "use 'highest' (the default)"
        )
    c = (
        jnp.mean(w_flat, axis=0, keepdims=True)
        if center is None
        else center.reshape(1, -1)
    )
    xc = x - c
    wc = w_flat - c
    phi = jnp.concatenate([xc**(p - e) for e in range(p + 1)], axis=1)
    coeffs, k = [], 1
    for e in range(p + 1):
        coeffs.append((-1.0 if e % 2 else 1.0) * k)
        k = (k * (p - e)) // (e + 1)
    psi = jnp.concatenate(
        [cf * wc**e for e, cf in enumerate(coeffs)], axis=1
    )
    idx, val = bmu_euclidean(
        phi,
        -0.5 * psi,
        jnp.zeros((w_flat.shape[0], 1), jnp.float32),
        interpret=interpret,
        mode=mode,
        tiles=tiles,
        w_sq_raw=True,  # the zero ‖w‖² is semantic — split2 must not
        # substitute ¼·Σ(ψ_h)², an O(C(p,e)²·|w|^2e) per-node bias that
        # would swamp the cancelled distances entirely
    )
    return idx, val
