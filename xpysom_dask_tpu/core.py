"""Functional training/inference core of the TPU-native batch SOM.

This module replaces the imperative training loop of the reference
(``xpysom_dask/xpysom.py:458-594``) with pure, jit-compiled functions over
static-shaped, pre-chunked data. Key TPU-first redesigns versus the
reference:

- **BMU search** is the dominant FLOPs cost and stays a big MXU matmul
  (``-2 x@Wᵀ + ‖w‖²`` + argmin; reference distances.py:11-23,
  xpysom.py:410-417). A fused Pallas kernel backs it on TPU (see
  ``ops/pallas``); the XLA formulation here is the portable fallback.

- **The codebook update is reformulated around per-BMU sufficient
  statistics.** The reference materializes the neighborhood tensor
  ``g (N, X, Y)`` and computes ``num = g_flatᵀ @ X`` — an
  ``(XY, N) @ (N, D)`` GEMM (xpysom.py:434-440) costing ``N·XY·D`` FLOPs.
  But ``g`` depends on samples only through their BMU, so
  ``num[j] = Σ_b H[b, j] · S[b]`` with ``S[b] = Σ_{n: bmu=b} x_n`` and
  ``cnt[b] = |{n: bmu=b}|``. Accumulating ``(S, cnt)`` is an O(N·D)
  scatter-add and applying the neighborhood operator ``H`` is O(XY²·D) —
  with separable factorization O((X+Y)·XY·D) — instead of O(N·XY·D).
  The result is bit-identical math up to fp reassociation.

- **Dask data-parallelism → ``shard_map`` + ``psum``.** The reference ships
  the codebook to every Dask task and reduces partial accumulators on the
  driver once per epoch (xpysom.py:545-558). Here each device accumulates
  ``(S, cnt)`` over its data shard and a single ``psum`` over the ``data``
  mesh axis reduces them on-ICI; the (tiny) codebook update then runs
  replicated. No host round-trip inside an epoch.

- In-place accumulators become ``lax.scan`` carries; ragged final chunks
  (reference xpysom.py:563-564) become pad + mask so all shapes are static
  under jit.

- Learning-rate/σ decays are computed *inside* jit from a traced iteration
  index, so one compiled step serves every epoch (the reference recomputes
  them on host per epoch, xpysom.py:541-543).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .ops.decays import DECAY_REGISTRY
from .ops.distances import DistanceFunction, euclidean_squared_distance_part
from .ops.neighborhoods import apply_operator, neighborhood_operator
from .utils.envflags import env_flag

_F32 = jnp.float32

__all__ = [
    "SomSpec",
    "grid_coordinates",
    "chunk_data",
    "make_epoch_fn",
    "make_bmu_fn",
    "make_quantization_stats_fn",
    "make_topographic_stats_fn",
]


class _FromEnv:
    """Sentinel default for ``SomSpec``'s kernel-config fields: "resolve
    from the XPYSOM_* env switches at construction" (the one documented
    env boundary). Never survives ``__post_init__`` — constructed specs
    always hold concrete values, so pickles/hashes never see it."""

    __slots__ = ()

    def __repr__(self):  # pragma: no cover - debugging aid
        return "FROM_ENV"


FROM_ENV = _FromEnv()


@dataclass(frozen=True)
class SomSpec:
    """Static (hashable) SOM configuration — everything that shapes the
    compiled computation. Mirrors the reference constructor surface
    (xpysom.py:73-82); array state (the codebook) lives outside."""

    x: int
    y: int
    input_len: int
    sigma: float
    sigmaN: float
    learning_rate: float
    learning_rateN: float
    decay: str = "exponential"
    neighborhood: str = "gaussian"
    std_coeff: float = 0.5
    topology: str = "rectangular"
    distance: str = "euclidean"
    distance_kwargs: Tuple[Tuple[str, object], ...] = ()

    compact_support: bool = False

    # Fused-BMU-kernel configuration (first-class config surface, matching
    # the reference's constructor-kwargs-only config bar — SURVEY §5,
    # reference xpysom.py:73-161). These are PART OF the hashable spec, so
    # every jit cache keys on them: switching modes in one process simply
    # compiles a second executable (no trace-time env staleness).
    # OMITTED fields (the ``FROM_ENV`` sentinel default) are resolved from
    # the XPYSOM_* env switches in ``__post_init__`` — i.e. ONCE, when the
    # spec is constructed. That is the single env boundary for the whole
    # compute path (round 4, VERDICT r3 #5): no traced/jitted code reads
    # os.environ anymore. Passing a CONCRETE value — including ``None``,
    # which means "the kernels' defaults" ('packed' / the measured tile
    # table / pallas-on) — is env-blind: ``XPySom`` stores its resolved
    # values and builds its spec with them, so an already-constructed
    # model can never pick up a later env change (its spec property would
    # otherwise re-resolve on every access).
    bmu_precision: object = FROM_ENV  # packed|bf16|split2|split3|highest|margin
    bmu_tiles: object = FROM_ENV  # (TN, TJ) kernel tiles; None = table
    use_pallas: object = FROM_ENV  # False = plain-XLA BMU formulation

    def __post_init__(self):
        # Env switches are read HERE, at spec construction, never at trace
        # time — a later env change simply does not apply to already-built
        # specs (it can never go *silently* stale mid-process the way a
        # trace-time read cached by jit could). Concrete field values win.
        # The resolved values participate in the spec's hash/eq, so every
        # jit and lru cache keys on them.
        if self.use_pallas is FROM_ENV:
            object.__setattr__(
                self,
                "use_pallas",
                not env_flag("XPYSOM_TPU_NO_PALLAS"),
            )
        elif self.use_pallas is not None:
            object.__setattr__(self, "use_pallas", bool(self.use_pallas))
        if self.bmu_precision is FROM_ENV:
            from .ops.pallas.bmu import _env_mode

            # norm_p's binomial-expansion kernel cancels catastrophically
            # below exact precision (ops.pallas.bmu.bmu_norm_p_even)
            mode = _env_mode(
                default="highest" if self.distance == "norm_p" else "packed"
            )
            if self.distance == "norm_p" and mode != "highest":
                # a process-global env var set for an unrelated euclidean
                # experiment must not silently degrade norm_p's mandatory
                # exactness (or break construction via 'margin'); only an
                # EXPLICIT kwarg may override the 'highest' rule
                import warnings

                warnings.warn(
                    f"XPYSOM_BMU_PRECISION={mode!r} ignored for norm_p "
                    "activations (the binomial expansion cancels below "
                    "exact precision); using 'highest' — pass "
                    "bmu_precision= explicitly to override"
                )
                mode = "highest"
            object.__setattr__(self, "bmu_precision", mode)
        elif self.bmu_precision is not None:
            # concrete values are validated HERE, at the config boundary,
            # not at first kernel trace (far from the mistake)
            mode = str(self.bmu_precision).lower()
            if mode not in (
                "packed", "bf16", "split2", "split3", "highest", "margin"
            ):
                raise ValueError(
                    f"bmu_precision={self.bmu_precision!r} not recognized "
                    "(packed|bf16|split2|split3|highest|margin)"
                )
            if mode == "margin" and self.distance == "norm_p":
                raise ValueError(
                    "bmu_precision='margin' is not supported with norm_p "
                    "activations (the expansion's cancellation defeats the "
                    "margin gate); use 'highest'"
                )
            object.__setattr__(self, "bmu_precision", mode)
        if self.bmu_tiles is FROM_ENV:
            from .ops.pallas.bmu import _env_tiles

            # resolves to None when the env is unset too: None = the
            # kernels' measured per-width default table (concrete)
            object.__setattr__(self, "bmu_tiles", _env_tiles())
        elif self.bmu_tiles is not None:
            # coerce to a tuple (a list would silently break the spec's
            # hashability, surfacing as a TypeError deep in lru_cache)
            # and validate the tile contract
            try:
                tn, tj = (int(v) for v in self.bmu_tiles)
            except (TypeError, ValueError):
                raise ValueError(
                    f"bmu_tiles={self.bmu_tiles!r} invalid: expected a "
                    "(TN, TJ) pair"
                )
            if tn <= 0 or tj <= 0 or tn % 8 or tj % 128:
                raise ValueError(
                    f"bmu_tiles={self.bmu_tiles!r} invalid: TN must be a "
                    "positive multiple of 8 and TJ of 128"
                )
            object.__setattr__(self, "bmu_tiles", (tn, tj))

    @property
    def xy(self) -> int:
        return self.x * self.y

    def distance_fn(self) -> DistanceFunction:
        return DistanceFunction(self.distance, dict(self.distance_kwargs))


def grid_coordinates(x: int, y: int, topology: str):
    """Euclidean grid coordinate meshes ``(xx, yy)`` of shape ``(y, x)``
    ('xy' meshgrid indexing), with the hexagonal row offset
    ``xx[::-2] -= 0.5`` applied exactly as the reference does
    (xpysom.py:201-206): every other row *counted from the end* is shifted
    left half a cell."""
    xx, yy = np.meshgrid(np.arange(x), np.arange(y))
    xx = xx.astype(np.float64)
    yy = yy.astype(np.float64)
    if topology == "hexagonal":
        xx[::-2] -= 0.5
    return xx, yy


def chunk_data(
    data: np.ndarray, chunk: int, multiple_of: int = 1, min_chunks: int = 1
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pad + reshape ``(N, D)`` data into static-shaped ``(C, chunk, D)``
    chunks and a ``(C, chunk)`` float32 validity mask. ``C`` is rounded up
    to a multiple of ``multiple_of`` (the number of data shards) so the
    leading axis shards evenly; ``min_chunks`` floors it (fully-masked
    padding chunks — used by the inference shape-bucketing so the chunk
    COUNT, which is part of the compiled shape, lands on a small ladder)."""
    n, d = data.shape
    c = max(min_chunks, -(-n // chunk))
    c = -(-c // multiple_of) * multiple_of
    total = c * chunk
    padded = np.zeros((total, d), dtype=np.float32)
    padded[:n] = data
    mask = np.zeros((total,), dtype=np.float32)
    mask[:n] = 1.0
    return (
        padded.reshape(c, chunk, d),
        mask.reshape(c, chunk),
        n,
    )


def _neighborhood_op(spec: SomSpec, sigma):
    neigx = jnp.arange(spec.x, dtype=_F32)
    neigy = jnp.arange(spec.y, dtype=_F32)
    xx, yy = grid_coordinates(spec.x, spec.y, spec.topology)
    return neighborhood_operator(
        spec.neighborhood,
        spec.topology,
        neigx,
        neigy,
        jnp.asarray(xx, _F32),
        jnp.asarray(yy, _F32),
        spec.std_coeff,
        spec.compact_support,
        sigma,
    )


# Widest feature dimension the fused kernel accepts (tiles shrink with D,
# see ops.pallas.bmu._tiles_for; beyond this even minimum tiles blow the
# VMEM budget and Mosaic compilation OOMs).
_PALLAS_MAX_D = 2048


# Widest unrolled feature loop for the fused Manhattan BMU kernel.
_PALLAS_MANHATTAN_MAX_D = 256


# Trace-time op budget for the elementwise L^p kernels: their bodies
# unroll ~d·(p+1) vector ops per tile step (the D loop times the p-power
# multiply chain), so an unbounded p would blow up the traced program and
# the remote Mosaic compile even at small D (review, round 5). Mirrors
# the even-p gate's d·(p+1) feature-width bound; beyond it the XLA path
# computes the same metric through a single pow HLO.
_ELEMENTWISE_UNROLL_BUDGET = 2048


def _pallas_bmu_kind(dist: DistanceFunction, d_dim: int, use_pallas=None):
    """Which fused Pallas BMU kernel (if any) serves this activation on
    the current backend: 'euclidean' / 'cosine' (augmented-GEMM kernel;
    cosine rides it via the normalized codebook) / 'manhattan' (unrolled
    L1 tile kernel) / None (plain-XLA distance matrix + argmin).

    ``use_pallas`` is the spec-level switch (``SomSpec.use_pallas`` /
    the ``XPySom(use_pallas=...)`` constructor kwarg): ``False`` forces
    the XLA formulation (the reference's ``_no_opt`` pattern,
    tests.py:24-31), ``True``/``None`` commit to the kernel (backend and
    width budgets still gate — a kernel that cannot compile is never
    forced). The ``XPYSOM_TPU_NO_PALLAS`` kill-switch is resolved into
    ``use_pallas`` at SPEC CONSTRUCTION (``SomSpec.__post_init__``), not
    here: this function runs at trace time and must not read env."""
    if use_pallas is False:
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:  # pragma: no cover
        return None
    if dist.name in ("euclidean", "cosine") and d_dim <= _PALLAS_MAX_D:
        return dist.name
    if dist.name == "manhattan" and d_dim <= _PALLAS_MANHATTAN_MAX_D:
        return "manhattan"
    if dist.name == "norm_p":
        p = dist.kwargs.get("p", 2)
        if float(p).is_integer():
            # int() truncation without the is_integer() guard would
            # silently dispatch a fractional p to the wrong metric
            ip = int(p)
            # ip >= 2: p=0 and negative even p have no binomial-expansion
            # kernel (range(p+1) would be empty) — they keep the XLA path,
            # which computes them fine via pow
            if ip >= 2 and ip % 2 == 0 and d_dim * (ip + 1) <= _PALLAS_MAX_D:
                return "norm_p_even"
            # odd p (round 5, VERDICT r4 #7): the elementwise VPU kernel,
            # same D gate as the L1 kernel it extends, plus the trace-time
            # unroll budget (the kernel body is d·(p+1) unrolled vector
            # ops — an unbounded p would hang the remote Mosaic compile)
            if (
                ip % 2 == 1
                and ip >= 1
                and d_dim <= _PALLAS_MANHATTAN_MAX_D
                and d_dim * (ip + 1) <= _ELEMENTWISE_UNROLL_BUDGET
            ):
                return "norm_p_odd"
        elif (
            float(p) > 0
            and d_dim <= _PALLAS_MANHATTAN_MAX_D
            # the frac kernel unrolls d·(⌊p⌋+3)-ish ops (⌊p⌋ muls + the
            # transcendental remainder per dim) — same budget as odd
            and d_dim * (int(float(p)) + 1) <= _ELEMENTWISE_UNROLL_BUDGET
        ):
            # fractional p (round 5 close-out): the exp/log elementwise
            # kernel — same pow-lowering identity as the XLA broadcast
            # path, so fidelity class is unchanged and only the
            # O(chunk·XY·D) transient goes away (bmu_norm_p_frac)
            return "norm_p_frac"
    return None


def _bmu_config(spec: Optional["SomSpec"]):
    """(use_pallas, mode, tiles) for the kernel dispatch. A spec carries
    them as hashable fields so every jit cache keys on them. A ``None``
    spec (direct core users) yields all-None, which the kernels treat as
    their own defaults ('packed' / the measured tile table / pallas-on)
    — the kernels are env-blind since round 4; env resolution happens
    only at spec construction (``SomSpec.__post_init__``)."""
    if spec is None:
        return None, None, None
    return spec.use_pallas, spec.bmu_precision, spec.bmu_tiles


def _bmu_chunk(dist: DistanceFunction, x, w_flat, w_sq, spec=None):
    """Flat BMU indices for one chunk (reference xpysom.py:410-417).
    First-index tie-breaking matches NumPy/CuPy argmin. On TPU the
    euclidean, cosine and manhattan activations run fused Pallas kernels
    (distance tile never leaves VMEM); otherwise distance matrix + argmin
    in XLA. The euclidean kernel is centered by the codebook mean —
    translation-invariant for the argmin, and it shrinks the bf16-split
    error floor on non-origin-centered data (see bmu_euclidean).

    ``spec`` (optional) supplies the first-class kernel config
    (``use_pallas`` / ``bmu_precision`` / ``bmu_tiles``); ``dist`` is
    passed separately because QE/quantization search by euclidean
    distance regardless of the activation (reference xpysom.py:632-645)
    while still honoring the SOM's kernel config."""
    use_pallas, mode, tiles = _bmu_config(spec)
    kind = _pallas_bmu_kind(dist, x.shape[-1], use_pallas)
    if kind == "euclidean":
        from .ops.pallas.bmu import bmu_euclidean

        idx, _ = bmu_euclidean(
            x, w_flat, w_sq, center=jnp.mean(w_flat, axis=0),
            mode=mode, tiles=tiles,
        )
        return idx
    if kind == "cosine":
        from .ops.pallas.bmu import bmu_cosine

        idx, _ = bmu_cosine(x, w_flat, mode=mode, tiles=tiles)
        return idx
    if kind == "manhattan":
        from .ops.pallas.bmu import bmu_manhattan

        # Always the exact serial form: the round-3 slope-decontaminated
        # ranking (BASELINE.md, tools/r3_results.jsonl) put every
        # alternative BEHIND it at (16384, 16384, 64) — serial 11.01,
        # split2 12.53, split4 13.78, bf16 stream 16.41 ms/exec — so the
        # L1 kernel's VPU bound is precision-independent and reduced
        # precision would cost fidelity for NEGATIVE speed. The accum
        # variants remain on bmu_manhattan for benchmarking.
        idx, _ = bmu_manhattan(x, w_flat, tiles=tiles, accum="serial")
        return idx
    if kind == "norm_p_even":
        from .ops.pallas.bmu import bmu_norm_p_even

        # norm_p's own default is 'highest' (the binomial expansion
        # cancels catastrophically in reduced precision — see
        # bmu_norm_p_even); an explicit spec precision overrides it.
        idx, _ = bmu_norm_p_even(
            x, w_flat, p=int(dist.kwargs.get("p", 2)),
            mode=mode if mode is not None else "highest", tiles=tiles,
        )
        return idx
    if kind == "norm_p_odd":
        from .ops.pallas.bmu import bmu_norm_p_odd

        # exact f32 elementwise kernel — precision modes don't apply
        # (like the L1 kernel); the win is the O(N) transient envelope.
        # No default: the gate routes here only when kwargs carry an odd
        # p (a .get default of 2 would be one the kernel itself rejects)
        idx, _ = bmu_norm_p_odd(
            x, w_flat, p=int(dist.kwargs["p"]), tiles=tiles
        )
        return idx
    if kind == "norm_p_frac":
        from .ops.pallas.bmu import bmu_norm_p_frac

        # same fidelity class as the XLA pow lowering (both go through
        # exp(frac·log t)); the win is the O(N) transient envelope.
        # No default: the gate routes here only for non-integer p
        idx, _ = bmu_norm_p_frac(
            x, w_flat, p=float(dist.kwargs["p"]), tiles=tiles
        )
        return idx
    d = dist.flat(x, w_flat, w_sq)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _use_mosaic_scatter(spec, xy: int, d_dim: int) -> bool:
    """Route the sufficient-statistics scatter to the Pallas VMEM-
    accumulator kernel? OFF by default: the kernel's standalone 3.5×
    win over the XLA scatter-add was an isolation artifact — measured
    *in training context* (one window, slope method,
    tools/r3_epoch_anatomy.py) the Mosaic scatter costs 7.8 ms/epoch on
    the flagship vs 3.2 for XLA, a 12% end-to-end regression, because
    the serial row-RMW loop cannot overlap the adjacent BMU kernel the
    way XLA's scatter overlaps its neighbors (BASELINE.md round 3,
    'scatter retraction'). Opt-in via ``XPYSOM_MOSAIC_SCATTER=1``
    (benchmark hook) for re-measurement on future toolchains; still
    requires the TPU backend and the accumulator to fit the Mosaic VMEM
    budget (ops/pallas/stats.fits_vmem).

    EAGER resolver: called from factory bodies (``make_epoch_step`` /
    ``make_stats_fn``) when the executable is built, never under trace —
    the env read happens at build time, the traced step closes over the
    resulting boolean."""
    if not env_flag("XPYSOM_MOSAIC_SCATTER"):
        return False
    use_pallas, _, _ = _bmu_config(spec)
    if use_pallas is False:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    from .ops.pallas.stats import fits_vmem

    return fits_vmem(xy, d_dim)


def _use_split_scatter(d_dim: int) -> bool:
    """Scatter ``S`` and ``cnt`` separately instead of as one augmented
    ``[x | 1]`` row? Auto-on exactly when the +1 column crosses a
    128-lane tile boundary (``d_dim % 128 == 0``): TPU HBM layouts pad
    the minor dim to 128-lane multiples, so the augmented row then
    carries a whole extra lane tile of scatter RMW traffic for one
    useful column (D=512: 513→640 lanes, +25%; D=128: 129→256, +100%),
    while the split keeps the S scatter at exact lanes and the cnt
    scatter is a tiny (N,)→(XY,) add. When D+1 rounds to the same tile
    (e.g. the D=64 flagship, 65→128 either way) the single fused
    scatter wins — one scatter pass instead of two.
    ``XPYSOM_SPLIT_SCATTER`` forces (measurement hook): unset/empty =
    this auto rule; otherwise the same truthiness grammar as every other
    XPYSOM_* switch ('0'/'false'/'no'/'off' force fused, else split).

    EAGER resolver: called from factory bodies when the executable is
    built, never under trace (see ``_use_mosaic_scatter``)."""
    from .utils.envflags import env_tristate

    forced = env_tristate("XPYSOM_SPLIT_SCATTER")
    if forced is not None:
        return forced
    return d_dim >= 128 and d_dim % 128 == 0


def _accumulate_stats(
    dist: DistanceFunction,
    w_flat,
    w_sq,
    data,
    mask,
    xy,
    spec=None,
    *,
    mosaic_scatter=None,
    split_scatter=None,
):
    """Scan chunks, scatter-accumulating per-BMU sufficient statistics
    ``S[b] = Σ x_n`` and ``cnt[b] = Σ 1`` (masked rows contribute zero).

    ``S`` and ``cnt`` ride ONE scatter of the augmented rows ``[x | 1]·m``
    through the XLA scatter-add — the measured winner IN TRAINING CONTEXT
    (3.2 ms/epoch on the flagship vs 7.8 for the Pallas VMEM-accumulator
    kernel, whose standalone 3.5× was an isolation artifact; one-window
    slope anatomy, BASELINE.md round 3). The Mosaic kernel
    (``ops/pallas/stats.py``) stays behind ``XPYSOM_MOSAIC_SCATTER=1``
    as a re-measurement hook. At lane-boundary widths the augmented row
    pads a whole extra 128-lane tile, so there the scatter splits into
    separate S / cnt scatters instead (``_use_split_scatter``).

    Each chunk scatters into a *fresh* per-chunk partial which is then
    added to the carry: scattering +1.0 rows directly into a large f32
    total silently drops increments once a node's count passes 2^24
    (f32 ulp = 2); chunk-sized partials keep every addend representable
    at huge-N scale (the residual is ≤1 ulp per chunk-total add).

    ``mosaic_scatter``/``split_scatter`` select the scatter formulation.
    The library's factories resolve them EAGERLY at build time
    (``_use_mosaic_scatter``/``_use_split_scatter``) and pass concrete
    booleans, keeping env reads out of traced code; ``None`` (direct
    callers — measurement tools) resolves at call time, which is trace
    time if you call this under your own jit."""

    d_dim = data.shape[-1]
    if mosaic_scatter is None:
        mosaic_scatter = _use_mosaic_scatter(spec, xy, d_dim)
    if split_scatter is None:
        split_scatter = not mosaic_scatter and _use_split_scatter(d_dim)

    if split_scatter:

        def body(carry, xs):
            s_acc, c_acc = carry
            x, m = xs
            bmu = _bmu_chunk(dist, x, w_flat, w_sq, spec)
            xm = x * m[:, None]
            s_part = jnp.zeros((xy, d_dim), dtype=_F32).at[bmu].add(xm)
            c_part = jnp.zeros((xy,), dtype=_F32).at[bmu].add(m)
            return (s_acc + s_part, c_acc + c_part), None

        init = (
            jnp.zeros((xy, d_dim), dtype=_F32),
            jnp.zeros((xy,), dtype=_F32),
        )
        (s, cnt), _ = jax.lax.scan(body, init, (data, mask))
        return s, cnt

    def body(carry, xs):
        x, m = xs
        bmu = _bmu_chunk(dist, x, w_flat, w_sq, spec)
        if mosaic_scatter:
            from .ops.pallas.stats import scatter_stats

            part = scatter_stats(x, m, bmu, xy, return_acc=True)
        else:
            aug = (
                jnp.concatenate([x, jnp.ones((x.shape[0], 1), _F32)], axis=1)
                * m[:, None]
            )
            part = jnp.zeros((xy, d_dim + 1), dtype=_F32).at[bmu].add(aug)
        return carry + part, None

    init = jnp.zeros((xy, d_dim + 1), dtype=_F32)
    acc, _ = jax.lax.scan(body, init, (data, mask))
    return acc[:, :d_dim], acc[:, d_dim]


def _update_from_stats(spec: SomSpec, w_flat, s, cnt, eta, sigma):
    """Neighborhood-smoothed codebook update from global sufficient
    statistics: ``W' = where(den ≠ 0, num / den, W)``
    (reference xpysom.py:446-455,577). ``eta`` scales both num and den —
    kept for exact semantic fidelity to the reference's merge rule."""
    op = _neighborhood_op(spec, sigma)
    num, den = apply_operator(op, s, cnt)
    num = num * eta
    den = den * eta
    den = den[:, None]
    return jnp.where(den != 0, num / den, w_flat)


def _decays(spec: SomSpec, t, num_epochs: int):
    decay = DECAY_REGISTRY[spec.decay]
    eta = decay(spec.learning_rate, spec.learning_rateN, t, num_epochs)
    sig = decay(spec.sigma, spec.sigmaN, t, num_epochs)
    return eta, sig


def make_epoch_step(spec: SomSpec, num_epochs: int, psum_axis: Optional[str] = None):
    """Build the *pure* (un-jitted) epoch step
    ``step(w, data, mask, t) -> w'``. When ``psum_axis`` is given the
    per-shard sufficient statistics are ``psum``-reduced over that mesh
    axis (for use under ``shard_map``)."""
    dist = spec.distance_fn()
    xy = spec.xy
    # scatter-formulation env hooks resolved HERE, at build time (eager) —
    # the traced step closes over booleans, never reads env
    mosaic = _use_mosaic_scatter(spec, xy, spec.input_len)
    split = not mosaic and _use_split_scatter(spec.input_len)

    def step(w, data, mask, t):
        w_flat = w.reshape(xy, spec.input_len)
        w_sq = (
            jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
            if dist.can_cache
            else None
        )
        eta, sig = _decays(spec, t, num_epochs)
        s, cnt = _accumulate_stats(
            dist, w_flat, w_sq, data, mask, xy, spec,
            mosaic_scatter=mosaic, split_scatter=split,
        )
        if psum_axis is not None:
            s = jax.lax.psum(s, psum_axis)
            cnt = jax.lax.psum(cnt, psum_axis)
        new_flat = _update_from_stats(spec, w_flat, s, cnt, eta, sig)
        return new_flat.reshape(w.shape)

    return step


@lru_cache(maxsize=64)
def make_stats_fn(spec: SomSpec, mesh: Optional[Mesh] = None):
    """Compile the accumulate-only half of an epoch:
    ``stats(w, data, mask) -> (S, cnt)`` per-BMU sufficient statistics.
    Used by the streaming pipeline to fold superbatches of an epoch that
    does not fit on device (see ``parallel.pipeline``); with a mesh the
    shard partials are psum-reduced so the result is replicated."""
    dist = spec.distance_fn()
    xy = spec.xy
    mosaic = _use_mosaic_scatter(spec, xy, spec.input_len)
    split = not mosaic and _use_split_scatter(spec.input_len)

    def run(w, data, mask):
        w_flat = w.reshape(xy, spec.input_len)
        w_sq = (
            jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
            if dist.can_cache
            else None
        )
        s, cnt = _accumulate_stats(
            dist, w_flat, w_sq, data, mask, xy, spec,
            mosaic_scatter=mosaic, split_scatter=split,
        )
        if mesh is not None:
            s = jax.lax.psum(s, "data")
            cnt = jax.lax.psum(cnt, "data")
        return s, cnt

    if mesh is None:
        return jax.jit(run)
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


@lru_cache(maxsize=64)
def make_update_fn(spec: SomSpec, num_epochs: int):
    """Compile the finalize half of an epoch:
    ``update(w, S, cnt, t) -> w'`` — decays + neighborhood operator +
    ``where(den != 0, num/den, W)`` merge. Tiny (O(XY²·D) worst case);
    runs replicated."""

    def run(w, s, cnt, t):
        eta, sig = _decays(spec, t, num_epochs)
        w_flat = w.reshape(spec.xy, spec.input_len)
        new_flat = _update_from_stats(spec, w_flat, s, cnt, eta, sig)
        return new_flat.reshape(w.shape)

    return jax.jit(run, donate_argnums=(0,))


@lru_cache(maxsize=64)
def make_epoch_fn(spec: SomSpec, num_epochs: int, mesh: Optional[Mesh] = None):
    """Compile one training epoch.

    Returns ``epoch(w, data, mask, t) -> w'`` where ``w`` is the
    ``(X, Y, D)`` float32 codebook, ``data``/``mask`` are the pre-chunked
    ``(C, chunk, D)``/``(C, chunk)`` epoch inputs, and ``t`` is the (traced)
    iteration index. With a mesh, the chunk axis is sharded over the
    ``'data'`` axis and per-shard statistics are ``psum``-reduced on-ICI —
    the TPU-native replacement for the reference's per-epoch Dask
    ``delayed(sum)`` + driver ``compute`` barrier (xpysom.py:545-558)."""
    if mesh is None:
        step = make_epoch_step(spec, num_epochs)
        return jax.jit(step, donate_argnums=(0,))
    step = make_epoch_step(spec, num_epochs, psum_axis="data")

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


@lru_cache(maxsize=64)
def make_train_fn(spec: SomSpec, num_epochs: int, mesh: Optional[Mesh] = None):
    """Compile a whole training run:
    ``train(w, data, mask, iter_beg, iter_end) -> w'`` — a
    ``lax.while_loop`` over epochs *inside one executable*, so a full
    multi-epoch run is a single dispatch with zero host round-trips
    (the reference synchronizes with the driver every epoch,
    xpysom.py:515-577; here the decay schedule is computed on-device from
    the loop counter). ``iter_beg/iter_end`` are traced, preserving the
    segmented-training API."""
    psum_axis = "data" if mesh is not None else None
    step = make_epoch_step(spec, num_epochs, psum_axis=psum_axis)

    def run(w, data, mask, iter_beg, iter_end):
        def body(t, w):
            return step(w, data, mask, t)

        return jax.lax.fori_loop(iter_beg, iter_end, body, w)

    if mesh is None:
        return jax.jit(run, donate_argnums=(0,))
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


@lru_cache(maxsize=64)
def make_bmu_fn(spec: SomSpec, mesh: Optional[Mesh] = None):
    """Compile BMU (winner) search over pre-chunked data:
    ``bmu(w, data) -> (C, chunk) int32`` flat grid indices."""
    dist = spec.distance_fn()
    xy = spec.xy

    def run(w, data):
        w_flat = w.reshape(xy, spec.input_len)
        w_sq = (
            jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
            if dist.can_cache
            else None
        )

        def body(_, x):
            return None, _bmu_chunk(dist, x, w_flat, w_sq, spec)

        _, bmu = jax.lax.scan(body, None, data)
        return bmu

    if mesh is None:
        return jax.jit(run)

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded)


@lru_cache(maxsize=64)
def make_quantization_stats_fn(spec: SomSpec, mesh: Optional[Mesh] = None):
    """Compile quantization-error statistics:
    ``qstats(w, data, mask) -> (Σ‖x - W[bmu]‖, Σ mask)``.

    Matches the reference's definition: BMU by *euclidean* distance
    regardless of the activation distance (xpysom.py:632-645,673-707), then
    the mean L2 norm of the residuals."""
    xy = spec.xy
    eucl = DistanceFunction("euclidean")

    def run(w, data, mask):
        w_flat = w.reshape(xy, spec.input_len)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)

        def body(carry, xs):
            tot, n = carry
            x, m = xs
            bmu = _bmu_chunk(eucl, x, w_flat, w_sq, spec)
            err = jnp.linalg.norm(x - w_flat[bmu], axis=1)
            return (tot + jnp.sum(err * m), n + jnp.sum(m)), None

        (tot, n), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), (data, mask))
        return tot, n

    if mesh is None:
        return jax.jit(run)

    def run_psum(w, data, mask):
        tot, n = run(w, data, mask)
        return jax.lax.psum(tot, "data"), jax.lax.psum(n, "data")

    sharded = jax.shard_map(
        run_psum,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def te_uses_fused(spec: "SomSpec") -> bool:
    """Whether ``topographic_error``'s top-2 BMU search runs the fused
    Pallas kernel (``bmu_euclidean(top2=True)``) instead of materializing
    the (chunk, XY) distance matrix for ``lax.top_k``. Euclidean by
    definition (reference xpysom.py:731); same gating as ``_bmu_chunk``'s
    euclidean path. Callers use this to size chunks: the fused path never
    materializes the matrix, so it takes training-sized chunks instead of
    the ``_matrix_chunk`` budget."""
    return (
        _pallas_bmu_kind(
            DistanceFunction("euclidean"), spec.input_len, spec.use_pallas
        )
        == "euclidean"
    )


def te_fused_mode(spec: "SomSpec") -> str:
    """Precision mode for TE's fused top-2 kernel. TE's search is
    exact-by-contract like training's: map the non-GEMM precision modes
    onto the exact packed split (margin exists to BE exact; split3 /
    highest are exact by other means), keep bf16 opt-in. Single source
    of truth for the single-device and 2-D grid-mesh TE paths (review,
    round 5)."""
    return "bf16" if spec.bmu_precision == "bf16" else "packed"


@lru_cache(maxsize=64)
def make_topographic_stats_fn(spec: SomSpec, mesh: Optional[Mesh] = None):
    """Compile topographic-error statistics:
    ``tstats(w, data, mask) -> (Σ errors, Σ mask)``.

    Top-2 BMUs by euclidean distance (reference xpysom.py:731-734), then
    rect adjacency ``|Δx| ≤ 1 ∧ |Δy| ≤ 1`` (xpysom.py:736-740) or hex
    euclidean-offset distance > 1.5 (xpysom.py:741-746). The hex branch
    indexes the ``(y, x)``-shaped coordinate mesh with ``[bx, by]`` exactly
    as the reference does — self-consistent for the square maps it targets."""
    xy = spec.xy
    if spec.topology == "hexagonal" and spec.x != spec.y:
        # The hex branch replicates the reference's indexing of the
        # (y, x)-shaped coordinate mesh with [bx, by] (xpysom.py:742-743),
        # which is only self-consistent for square maps; the reference
        # raises IndexError on non-square input, XLA would silently clamp.
        raise ValueError(
            "topographic_error on hexagonal topology requires a square map "
            f"(got {spec.x}x{spec.y}); the reference's coordinate indexing "
            "(xpysom.py:742-743) is undefined for non-square hex maps"
        )
    xx_np, yy_np = grid_coordinates(spec.x, spec.y, spec.topology)
    xx = jnp.asarray(xx_np, _F32)
    yy = jnp.asarray(yy_np, _F32)

    use_fused = te_uses_fused(spec)
    fused_mode = te_fused_mode(spec)

    def run(w, data, mask):
        w_flat = w.reshape(xy, spec.input_len)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)

        def body(carry, xs):
            errs, n = carry
            x, m = xs
            if use_fused:
                # fused top-2 BMU: the (chunk, XY) distance matrix never
                # leaves VMEM (vs materializing it for lax.top_k below —
                # measured 225x slower at the flagship shape, BASELINE.md
                # round 4). Centered like training's _bmu_chunk.
                from .ops.pallas.bmu import bmu_euclidean

                i1, _, i2, _ = bmu_euclidean(
                    x,
                    w_flat,
                    center=jnp.mean(w_flat, axis=0),
                    mode=fused_mode,
                    tiles=spec.bmu_tiles,
                    top2=True,
                )
                idx2 = jnp.stack([i1, i2], axis=1)
            else:
                d = euclidean_squared_distance_part(x, w_flat, w_sq)
                _, idx2 = jax.lax.top_k(-d, 2)
            b1x, b1y = idx2[:, 0] // spec.y, idx2[:, 0] % spec.y
            b2x, b2y = idx2[:, 1] // spec.y, idx2[:, 1] % spec.y
            if spec.topology == "rectangular":
                bad = (jnp.abs(b1x - b2x) > 1) | (jnp.abs(b1y - b2y) > 1)
            else:
                dx = xx[b1x, b1y] - xx[b2x, b2y]
                dy = yy[b1x, b1y] - yy[b2x, b2y]
                bad = jnp.sqrt(dx * dx + dy * dy) > 1.5
            return (errs + jnp.sum(bad.astype(_F32) * m), n + jnp.sum(m)), None

        (errs, n), _ = jax.lax.scan(
            body, (jnp.float32(0), jnp.float32(0)), (data, mask)
        )
        return errs, n

    if mesh is None:
        return jax.jit(run)

    def run_psum(w, data, mask):
        errs, n = run(w, data, mask)
        return jax.lax.psum(errs, "data"), jax.lax.psum(n, "data")

    sharded = jax.shard_map(
        run_psum,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def clear_program_caches() -> None:
    """Drop every ``lru_cache``d program factory across the package.

    The scatter/kernel env hooks (``XPYSOM_SPLIT_SCATTER``,
    ``XPYSOM_MOSAIC_SCATTER``, ...) resolve EAGERLY at factory-build
    time — compiled programs close over booleans and never read env — so
    flipping a hook after a program is cached has no effect on equal
    ``(spec, num_epochs, mesh)`` keys. Measurement tools and A/B tests
    that toggle a hook must call this between arms, or they compare a
    cached program against itself (round-5 review: two split-scatter
    parity tests were vacuous this way)."""
    import sys as _sys

    mods = [_sys.modules[__name__]]
    for name in (
        "xpysom_dask_tpu.models.population",
        "xpysom_dask_tpu.parallel.grid_sharded",
    ):
        if name in _sys.modules:
            mods.append(_sys.modules[name])
        else:  # import so a pre-warm clear covers them too
            __import__(name)
            mods.append(_sys.modules[name])
    for mod in mods:
        for obj in vars(mod).values():
            if callable(obj) and hasattr(obj, "cache_clear"):
                obj.cache_clear()
