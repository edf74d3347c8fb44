"""Pallas TPU kernel correctness in interpreter mode (runs on the CPU test
platform; the same kernels compile via Mosaic on real TPUs — see
.claude/skills/verify/SKILL.md for the on-hardware drive)."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu
from xpysom_dask_tpu.ops.pallas import manhattan as pl_manhattan


@pytest.mark.parametrize(
    "n,xy,d",
    [
        (300, 333, 7),  # ragged everything (exercises padding)
        (256, 2048, 64),  # exact tile fit
        (8, 25, 1),  # tiny 5x5x1 fixture shape
        (1000, 4100, 16),  # codebook just over one lane tile
    ],
)
def test_bmu_euclidean_matches_numpy(n, xy, d):
    rng = np.random.RandomState(0)
    x = rng.rand(n, d).astype(np.float32)
    w = rng.rand(xy, d).astype(np.float32)
    idx, val = pl_bmu.bmu_euclidean(jnp.asarray(x), jnp.asarray(w), interpret=True)
    dref = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
        w.astype(np.float64) ** 2
    ).sum(1)
    np.testing.assert_array_equal(np.asarray(idx), dref.argmin(1))
    np.testing.assert_allclose(np.asarray(val), dref.min(1), rtol=1e-5, atol=1e-5)


def test_bmu_first_index_tie_breaking():
    # identical codebook rows: argmin must pick the first (NumPy semantics)
    x = np.array([[1.0, 2.0], [0.0, 0.0]], dtype=np.float32)
    w = np.tile(np.array([[1.0, 2.0]], dtype=np.float32), (7, 1))
    idx, _ = pl_bmu.bmu_euclidean(jnp.asarray(x), jnp.asarray(w), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])


def test_bmu_with_cached_wsq():
    rng = np.random.RandomState(1)
    x = rng.rand(64, 5).astype(np.float32)
    w = rng.rand(70, 5).astype(np.float32)
    wsq = (w**2).sum(1, keepdims=True).astype(np.float32)
    i1, v1 = pl_bmu.bmu_euclidean(jnp.asarray(x), jnp.asarray(w), interpret=True)
    i2, v2 = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsq), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


@pytest.mark.parametrize("n,xy,d", [(100, 256, 100), (33, 257, 5)])
def test_manhattan_matches_numpy(n, xy, d):
    rng = np.random.RandomState(2)
    x = rng.rand(n, d).astype(np.float32)
    w = rng.rand(xy, d).astype(np.float32)
    got = pl_manhattan.manhattan_distance(
        jnp.asarray(x), jnp.asarray(w), interpret=True
    )
    want = np.abs(x[:, None, :].astype(np.float64) - w[None, :, :]).sum(2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_supported_gating_off_tpu():
    # On the CPU test platform the fused path must decline (XLA fallback).
    assert not pl_bmu.supported()
    x = jnp.ones((4, 8))
    assert not pl_manhattan.supported(x, x)


@pytest.mark.parametrize("mode", ["packed", "split3", "highest", "bf16"])
def test_bmu_modes_agree(mode):
    rng = np.random.RandomState(5)
    x = rng.rand(200, 24).astype(np.float32)
    w = rng.rand(500, 24).astype(np.float32)
    idx, val = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode=mode
    )
    dref = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
        w.astype(np.float64) ** 2
    ).sum(1)
    if mode == "bf16":
        # documented throughput mode: ~1.5-2% near-tie flips, ~2^-8 values
        assert (np.asarray(idx) == dref.argmin(1)).mean() >= 0.95
        np.testing.assert_allclose(np.asarray(val), dref.min(1), rtol=2e-2, atol=2e-2)
    else:
        np.testing.assert_array_equal(np.asarray(idx), dref.argmin(1))
        np.testing.assert_allclose(np.asarray(val), dref.min(1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("d", [256, 512, 1024, 2048])
def test_bmu_wide_features(d):
    """D-adaptive tiles: wide-feature configs stay on the fused kernel."""
    rng = np.random.RandomState(d)
    x = rng.rand(64, d).astype(np.float32)
    w = rng.rand(300, d).astype(np.float32)
    idx, _ = pl_bmu.bmu_euclidean(jnp.asarray(x), jnp.asarray(w), interpret=True)
    dref = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
        w.astype(np.float64) ** 2
    ).sum(1)
    np.testing.assert_array_equal(np.asarray(idx), dref.argmin(1))


def test_bmu_centering_recovers_offset_fidelity():
    """The packed mode's dropped xl·wl split term scales with |x||w|
    (absolute), so offset, near-tied codebooks (a trained SOM over
    non-origin-centered features) can flip moderately-near ties.
    Centering by the codebook mean — translation-invariant for the
    argmin — must recover exact agreement with float64 (and is what
    core._bmu_chunk passes)."""
    rng = np.random.RandomState(0)
    x = (rng.rand(1200, 8) * 4 + 10).astype(np.float32)
    w = (rng.rand(384, 8) * 4 + 10).astype(np.float32)
    w = 0.9 * w.mean(0) + 0.1 * w  # near-tied rows, like a smoothed codebook
    d64 = ((x[:, None].astype(np.float64) - w[None].astype(np.float64)) ** 2).sum(-1)
    ref = d64.argmin(1)
    c = jnp.mean(jnp.asarray(w), axis=0)
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), mode="packed", interpret=True, center=c
    )
    np.testing.assert_array_equal(np.asarray(idx), ref)
    # minval shifts by the (per-sample-constant) centering term but the
    # ORDER is preserved; idx must also be invariant to who computes wsq
    idx2, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x),
        jnp.asarray(w),
        jnp.sum(jnp.square(jnp.asarray(w)), axis=1, keepdims=True),
        mode="packed",
        interpret=True,
        center=c,
    )
    np.testing.assert_array_equal(np.asarray(idx2), ref)


def test_finish_variants_agree():
    """The 'argmin' finish (bench alternative) must match the shipped
    'iota' finish exactly, ties included."""
    rng = np.random.RandomState(11)
    x = rng.rand(96, 8).astype(np.float32)
    w = np.repeat(rng.rand(64, 8).astype(np.float32), 2, axis=0)  # ties
    i1, v1 = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, finish="iota"
    )
    i2, v2 = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, finish="argmin"
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_bmu_manhattan_matches_numpy():
    rng = np.random.RandomState(3)
    x = rng.rand(150, 9).astype(np.float32)
    w = rng.rand(400, 9).astype(np.float32)
    idx, val = pl_bmu.bmu_manhattan(jnp.asarray(x), jnp.asarray(w), interpret=True)
    ref = np.abs(x[:, None] - w[None]).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(val), ref.min(1), rtol=1e-5)


def test_bmu_manhattan_tie_breaking_and_padding():
    x = np.zeros((5, 3), np.float32)
    w = np.ones((7, 3), np.float32)  # all tie; padding to 128 must lose
    idx, val = pl_bmu.bmu_manhattan(jnp.asarray(x), jnp.asarray(w), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(5, np.int32))
    np.testing.assert_allclose(np.asarray(val), 3.0)


def test_bmu_cosine_matches_float64():
    rng = np.random.RandomState(5)
    x = (rng.randn(120, 6) * 2).astype(np.float32)
    w = (rng.randn(260, 6) * 2).astype(np.float32)
    w[7] = 0.0  # zero codebook row: reference nan_to_num -> distance 1
    idx, val = pl_bmu.bmu_cosine(jnp.asarray(x), jnp.asarray(w), interpret=True)
    x64, w64 = x.astype(np.float64), w.astype(np.float64)
    den = np.linalg.norm(x64, axis=1, keepdims=True) * np.linalg.norm(w64, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        ref = 1 - np.nan_to_num((x64 @ w64.T) / den)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(val), ref.min(1), rtol=1e-4, atol=1e-5)


def test_bmu_cosine_zero_sample_row():
    # ||x||=0: every distance is 1 (reference convention) -> first index
    x = np.zeros((3, 4), np.float32)
    w = np.random.RandomState(0).rand(10, 4).astype(np.float32)
    idx, val = pl_bmu.bmu_cosine(jnp.asarray(x), jnp.asarray(w), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(3, np.int32))
    np.testing.assert_allclose(np.asarray(val), 1.0)


@pytest.mark.parametrize("p", [2, 4, 6])
def test_bmu_norm_p_even_matches_numpy(p):
    rng = np.random.RandomState(p)
    x = rng.rand(80, 5).astype(np.float32)
    w = rng.rand(200, 5).astype(np.float32)
    idx, val = pl_bmu.bmu_norm_p_even(
        jnp.asarray(x), jnp.asarray(w), p=p, interpret=True
    )
    ref = (np.abs(x[:, None].astype(np.float64) - w[None]) ** p).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(val), ref.min(1), rtol=2e-4, atol=1e-5)


def test_pallas_bmu_kind_gating(monkeypatch):
    """The kernel-dispatch gate: right kernel per activation, env kill
    switch, width fallbacks, CPU -> None."""
    from xpysom_dask_tpu import core
    from xpysom_dask_tpu.ops.distances import DistanceFunction

    monkeypatch.setattr(core.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("XPYSOM_TPU_NO_PALLAS", raising=False)
    kind = core._pallas_bmu_kind
    assert kind(DistanceFunction("euclidean"), 64) == "euclidean"
    assert kind(DistanceFunction("cosine"), 64) == "cosine"
    assert kind(DistanceFunction("manhattan"), 64) == "manhattan"
    assert kind(DistanceFunction("norm_p", {"p": 4}), 64) == "norm_p_even"
    # width fallbacks
    assert kind(DistanceFunction("euclidean"), core._PALLAS_MAX_D + 1) is None
    assert kind(DistanceFunction("manhattan"), 512) is None
    assert kind(DistanceFunction("norm_p", {"p": 4}), 512) is None  # D(p+1)
    # odd integer p rides the elementwise kernel (round 5, L1 D gate);
    # fractional p rides the exp/log elementwise kernel (round 5
    # close-out, same gate); no_opt names stay on XLA
    assert kind(DistanceFunction("norm_p", {"p": 3}), 16) == "norm_p_odd"
    assert kind(DistanceFunction("norm_p", {"p": 3}), 512) is None
    assert kind(DistanceFunction("norm_p", {"p": 2.5}), 16) == "norm_p_frac"
    assert kind(DistanceFunction("norm_p", {"p": 2.5}), 512) is None
    assert kind(DistanceFunction("norm_p", {"p": -0.5}), 16) is None
    # trace-time unroll budget (review, round 5): the elementwise kernels
    # unroll ~d·(p+1) ops per tile step, so a huge p must fall back to
    # the XLA pow path even at small D — otherwise the remote Mosaic
    # compile blows up on a D·p-length multiply chain
    budget = core._ELEMENTWISE_UNROLL_BUDGET
    assert kind(DistanceFunction("norm_p", {"p": 101}), 64) is None
    assert kind(DistanceFunction("norm_p", {"p": 50.5}), 64) is None
    p_fit = budget // 64 - 1  # largest odd p inside the budget at D=64
    if p_fit % 2 == 0:
        p_fit -= 1
    assert kind(DistanceFunction("norm_p", {"p": p_fit}), 64) == "norm_p_odd"
    assert (
        kind(DistanceFunction("norm_p", {"p": p_fit + 0.5}), 64)
        == "norm_p_frac"
    )
    assert kind(DistanceFunction("norm_p", {"p": p_fit + 2}), 64) is None
    assert kind(DistanceFunction("euclidean_no_opt"), 16) is None
    # kill switch: resolved at SPEC CONSTRUCTION (the one env boundary,
    # SomSpec.__post_init__), threaded into the gate as use_pallas=False —
    # _pallas_bmu_kind itself never reads env (it runs at trace time)
    monkeypatch.setenv("XPYSOM_TPU_NO_PALLAS", "1")
    spec = core.SomSpec(8, 8, 64, 2.0, 0.5, 0.5, 0.01)
    assert spec.use_pallas is False
    assert kind(DistanceFunction("euclidean"), 64, spec.use_pallas) is None
    # the gate alone (no spec) stays env-blind: auto = kernel on
    assert kind(DistanceFunction("euclidean"), 64) == "euclidean"
    monkeypatch.delenv("XPYSOM_TPU_NO_PALLAS")
    # off-TPU
    monkeypatch.setattr(core.jax, "default_backend", lambda: "cpu")
    assert kind(DistanceFunction("euclidean"), 64) is None


@pytest.mark.parametrize("mode", ["packed", "bf16"])
@pytest.mark.parametrize("kblock", [128, 512])
def test_kblocked_kernel_matches_2d(mode, kblock):
    """The K-blocked wide-D candidate (round 4) must be BITWISE identical
    to the 2-D kernel in interpret mode — same partial-dot sums (f32
    accumulate over K tiles reassociates only across the kblock
    boundary, which the augmented operands' zero padding makes exact),
    same running-argmin finish."""
    from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    x = rng.rand(120, 384).astype(np.float32)
    w = rng.rand(500, 384).astype(np.float32)
    idx_kb, val_kb = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode=mode,
        kblock=kblock,
    )
    idx_2d, val_2d = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode=mode,
    )
    np.testing.assert_array_equal(np.asarray(idx_kb), np.asarray(idx_2d))
    np.testing.assert_allclose(
        np.asarray(val_kb), np.asarray(val_2d), rtol=1e-6, atol=1e-6
    )
    if mode == "packed":
        ref = (
            -2 * x.astype(np.float64) @ w.T.astype(np.float64)
            + (w.astype(np.float64) ** 2).sum(1)
        ).argmin(1)
        np.testing.assert_array_equal(np.asarray(idx_kb), ref)


def test_kblocked_kernel_validation():
    from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu
    import jax.numpy as jnp

    z = jnp.zeros((8, 4)), jnp.zeros((16, 4))
    with pytest.raises(ValueError, match="kblock.*requires mode"):
        pl_bmu.bmu_euclidean(*z, interpret=True, mode="highest", kblock=128)
    with pytest.raises(ValueError, match="multiple of 128"):
        pl_bmu.bmu_euclidean(*z, interpret=True, mode="packed", kblock=100)


def test_bmu_top2_matches_stable_argsort():
    """top2=True returns the first two columns of a stable argsort of
    the float64 distance matrix (the reference's topographic_error
    selection, xpysom.py:731-734) — both indices, exact, across
    padding/tile shapes."""
    rng = np.random.RandomState(7)
    for n, xy, d in [(300, 333, 7), (256, 2048, 64), (64, 25, 3)]:
        x = rng.rand(n, d).astype(np.float32)
        w = rng.rand(xy, d).astype(np.float32)
        i1, v1, i2, v2 = pl_bmu.bmu_euclidean(
            jnp.asarray(x), jnp.asarray(w), interpret=True, top2=True
        )
        dref = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
            w.astype(np.float64) ** 2
        ).sum(1)
        ref = np.argsort(dref, axis=1, kind="stable")[:, :2]
        np.testing.assert_array_equal(np.asarray(i1), ref[:, 0])
        np.testing.assert_array_equal(np.asarray(i2), ref[:, 1])
        # val/val2 are the corresponding partial distances
        np.testing.assert_allclose(
            np.asarray(v1), np.take_along_axis(dref, ref[:, :1], 1)[:, 0],
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.take_along_axis(dref, ref[:, 1:], 1)[:, 0],
            rtol=1e-5, atol=1e-4,
        )


def test_bmu_top2_duplicate_minimum_across_tiles():
    """A duplicate-valued minimum in a DIFFERENT lane tile must come out
    as the second BMU (stable-argsort semantics), not be skipped by the
    winning-lane mask."""
    x = np.zeros((4, 3), np.float32)
    x[1] = 5
    w = np.zeros((2100, 3), np.float32)
    w[7] = 5
    w[1500] = 5  # identical best row, two lane tiles away
    i1, _, i2, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, top2=True
    )
    assert int(i1[1]) == 7 and int(i2[1]) == 1500
    # and within one tile
    w2 = np.zeros((200, 3), np.float32)
    w2[7] = 5
    w2[9] = 5
    i1, _, i2, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w2), interpret=True, top2=True
    )
    assert int(i1[1]) == 7 and int(i2[1]) == 9


def test_bmu_top2_validation():
    x = jnp.zeros((8, 4), jnp.float32)
    w = jnp.zeros((16, 4), jnp.float32)
    with pytest.raises(ValueError, match="top2"):
        pl_bmu.bmu_euclidean(x, w, interpret=True, top2=True, mode="highest")
    with pytest.raises(ValueError, match="top2"):
        pl_bmu.bmu_euclidean(
            x, w, interpret=True, top2=True, kblock=128
        )


def test_bmu_split2_exact_on_rounded_codebook():
    """split2's contract (round 5, wording tightened by review): the
    argmin/min of the partial distance from the 16-BIT-TRUNCATED sample
    ``x̃ = f32(xh)+f32(xl)`` (a 2-term Dekker split keeps 16 of f32's 24
    mantissa bits) to the bf16-ROUNDED codebook, exact up to f32
    accumulation — a perturbed problem, solved to accumulation accuracy
    (bmu.py module docstring). Oracle: float64 distances between x̃ and
    the codebook rounded the same way the kernel rounds it (bf16 split
    of -2·wᵀ)."""
    import jax

    rng = np.random.RandomState(7)
    x = rng.rand(512, 24).astype(np.float32)
    w = rng.rand(700, 24).astype(np.float32)
    idx, val = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="split2"
    )
    xh = jax.lax.reduce_precision(
        jnp.asarray(x), exponent_bits=8, mantissa_bits=7
    )
    xl = jax.lax.reduce_precision(
        jnp.asarray(x) - xh, exponent_bits=8, mantissa_bits=7
    )
    x_t = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    w2t_h = jax.lax.reduce_precision(
        jnp.asarray(-2.0 * w.T.astype(np.float32)),
        exponent_bits=8,
        mantissa_bits=7,
    )
    w_h = np.asarray(w2t_h, dtype=np.float64).T / -2.0
    dref = -2 * x_t @ w_h.T + (w_h**2).sum(1)
    np.testing.assert_array_equal(np.asarray(idx), dref.argmin(1))
    np.testing.assert_allclose(np.asarray(val), dref.min(1), rtol=1e-4, atol=1e-4)


def test_bmu_split2_beats_bf16_on_offset_near_ties():
    """split2's flip error is the second-order 2(x−w)·(w−w_h) — on the
    offset near-tied regime (the centering test's fixture, uncentered)
    it must flip far fewer winners than the bf16 single-pass mode, both
    raw and centered. It is NOT exact (the problem stays perturbed by
    the codebook rounding — measured on this fixture: bf16 1146/6
    raw/centered flips, split2 358/5, packed 4/0 of 1200 rows), which
    is why it ships opt-in rather than as a packed replacement."""
    rng = np.random.RandomState(0)
    x = (rng.rand(1200, 8) * 4 + 10).astype(np.float32)
    w = (rng.rand(384, 8) * 4 + 10).astype(np.float32)
    w = 0.9 * w.mean(0) + 0.1 * w
    d64 = ((x[:, None].astype(np.float64) - w[None].astype(np.float64)) ** 2).sum(-1)
    ref = d64.argmin(1)

    def flips(mode, center=None):
        idx, _ = pl_bmu.bmu_euclidean(
            jnp.asarray(x), jnp.asarray(w), interpret=True, mode=mode,
            center=center,
        )
        return int((np.asarray(idx) != ref).sum())

    f_bf16 = flips("bf16")
    f_split2 = flips("split2")
    assert f_split2 < f_bf16 / 2, (f_split2, f_bf16)
    c = jnp.mean(jnp.asarray(w), axis=0)
    assert flips("split2", center=c) <= 8  # <0.7% on an adversarial fixture


def test_bmu_split2_shadow_coincidence_ties_first_index():
    """The verified round-5 failure mechanism (BASELINE.md): two codebook
    rows whose bf16 shadows coincide are EXACT ties under split2 (its
    self-consistent ‖w_h‖² is what makes them tie — bf16 mode's exact
    norm term keeps them distinct), and the deterministic first-index
    tie-break then always elects the earlier row. During training this
    starves the later node permanently (measured 64→14-winner collapse
    on low-D clustered data) — why split2 warns at input_len < 32."""
    import jax

    # two rows that differ by less than one bf16 ulp of their magnitude
    base = np.full((8,), 1.0, np.float32)
    w = np.stack([base, base + 1e-5, base * 1.5]).astype(np.float32)
    w2t_h = jax.lax.reduce_precision(
        jnp.asarray(-2.0 * w.T), exponent_bits=8, mantissa_bits=7
    )
    assert np.array_equal(np.asarray(w2t_h)[:, 0], np.asarray(w2t_h)[:, 1])

    # rows of x nearer the SECOND copy: exact math elects index 1,
    # split2's coincident shadows tie and first-index elects 0
    x = np.tile(base + 1e-5, (16, 1)).astype(np.float32)
    d64 = ((x[:, None].astype(np.float64) - w[None].astype(np.float64)) ** 2).sum(-1)
    assert (d64.argmin(1) == 1).all()
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="split2"
    )
    assert (np.asarray(idx) == 0).all()


def test_split2_low_d_constructor_warns():
    """split2 at input_len < 32 warns about the shadow-starvation
    collapse (XPySom constructor); wide D stays silent."""
    import warnings
    from xpysom_dask_tpu import XPySom

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        XPySom(4, 4, 4, bmu_precision="split2")
    assert any("shadow" in str(r.message) for r in rec), [
        str(r.message) for r in rec
    ]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        XPySom(4, 4, 64, bmu_precision="split2")
    assert not any("shadow" in str(r.message) for r in rec)


def test_bmu_norm_p_odd_exact_vs_float64():
    """Round 5 (VERDICT r4 #7): the odd-p elementwise kernel is exact f32
    — winners match the float64 oracle on random data for p=3 and p=5,
    values match the p-th-power distance scale, padded codebook rows
    never win, and first-index tie-breaking holds."""
    rng = np.random.RandomState(3)
    x = rng.rand(300, 24).astype(np.float32)
    w = rng.rand(517, 24).astype(np.float32)  # odd node count -> padding
    for p in (3, 5):
        d64 = (
            np.abs(x[:, None].astype(np.float64) - w[None].astype(np.float64))
            ** p
        ).sum(-1)
        idx, val = pl_bmu.bmu_norm_p_odd(
            jnp.asarray(x), jnp.asarray(w), p=p, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(idx), d64.argmin(1))
        np.testing.assert_allclose(
            np.asarray(val), d64.min(1), rtol=1e-5, atol=1e-6
        )

    # exact duplicate codebook rows: first index wins (NumPy argmin)
    w_tie = np.vstack([w[:5], w[:5]]).astype(np.float32)
    idx, _ = pl_bmu.bmu_norm_p_odd(
        jnp.asarray(w[:5]), jnp.asarray(w_tie), p=3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.arange(5))

    with pytest.raises(ValueError, match="odd"):
        pl_bmu.bmu_norm_p_odd(jnp.asarray(x), jnp.asarray(w), p=4, interpret=True)


def test_bmu_norm_p_integer_valued_float_p():
    """Integer-VALUED float p (the form dist kwargs often carry, e.g.
    {'p': 3.0}) must be coerced, not die as an opaque TypeError inside
    the kernel's range() unroll (review, round 5) — and non-integer
    floats must still be rejected by the odd/even kernels."""
    rng = np.random.RandomState(3)
    x = rng.rand(24, 6).astype(np.float32)
    w = rng.rand(40, 6).astype(np.float32)
    xj, wj = jnp.asarray(x), jnp.asarray(w)
    i_odd, v_odd = pl_bmu.bmu_norm_p_odd(xj, wj, p=3, interpret=True)
    i_oddf, v_oddf = pl_bmu.bmu_norm_p_odd(xj, wj, p=3.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_odd), np.asarray(i_oddf))
    np.testing.assert_array_equal(np.asarray(v_odd), np.asarray(v_oddf))
    i_ev, v_ev = pl_bmu.bmu_norm_p_even(xj, wj, p=4, interpret=True)
    i_evf, v_evf = pl_bmu.bmu_norm_p_even(xj, wj, p=4.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_ev), np.asarray(i_evf))
    np.testing.assert_array_equal(np.asarray(v_ev), np.asarray(v_evf))
    with pytest.raises(ValueError, match="odd"):
        pl_bmu.bmu_norm_p_odd(xj, wj, p=3.5, interpret=True)
    with pytest.raises(ValueError, match="even"):
        pl_bmu.bmu_norm_p_even(xj, wj, p=2.5, interpret=True)


@pytest.mark.parametrize("p", [0.5, 1.5, 2.5, 3.7])
def test_bmu_norm_p_frac_matches_float64(p):
    """Round 5 close-out: the fractional-p elementwise kernel. Values
    match the float64 oracle to transcendental-lowering tolerance (the
    same exp/log identity XLA's pow uses on the path this replaces);
    winners match wherever the float64 runner-up margin exceeds that
    tolerance; padded codebook rows never win; exact-duplicate rows
    break ties first-index; integer p is rejected."""
    rng = np.random.RandomState(int(p * 10))
    x = rng.rand(300, 24).astype(np.float32)
    w = rng.rand(517, 24).astype(np.float32)  # odd node count -> padding
    d64 = (
        np.abs(x[:, None].astype(np.float64) - w[None].astype(np.float64))
        ** p
    ).sum(-1)
    idx, val = pl_bmu.bmu_norm_p_frac(
        jnp.asarray(x), jnp.asarray(w), p=p, interpret=True
    )
    idx = np.asarray(idx)
    assert idx.max() < 517  # padding rows never win
    # winner parity outside the fp32 near-tie band
    order = np.sort(d64, axis=1)
    margin = (order[:, 1] - order[:, 0]) / order[:, 0]
    disagree = idx != d64.argmin(1)
    assert not np.any(disagree & (margin > 1e-4)), (
        int(disagree.sum()),
        float(margin[disagree].min()) if disagree.any() else None,
    )
    np.testing.assert_allclose(
        np.asarray(val), d64[np.arange(len(x)), idx], rtol=2e-4
    )

    # exact duplicate codebook rows: first index wins (NumPy argmin)
    w_tie = np.vstack([w[:5], w[:5]]).astype(np.float32)
    idx_t, _ = pl_bmu.bmu_norm_p_frac(
        jnp.asarray(w[:5]), jnp.asarray(w_tie), p=p, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_t), np.arange(5))

    with pytest.raises(ValueError, match="non-integer"):
        pl_bmu.bmu_norm_p_frac(jnp.asarray(x), jnp.asarray(w), p=2, interpret=True)
    with pytest.raises(ValueError, match="non-integer"):
        pl_bmu.bmu_norm_p_frac(jnp.asarray(x), jnp.asarray(w), p=-0.5, interpret=True)
    # zero/negative even p: a real error, not an empty binomial
    # expansion crashing in concatenate (review, round 5)
    with pytest.raises(ValueError, match="even"):
        pl_bmu.bmu_norm_p_even(jnp.asarray(x), jnp.asarray(w), p=-2, interpret=True)
    with pytest.raises(ValueError, match="even"):
        pl_bmu.bmu_norm_p_even(jnp.asarray(x), jnp.asarray(w), p=0, interpret=True)


def test_bmu_norm_p_frac_zero_distance_rows():
    """t=0 features must contribute exactly 0 through the exp/log path
    (exp(frac·log 0) = 0, no NaN): a sample equal to a codebook row wins
    with distance 0."""
    rng = np.random.RandomState(9)
    w = rng.rand(40, 8).astype(np.float32)
    idx, val = pl_bmu.bmu_norm_p_frac(
        jnp.asarray(w[10:13]), jnp.asarray(w), p=1.5, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), [10, 11, 12])
    np.testing.assert_array_equal(np.asarray(val), np.zeros(3, np.float32))


def test_bmu_norm_p_frac_rsqrt_hook_masks_correctly():
    """The half_impl='rsqrt' measurement hook (t^0.5 as t*rsqrt(t)) must
    mask both 0*inf products the identity creates: t=0 (sample equals
    codebook feature) and the +inf codebook padding. Winners and values
    must match the sqrt lowering bit-for-bit at p=1.5 (same fractional
    exponent, different transcendental only in the half term)."""
    from functools import partial

    rng = np.random.RandomState(11)
    x = rng.rand(64, 8).astype(np.float32)
    w = rng.rand(53, 8).astype(np.float32)  # odd count -> +inf padding
    x[:3] = w[7:10]  # exact-match rows exercise the t=0 mask

    def run(half_impl):
        return pl_bmu._elementwise_bmu_call(
            partial(pl_bmu._kernel_lp_frac_argmin, p=1.5, half_impl=half_impl),
            jnp.asarray(x), jnp.asarray(w), None, True,
        )

    i_s, v_s = run("sqrt")
    i_r, v_r = run("rsqrt")
    assert np.asarray(i_r).max() < 53  # padding never wins
    assert np.all(np.isfinite(np.asarray(v_r)))
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_r[:3]), [7, 8, 9])


def test_elementwise_kernels_reject_over_budget_p():
    """Direct kernel callers hit the same trace-time unroll budget the
    dispatch gate enforces (shared constant — review, round 5): a huge
    static p must raise instead of unrolling a D·p multiply chain into
    the Mosaic compile."""
    from xpysom_dask_tpu import core
    from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu

    assert pl_bmu.ELEMENTWISE_UNROLL_BUDGET is core._ELEMENTWISE_UNROLL_BUDGET
    x = jnp.zeros((8, 64), jnp.float32)
    w = jnp.zeros((4, 64), jnp.float32)
    with pytest.raises(ValueError, match="budget"):
        pl_bmu.bmu_norm_p_odd(x, w, p=101, interpret=True)
    with pytest.raises(ValueError, match="budget"):
        pl_bmu.bmu_norm_p_frac(x, w, p=50.5, interpret=True)


def test_norm_p_odd_dispatch_routing(monkeypatch):
    """core._pallas_bmu_kind routes odd integer p to the elementwise
    kernel (on TPU), keeps even p on the GEMM expansion, and sends
    fractional p to the exp/log elementwise kernel; the D gate matches
    the L1 kernel's."""
    from xpysom_dask_tpu import core
    from xpysom_dask_tpu.ops.distances import DistanceFunction

    # the conftest forces the CPU backend for the whole suite, so a
    # default_backend() skip-guard would skip EVERYWHERE (round-5 review:
    # this test never ran); fake the backend like the sibling gating test
    monkeypatch.setattr(core.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("XPYSOM_TPU_NO_PALLAS", raising=False)

    def kind(p, d=32):
        return core._pallas_bmu_kind(
            DistanceFunction("norm_p", {"p": p}), d, use_pallas=True
        )

    assert kind(3) == "norm_p_odd"
    assert kind(1) == "norm_p_odd"
    assert kind(4) == "norm_p_even"
    assert kind(2.5) == "norm_p_frac"
    assert kind(3, d=512) is None  # beyond the L1 kernel's D gate
    assert kind(2.5, d=512) is None
    # zero/negative p: NO kernel (the binomial expansion needs p >= 2,
    # odd needs p >= 1, frac needs p > 0) — all stay on the XLA path,
    # which computes them via pow (review, round 5)
    assert kind(0) is None
    assert kind(-2) is None
    assert kind(-3) is None
    assert kind(-0.5) is None
