"""Margin-gated two-pass BMU (mode='margin', VERDICT r2 #1) in
interpreter mode: a bf16 first pass whose finish carries the top-2
margin, then an exact packed re-rank of only the ambiguous rows — the
argmin must be EXACT (float64 agreement incl. first-index ties) for any
input, because the rescue falls back to the full packed kernel whenever
its static buffer would overflow. Throughput is measured on-chip
(tests_tpu / BASELINE.md); here we pin correctness of every path."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu


def _ref_argmin(x, w):
    d = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
        w.astype(np.float64) ** 2
    ).sum(1)
    return d.argmin(1), d.min(1)


@pytest.mark.parametrize(
    "n,xy,d",
    [
        (300, 333, 7),  # ragged everything
        (256, 2048, 64),  # exact tile fit
        (8, 25, 1),  # tiny
        (1000, 4100, 16),  # codebook just over one lane tile
    ],
)
def test_margin_matches_float64(n, xy, d):
    rng = np.random.RandomState(0)
    x = rng.rand(n, d).astype(np.float32)
    w = rng.rand(xy, d).astype(np.float32)
    idx, val = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin"
    )
    ref_i, ref_v = _ref_argmin(x, w)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    # margin mode recomputes the winner value exactly in f32
    np.testing.assert_allclose(np.asarray(val), ref_v, rtol=1e-5, atol=1e-5)


def test_margin_near_ties_exact():
    """Adversarial near-ties in the band the margin gate exists for:
    top-2 margins ABOVE f32 resolution (so an exact-f32 kernel resolves
    them — that is the fidelity contract) but far BELOW the bf16 pass's
    error envelope (so the raw bf16 pass flips them). The margin rescue
    must deliver the packed (measured-exact) answer; ties finer than f32
    itself are out of scope for every f32-class kernel."""
    rng = np.random.RandomState(1)
    d = 16
    base = rng.rand(64, d).astype(np.float32)
    # clusters of 4 rows perturbed by ~2e-3: float64 margins land around
    # 1e-4..1e-2, versus a bf16 cross-term error envelope of ~0.2
    w = np.repeat(base, 4, axis=0) + 2e-3 * rng.randn(256, d).astype(np.float32)
    x = (base[rng.randint(64, size=200)] + 2e-3 * rng.randn(200, d)).astype(
        np.float32
    )
    ref_i, _ = _ref_argmin(x, w)
    idx_p, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="packed"
    )
    idx_m, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin"
    )
    # margin == packed EXACTLY (the fidelity bar: this fixture's finest
    # margins sit below even f32's resolution, where no f32-class kernel
    # — packed included — can track float64; the contract is that the
    # bf16 shortcut never costs fidelity relative to packed)
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_p))
    # and the raw bf16 pass is demonstrably much worse than both
    idx_b, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="bf16"
    )
    flips_b = (np.asarray(idx_b) != ref_i).sum()
    flips_m = (np.asarray(idx_m) != ref_i).sum()
    assert flips_b > 4 * flips_m, (flips_b, flips_m)


def test_margin_first_index_ties():
    x = np.array([[1.0, 2.0], [0.0, 0.0]], dtype=np.float32)
    w = np.tile(np.array([[1.0, 2.0]], dtype=np.float32), (7, 1))
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin"
    )
    np.testing.assert_array_equal(np.asarray(idx), [0, 0])


def test_margin_overflow_falls_back_exact():
    """Every row ambiguous (duplicated codebook) with a rescue buffer too
    small to hold them: the cond fallback must deliver the full packed
    result, not a truncated rescue."""
    rng = np.random.RandomState(2)
    d = 8
    w_half = rng.rand(32, d).astype(np.float32)
    w = np.concatenate([w_half, w_half])  # every node duplicated
    x = rng.rand(128, d).astype(np.float32)
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin",
        rescue_frac=0.01,  # capacity 8 << 128 suspects
    )
    ref_i, _ = _ref_argmin(x, w)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_margin_with_center():
    rng = np.random.RandomState(3)
    x = (rng.rand(100, 8) * 3 + 50).astype(np.float32)  # offset data
    w = (rng.rand(64, 8) * 3 + 50).astype(np.float32)
    c = jnp.asarray(w.mean(0))
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), center=c, interpret=True, mode="margin"
    )
    ref_i, _ = _ref_argmin(x, w)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_margin_cosine():
    rng = np.random.RandomState(4)
    x = rng.randn(90, 12).astype(np.float32)
    w = rng.randn(70, 12).astype(np.float32)
    idx, dist = pl_bmu.bmu_cosine(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin"
    )
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    ref = (1 - xn.astype(np.float64) @ wn.T.astype(np.float64)).argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), ref)


def test_margin_rejected_for_norm_p():
    with pytest.raises(ValueError, match="margin"):
        pl_bmu.bmu_norm_p_even(
            jnp.zeros((8, 4)), jnp.zeros((16, 4)), p=4,
            interpret=True, mode="margin",
        )
    from xpysom_dask_tpu import XPySom

    with pytest.raises(ValueError, match="margin"):
        XPySom(
            4, 4, 8, activation_distance="norm_p",
            activation_distance_kwargs={"p": 4}, bmu_precision="margin",
        )


def test_margin_constructor_accepted():
    from xpysom_dask_tpu import XPySom

    som = XPySom(4, 4, 8, bmu_precision="margin")
    assert som._spec.bmu_precision == "margin"
    # CPU backend: trains via the XLA path regardless (use_pallas gates it)
    som.train(np.random.RandomState(0).rand(64, 8), 2)
    assert np.isfinite(som.get_weights()).all()


def test_unknown_mode_raises():
    with pytest.raises(ValueError, match="mode="):
        pl_bmu.bmu_euclidean(
            jnp.zeros((8, 4)), jnp.zeros((16, 4)), interpret=True, mode="f16"
        )


# -- manhattan accumulation variants (VERDICT r2 #6) ---------------------------


def test_manhattan_accum_variants():
    rng = np.random.RandomState(5)
    x = rng.rand(100, 24).astype(np.float32)
    w = rng.rand(300, 24).astype(np.float32)
    ref = np.abs(
        x.astype(np.float64)[:, None, :] - w.astype(np.float64)[None]
    ).sum(-1).argmin(1)
    for accum in ("serial", "split2", "split4"):
        idx, val = pl_bmu.bmu_manhattan(
            jnp.asarray(x), jnp.asarray(w), interpret=True, accum=accum
        )
        np.testing.assert_array_equal(np.asarray(idx), ref, err_msg=accum)
    # bf16 stream: reduced precision — assert mechanics + bounded error
    idx_b, val_b = pl_bmu.bmu_manhattan(
        jnp.asarray(x), jnp.asarray(w), interpret=True, accum="bf16"
    )
    d64 = np.abs(
        x.astype(np.float64)[:, None, :] - w.astype(np.float64)[None]
    ).sum(-1)
    picked = d64[np.arange(100), np.asarray(idx_b)]
    # any bf16 flip lands on a near-tie: picked within the per-row bf16
    # error envelope of the true min
    assert (picked - d64.min(1) <= 2 * 2**-8 * (np.abs(x).sum(1) + 24)).all()
    with pytest.raises(ValueError, match="accum"):
        pl_bmu.bmu_manhattan(
            jnp.asarray(x), jnp.asarray(w), interpret=True, accum="int8"
        )


# -- bf16 d-tile variant (round-3 bandwidth experiment) ------------------------


@pytest.mark.parametrize("mode", ["margin", "bf16"])
def test_dtile_bf16_mechanics(mode):
    """dtile='bf16' stores the in-kernel distance tile in bf16 (halving
    the VMEM traffic the kernel is bound on). For margin mode the widened
    gate must keep the argmin EXACT; for bf16 mode it is a throughput
    knob whose flips stay within the (slightly larger) bf16 envelope."""
    rng = np.random.RandomState(7)
    x = rng.rand(300, 48).astype(np.float32)
    w = rng.rand(700, 48).astype(np.float32)
    idx, val = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode=mode, dtile="bf16"
    )
    ref_i, ref_v = _ref_argmin(x, w)
    if mode == "margin":
        np.testing.assert_array_equal(np.asarray(idx), ref_i)
        np.testing.assert_allclose(np.asarray(val), ref_v, rtol=1e-5, atol=1e-5)
    else:
        # flips land on near-ties only: picked distance within the bf16
        # envelope (cross term + storage rounding) of the true min
        d64 = -2 * x.astype(np.float64) @ w.T.astype(np.float64) + (
            w.astype(np.float64) ** 2
        ).sum(1)
        picked = d64[np.arange(300), np.asarray(idx)]
        s_row = np.abs(x) @ np.abs(2 * w).max(0)
        env = 2**-8 * (8 * s_row + 3 * (w**2).sum(1).max())
        assert (picked - d64.min(1) <= env).all()


def test_dtile_bf16_near_ties_match_packed():
    rng = np.random.RandomState(1)
    d = 16
    base = rng.rand(64, d).astype(np.float32)
    w = np.repeat(base, 4, axis=0) + 2e-3 * rng.randn(256, d).astype(np.float32)
    x = (base[rng.randint(64, size=200)] + 2e-3 * rng.randn(200, d)).astype(
        np.float32
    )
    idx_p, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="packed"
    )
    idx_m, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin",
        dtile="bf16",
    )
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_p))


def test_dtile_validation():
    x = jnp.zeros((8, 4), jnp.float32)
    w = jnp.zeros((16, 4), jnp.float32)
    with pytest.raises(ValueError, match="dtile"):
        pl_bmu.bmu_euclidean(x, w, interpret=True, mode="packed", dtile="bf16")
    with pytest.raises(ValueError, match="dtile"):
        pl_bmu.bmu_euclidean(x, w, interpret=True, mode="bf16", dtile="f16")


def test_margin_rescue_row0_not_clobbered():
    """Regression: when row 0 is itself a suspect and the rescue buffer
    has spare capacity, the spare slots must not clobber row 0's rescued
    index with the stale bf16 winner (caught on-chip as margin-trained
    weights diverging from packed-trained; the buffer's zero-filled tail
    issued duplicate row-0 writes)."""
    rng = np.random.RandomState(11)
    d = 16
    # row 0: an adversarial near-tie the bf16 pass flips; rows 1..15 clean
    w = rng.rand(64, d).astype(np.float32)
    w[1] = w[0] + 3e-4 * rng.randn(d).astype(np.float32)
    x = np.concatenate(
        [
            (w[0] + 0.5 * (w[1] - w[0]) + 1e-5 * rng.randn(1, d)).astype(
                np.float32
            ),
            rng.rand(15, d).astype(np.float32),
        ]
    )
    idx_m, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="margin"
    )
    idx_p, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), interpret=True, mode="packed"
    )
    # the contract is margin == packed (row 0's margin sits below f32
    # resolution, where no f32-class kernel tracks float64 — the clobber
    # bug made margin keep the raw-bf16 flip packed does not have)
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_p))


def test_dtile_bf16_compiled_path_gated(monkeypatch):
    """VERDICT r3 weak #4: the compiled path is a guaranteed v5e Mosaic
    crash, so it must raise a clear NotImplementedError by default;
    interpret mode (these tests) stays open, and the import-time
    XPYSOM_DTILE_BF16 opt-in re-arms it for future toolchains."""
    import xpysom_dask_tpu.ops.pallas.bmu as pl_bmu

    x = np.random.RandomState(0).rand(16, 8).astype(np.float32)
    w = np.random.RandomState(1).rand(32, 8).astype(np.float32)
    with pytest.raises(NotImplementedError, match="dtile='bf16'"):
        pl_bmu.bmu_euclidean(
            jnp.asarray(x), jnp.asarray(w), mode="bf16", dtile="bf16"
        )
    # interpret mode is not gated (fidelity tests above run through it)
    idx, _ = pl_bmu.bmu_euclidean(
        jnp.asarray(x), jnp.asarray(w), mode="bf16", dtile="bf16",
        interpret=True,
    )
    assert idx.shape == (16,)
    # opt-in re-arms the compiled path (here: CPU backend -> the pallas
    # call itself fails later, but the GATE must not fire)
    monkeypatch.setattr(pl_bmu, "_DTILE_BF16_OPTIN", True)
    try:
        pl_bmu.bmu_euclidean(
            jnp.asarray(x), jnp.asarray(w), mode="bf16", dtile="bf16"
        )
    except NotImplementedError as e:
        if "dtile" in str(e):
            raise AssertionError("gate fired despite opt-in") from e
    except Exception:
        pass  # CPU backend rejects the TPU pallas_call - expected
