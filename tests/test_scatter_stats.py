"""Mosaic scatter-stats prototype (VERDICT r2 #4) — interpreter-mode
correctness; the XLA-vs-Mosaic scatter race is measured on-chip."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.ops.pallas.stats import scatter_stats


@pytest.mark.parametrize(
    "n,d,xy",
    [
        (3000, 16, 256),  # ragged sample tiles
        (1024, 8, 64),  # exact tile fit
        (10, 3, 5),  # tiny
    ],
)
def test_scatter_stats_matches_numpy(n, d, xy):
    rng = np.random.RandomState(n)
    x = rng.rand(n, d).astype(np.float32)
    m = (rng.rand(n) > 0.1).astype(np.float32)
    idx = rng.randint(xy, size=n).astype(np.int32)
    S, cnt = scatter_stats(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(idx), xy, interpret=True
    )
    aug = np.concatenate([x, np.ones((n, 1), np.float32)], 1) * m[:, None]
    ref = np.zeros((xy, d + 1), np.float64)
    np.add.at(ref, idx, aug)
    np.testing.assert_allclose(np.asarray(S), ref[:, :d], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cnt), ref[:, d], rtol=1e-6)


def test_scatter_stats_all_masked():
    S, cnt = scatter_stats(
        jnp.ones((64, 4)), jnp.zeros(64), jnp.zeros(64, jnp.int32), 16,
        interpret=True,
    )
    assert float(jnp.abs(S).sum()) == 0.0
    assert float(cnt.sum()) == 0.0


def test_fits_vmem_gate():
    from xpysom_dask_tpu.ops.pallas.stats import fits_vmem

    assert fits_vmem(16384, 64)  # flagship 128x128 @ D=64: 4.3 MB
    assert not fits_vmem(65536, 64)  # 256x256 @ D=64: 17 MB
    assert not fits_vmem(16384, 512)  # 33.6 MB


def test_return_acc_matches_split():
    import jax.numpy as jnp
    from xpysom_dask_tpu.ops.pallas.stats import scatter_stats

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(200, 5).astype(np.float32))
    m = jnp.asarray((rng.rand(200) > 0.2).astype(np.float32))
    idx = jnp.asarray(rng.randint(37, size=200).astype(np.int32))
    S, cnt = scatter_stats(x, m, idx, 37, interpret=True)
    acc = scatter_stats(x, m, idx, 37, interpret=True, return_acc=True)
    np.testing.assert_array_equal(np.asarray(acc[:, :5]), np.asarray(S))
    np.testing.assert_array_equal(np.asarray(acc[:, 5]), np.asarray(cnt))


def test_core_gate_off_on_cpu():
    from xpysom_dask_tpu import core

    # tests force the CPU backend, so the gate must refuse regardless of
    # the fit (the kernel is TPU-only)
    assert not core._use_mosaic_scatter(None, 16384, 64)


def test_core_gate_requires_env_opt_in(monkeypatch):
    """The Mosaic scatter lost the in-context ranking to the XLA
    scatter-add (BASELINE.md round 3): it must never route without the
    explicit XPYSOM_MOSAIC_SCATTER benchmark hook."""
    from xpysom_dask_tpu import core

    monkeypatch.delenv("XPYSOM_MOSAIC_SCATTER", raising=False)
    assert not core._use_mosaic_scatter(None, 128, 8)
    # and even WITH the hook, the CPU backend still refuses
    monkeypatch.setenv("XPYSOM_MOSAIC_SCATTER", "1")
    assert not core._use_mosaic_scatter(None, 128, 8)
