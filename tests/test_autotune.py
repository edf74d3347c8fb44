"""Autotune mechanics + XPYSOM_BMU_TILES env hook (CPU; on-chip timing is
exercised in tests_tpu/ and recorded in BASELINE.md)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu
from xpysom_dask_tpu.ops.pallas.autotune import TuneResult, autotune_bmu_tiles


def test_env_tiles_parse(monkeypatch):
    monkeypatch.setenv("XPYSOM_BMU_TILES", "512x1024")
    assert pl_bmu._env_tiles() == (512, 1024)
    monkeypatch.setenv("XPYSOM_BMU_TILES", "1024X2048")
    assert pl_bmu._env_tiles() == (1024, 2048)
    monkeypatch.delenv("XPYSOM_BMU_TILES")
    assert pl_bmu._env_tiles() is None


@pytest.mark.parametrize("bad", ["banana", "100x100", "0x128", "8x", "8x-128"])
def test_env_tiles_invalid_warns_and_ignores(monkeypatch, bad):
    monkeypatch.setenv("XPYSOM_BMU_TILES", bad)
    with pytest.warns(UserWarning, match="XPYSOM_BMU_TILES"):
        assert pl_bmu._env_tiles() is None


def test_env_tiles_used_by_kernel(monkeypatch):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(64, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(96, 8).astype(np.float32))
    idx_def, val_def = pl_bmu.bmu_euclidean(x, w, interpret=True)
    monkeypatch.setenv("XPYSOM_BMU_TILES", "8x128")
    idx_env, val_env = pl_bmu.bmu_euclidean(x, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_def), np.asarray(idx_env))
    np.testing.assert_allclose(np.asarray(val_def), np.asarray(val_env), rtol=1e-6)
    # explicit tiles= still beats the env var
    idx_exp, _ = pl_bmu.bmu_euclidean(x, w, interpret=True, tiles=(16, 128))
    np.testing.assert_array_equal(np.asarray(idx_def), np.asarray(idx_exp))


def test_autotune_selects_and_applies(monkeypatch):
    monkeypatch.delenv("XPYSOM_BMU_TILES", raising=False)
    cands = [(8, 128), (16, 128)]
    res = autotune_bmu_tiles(
        n=64, xy=256, d=8, candidates=cands, reps=1, apply=True
    )
    assert isinstance(res, TuneResult)
    assert res.tiles in [tuple(c) for c in cands]
    assert set(res.timings_ms) == {tuple(c) for c in cands}
    assert all(t > 0 for t in res.timings_ms.values())
    assert set(res.first_call_s) == {tuple(c) for c in cands}
    assert all(t >= 0 for t in res.first_call_s.values())
    tn, tj = res.tiles
    assert os.environ["XPYSOM_BMU_TILES"] == f"{tn}x{tj}"


def test_autotune_rejects_misaligned_candidate():
    with pytest.raises(ValueError, match="multiple"):
        autotune_bmu_tiles(n=64, xy=256, d=8, candidates=[(7, 128)], reps=1)
