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
    """The env override reaches tile selection via SPEC CONSTRUCTION —
    the one documented env boundary (SomSpec.__post_init__): a spec built
    under XPYSOM_BMU_TILES carries the tiles, and threading them to the
    kernel bypasses the default table (_tiles_for never consulted; the
    argmin is tiling-invariant). The kernel itself is env-blind:
    tiles=None means the default table even with the env set."""
    rng = np.random.RandomState(0)

    def run(n, tiles, expect_table):
        x = jnp.asarray(rng.rand(n, 8).astype(np.float32))
        w = jnp.asarray(rng.rand(96, 8).astype(np.float32))
        if not expect_table:

            def boom(d):
                raise AssertionError("_tiles_for consulted despite tiles=")

            monkeypatch.setattr(pl_bmu, "_tiles_for", boom)
        idx, _ = pl_bmu.bmu_euclidean(x, w, interpret=True, tiles=tiles)
        monkeypatch.undo()
        d64 = -2 * np.asarray(x, np.float64) @ np.asarray(w, np.float64).T + (
            np.asarray(w, np.float64) ** 2
        ).sum(1)
        np.testing.assert_array_equal(np.asarray(idx), d64.argmin(1))

    run(56, tiles=None, expect_table=True)
    monkeypatch.setenv("XPYSOM_BMU_TILES", "8x128")
    from xpysom_dask_tpu.core import SomSpec

    spec = SomSpec(8, 12, 8, 2.0, 0.5, 0.5, 0.01)
    assert spec.bmu_tiles == (8, 128)  # construction-time env resolution
    run(64, tiles=spec.bmu_tiles, expect_table=False)
    # env-blind kernel: fresh shape, env still set, tiles=None -> table
    monkeypatch.setenv("XPYSOM_BMU_TILES", "8x128")
    run(48, tiles=None, expect_table=True)
    # explicit tiles= wins over the env var (fresh shape again)
    monkeypatch.setenv("XPYSOM_BMU_TILES", "banana")  # would warn if read

    def boom(d):
        raise AssertionError("_tiles_for consulted despite explicit tiles")

    monkeypatch.setattr(pl_bmu, "_tiles_for", boom)
    x = jnp.asarray(rng.rand(72, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(96, 8).astype(np.float32))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # env parse warning must NOT fire
        idx, _ = pl_bmu.bmu_euclidean(x, w, interpret=True, tiles=(16, 128))
    assert idx.shape == (72,)


def test_autotune_selects_and_applies(monkeypatch):
    # register the var with monkeypatch FIRST so apply=True's direct
    # os.environ write is rolled back at teardown (delenv of an absent
    # var registers nothing and would leak the setting into later tests)
    monkeypatch.setenv("XPYSOM_BMU_TILES", "")
    monkeypatch.delenv("XPYSOM_BMU_TILES")
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


def test_autotune_inner_scan_mode():
    cands = [(8, 128)]
    res = autotune_bmu_tiles(
        n=64, xy=256, d=8, candidates=cands, reps=1, inner=3
    )
    assert res.tiles == (8, 128)
    assert np.isfinite(res.timings_ms[(8, 128)])


def test_kernel_name_p_roundtrip_interpret():
    """The '<kernel>_<p>' name encoding must survive every float repr —
    rsplit('_') parsing split inside scientific notation ('norm_p_frac_
    1e-05' -> -5.0) and crashed every candidate (review, round 5). The
    prefix parse must hand the exact p to the kernel, including the
    bare-name defaults."""
    from functools import partial

    import jax.numpy as jnp

    from xpysom_dask_tpu.ops.pallas import bmu as pl_bmu
    from xpysom_dask_tpu.ops.pallas.autotune import _kernel_call

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(16, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(32, 8).astype(np.float32))

    call = partial(_kernel_call, x=x, w=w, mode=None, tiles=None, interpret=True)
    for p in (1e-05, 0.5, 1.5, 3.7):
        idx, val = call(kernel=f"norm_p_frac_{p}")
        ref_idx, ref_val = pl_bmu.bmu_norm_p_frac(x, w, p=p, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(val), np.asarray(ref_val))
    for p in (3, 5):
        idx, _ = call(kernel=f"norm_p_odd_{p}")
        ref_idx, _ = pl_bmu.bmu_norm_p_odd(x, w, p=p, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    # bare names keep their documented defaults (p=1.5 / p=3)
    idx, _ = call(kernel="norm_p_frac")
    ref_idx, _ = pl_bmu.bmu_norm_p_frac(x, w, p=1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    idx, _ = call(kernel="norm_p_odd")
    ref_idx, _ = pl_bmu.bmu_norm_p_odd(x, w, p=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_som_autotune_kernel_method(monkeypatch):
    from xpysom_dask_tpu import XPySom, core

    monkeypatch.setenv("XPYSOM_BMU_TILES", "")
    monkeypatch.delenv("XPYSOM_BMU_TILES")
    # the CPU test backend never traces the fused kernel; force the
    # dispatch so the tuner mechanics run (in interpret mode)
    monkeypatch.setattr(
        core, "_pallas_bmu_kind", lambda dist, d, use_pallas=None: "euclidean"
    )
    som = XPySom(4, 4, 3, n_parallel=64, random_seed=1)
    res = som.autotune_kernel(candidates=[(8, 128)], reps=1, inner=2)
    assert res.tiles == (8, 128)
    assert os.environ["XPYSOM_BMU_TILES"] == "8x128"
    assert som._bmu_tiles == (8, 128)  # pinned on the instance/spec too
    assert som._spec.bmu_tiles == (8, 128)
    res2 = som.autotune_kernel(
        apply=False, candidates=[(16, 128)], reps=1, inner=2
    )
    assert os.environ["XPYSOM_BMU_TILES"] == "8x128"  # apply=False: untouched
    assert som._bmu_tiles == (8, 128)
    assert res2.tiles == (16, 128)


def test_som_autotune_kernel_matches_training_shape(monkeypatch):
    """The tuned shape must mirror what training traces: chunk capped at
    the dataset size (then tile-floored) and per-model-shard nodes on
    grid meshes."""
    import jax

    from xpysom_dask_tpu import XPySom, core
    from xpysom_dask_tpu.ops.pallas import autotune as at

    seen = {}

    def spy(n=0, xy=0, d=0, **kw):
        seen.update(n=n, xy=xy, d=d)
        return at.TuneResult((8, 128), {(8, 128): 1.0}, {(8, 128): 0.0})

    monkeypatch.setattr("xpysom_dask_tpu.ops.pallas.autotune.autotune_bmu_tiles", spy)
    monkeypatch.setattr(
        core, "_pallas_bmu_kind", lambda dist, d, use_pallas=None: "euclidean"
    )
    som = XPySom(4, 4, 3, n_parallel=4096, random_seed=1)
    som.autotune_kernel(n_samples=1500)  # < n_parallel -> capped + floored
    assert seen["n"] == max(1024, (1504 // 1024) * 1024)  # round8 then floor

    if len(jax.devices()) >= 4:
        from xpysom_dask_tpu.parallel import make_grid_mesh

        som2 = XPySom(
            8, 4, 3, n_parallel=512, random_seed=1, mesh=make_grid_mesh(2, 2)
        )
        som2.autotune_kernel()
        assert seen["xy"] == 8 * 4 // 2  # per-model-shard nodes


def test_autotune_rejects_misaligned_candidate():
    with pytest.raises(ValueError, match="multiple"):
        autotune_bmu_tiles(n=64, xy=256, d=8, candidates=[(7, 128)], reps=1)
