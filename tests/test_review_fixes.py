"""Regression tests for the round-2 review findings (memory budgeting of
matrix-materializing paths, distance_from_weights weights=, tiny-map
grid-mesh topographic error)."""

import numpy as np
import pytest

from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu.utils.hw import default_n_parallel


def test_distance_from_weights_honors_weights_argument():
    rng = np.random.RandomState(0)
    data = rng.rand(40, 6).astype(np.float32)
    other = rng.rand(12, 6).astype(np.float32)  # 4x3 grid worth of rows
    som = XPySom(4, 3, 6, random_seed=1)
    d_own = som.distance_from_weights(data)
    d_other = som.distance_from_weights(data, weights=other)
    ref = np.linalg.norm(
        data[:, None].astype(np.float64) - other[None].astype(np.float64),
        axis=-1,
    )
    np.testing.assert_allclose(d_other, ref, rtol=1e-5, atol=1e-5)
    assert not np.allclose(d_own, d_other)


def test_matrix_chunk_budgeted_on_auto_but_honors_explicit():
    som = XPySom(4, 4, 3, random_seed=1)  # auto n_parallel
    assert not som._n_parallel_explicit
    # simulate the fused TPU default landing on a huge codebook
    som._x = som._y = 512
    som._n_parallel = 16384
    budget = default_n_parallel(512 * 512, fused=False)
    assert som._matrix_chunk == min(16384, budget)
    assert som._matrix_chunk * 512 * 512 <= (1 << 24) + 256 * 512 * 512

    som2 = XPySom(4, 4, 3, n_parallel=16384, random_seed=1)
    assert som2._n_parallel_explicit
    assert som2._matrix_chunk == 16384  # user's memory bound is theirs


def test_wide_feature_auto_chunk_stays_budgeted(monkeypatch):
    # input_len > _PALLAS_MAX_D means the XLA fallback materializes the
    # distance matrix even for euclidean: the auto default must use the
    # element budget, not the fused 16384 (regression: ctor consulted
    # only the distance name)
    from xpysom_dask_tpu import core

    monkeypatch.setattr(
        "xpysom_dask_tpu.utils.hw.backend_kind", lambda: "tpu"
    )
    som = XPySom(64, 64, core._PALLAS_MAX_D + 8, random_seed=1)
    assert som._n_parallel <= default_n_parallel(64 * 64, backend="tpu")
    monkeypatch.setenv("XPYSOM_TPU_NO_PALLAS", "1")
    som2 = XPySom(64, 64, 8, random_seed=1)
    assert som2._n_parallel <= default_n_parallel(64 * 64, backend="tpu")


def test_grid_mesh_tiny_map_topographic_error_falls_back():
    import jax

    from xpysom_dask_tpu.parallel import make_grid_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.RandomState(2)
    data = rng.rand(200, 5).astype(np.float32)
    mesh = make_grid_mesh(2, 2)
    # 2x1 map over 2 model shards -> 1 codebook row per shard: the sharded
    # top-2 merge is undefined, must fall back to the replicated path
    som = XPySom(2, 1, 5, sigma=1.0, random_seed=3, mesh=mesh)
    te = som.topographic_error(data)
    ref = XPySom(2, 1, 5, sigma=1.0, random_seed=3).topographic_error(data)
    assert te == pytest.approx(ref)
