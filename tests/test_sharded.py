"""Multi-device data-parallel tests on the 8-virtual-CPU-device mesh:
sharded training/inference must match single-device results (the test the
reference never had — SURVEY.md §4 'Distributed testing: none')."""

import numpy as np
import pytest
import jax

from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu.parallel.mesh import resolve_mesh


def _need_devices(n=2):
    if len(jax.devices()) < n:
        pytest.skip(f"needs >= {n} devices")


def test_mesh_resolution():
    _need_devices(2)
    assert resolve_mesh(None) is None
    m = resolve_mesh("auto")
    assert m.axis_names == ("data",)
    m2 = resolve_mesh(2)
    assert m2.devices.size == 2
    assert resolve_mesh(m) is m
    with pytest.raises(ValueError):
        resolve_mesh(10**6)
    with pytest.raises(TypeError):
        resolve_mesh(3.5)


def test_sharded_train_matches_single():
    _need_devices(8)
    rng = np.random.RandomState(0)
    data = rng.rand(1000, 4).astype(np.float32)
    single = XPySom(6, 6, 4, random_seed=1, n_parallel=64)
    sharded = XPySom(6, 6, 4, random_seed=1, n_parallel=64, mesh="auto")
    single.train(data, 4)
    sharded.train(data, 4)
    np.testing.assert_allclose(sharded._weights, single._weights, rtol=1e-4, atol=1e-5)


def test_sharded_inference_matches_single():
    _need_devices(8)
    rng = np.random.RandomState(3)
    data = rng.rand(333, 5).astype(np.float32)
    single = XPySom(5, 7, 5, random_seed=2, n_parallel=32)
    sharded = XPySom(5, 7, 5, random_seed=2, n_parallel=32, mesh=8)
    np.testing.assert_array_equal(sharded.predict(data), single.predict(data))
    np.testing.assert_allclose(
        sharded.quantization_error(data), single.quantization_error(data), rtol=1e-6
    )
    np.testing.assert_allclose(
        sharded.topographic_error(data), single.topographic_error(data), rtol=1e-6
    )


def test_sharded_hexagonal():
    _need_devices(4)
    rng = np.random.RandomState(5)
    data = rng.rand(256, 3).astype(np.float32)
    single = XPySom(5, 5, 3, topology="hexagonal", random_seed=4, n_parallel=32)
    sharded = XPySom(
        5, 5, 3, topology="hexagonal", random_seed=4, n_parallel=32, mesh=4
    )
    single.train(data, 3)
    sharded.train(data, 3)
    np.testing.assert_allclose(sharded._weights, single._weights, rtol=1e-4, atol=1e-5)


def test_use_dask_compat_maps_to_mesh():
    _need_devices(2)
    with pytest.warns(UserWarning):
        som = XPySom(4, 4, 2, use_dask=True, random_seed=0)
    assert som._mesh is not None
    data = np.random.RandomState(1).rand(64, 2).astype(np.float32)
    som.train(data, 2)  # must run end-to-end


def test_sharded_pickle_roundtrip(tmp_path):
    _need_devices(2)
    import pickle

    som = XPySom(4, 4, 2, mesh=2, random_seed=0)
    data = np.random.RandomState(2).rand(64, 2).astype(np.float32)
    som.train(data, 2)
    blob = pickle.dumps(som)
    loaded = pickle.loads(blob)
    np.testing.assert_array_equal(loaded._weights, som._weights)
    assert loaded._mesh is not None  # re-resolved from mesh_arg
    loaded.train(data, 2)
