"""Native C++ chunk-loader tests: build, stream, parity with the resident
path, multi-epoch reuse."""

import numpy as np
import pytest

from xpysom_dask_tpu.utils.native import native_available
from xpysom_dask_tpu.parallel.pipeline import FileSource

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(1000, 6).astype(np.float32)
    f = tmp_path / "data.f32"
    data.tofile(f)
    return f, data


@needs_native
def test_native_stream_matches_file(dataset):
    f, data = dataset
    src = FileSource(f, 1000, 6)
    got = np.concatenate(list(src.superbatches(128)))
    np.testing.assert_array_equal(got, data)


@needs_native
def test_native_stream_multiple_epochs(dataset):
    f, data = dataset
    src = FileSource(f, 1000, 6)
    for _ in range(3):  # each epoch re-opens; full pass each time
        got = np.concatenate(list(src.superbatches(333)))
        np.testing.assert_array_equal(got, data)


@needs_native
def test_native_training_matches_resident(dataset):
    from xpysom_dask_tpu import XPySom

    f, data = dataset
    resident = XPySom(5, 5, 6, random_seed=1, n_parallel=64)
    resident.train(data, 3)
    streamed = XPySom(5, 5, 6, random_seed=1, n_parallel=64)
    streamed.train(FileSource(f, 1000, 6), 3)
    np.testing.assert_allclose(
        streamed._weights, resident._weights, rtol=1e-4, atol=1e-5
    )


def test_filesource_memmap_fallback(dataset, monkeypatch):
    f, data = dataset
    src = FileSource(f, 1000, 6)
    monkeypatch.setattr(src, "_lib", None)  # force fallback
    got = np.concatenate(list(src.superbatches(256)))
    np.testing.assert_array_equal(got, data)
