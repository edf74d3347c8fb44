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


@needs_native
def test_native_short_file_raises(tmp_path):
    """A file shorter than the declared n_rows must raise (review r4:
    the reader treated short reads as clean EOF and silently truncated
    the epoch; the memmap fallback raises for the same inputs)."""
    p = tmp_path / "short.f32"
    np.random.RandomState(0).rand(10, 4).astype(np.float32).tofile(p)
    src = FileSource(str(p), 16, 4)  # declares 16 rows, file has 10
    with pytest.raises(OSError, match="short file"):
        list(src.superbatches(8))


@needs_native
def test_native_reset_protocol_recovers(tmp_path):
    """xs_reset must clear a previous epoch's error/held-buffer state
    (review r4: `error` was never cleared, so the documented rewind
    protocol returned -1 forever after one failed epoch). Driven at the
    ctypes ABI level: epoch 1 fails on a short file, the file is then
    completed, and xs_reset must stream the full epoch cleanly."""
    import ctypes

    from xpysom_dask_tpu.utils.native import load_chunkloader

    lib = load_chunkloader()
    p = tmp_path / "grow.f32"
    data = np.random.RandomState(1).rand(12, 4).astype(np.float32)
    data[:7].tofile(p)  # short: 7 of 12 declared rows

    h = lib.xs_open(str(p).encode(), 12, 4, 5, 3)
    assert h
    try:
        rows = ctypes.c_int64(0)
        seen = 0
        while True:
            lib.xs_acquire(h, ctypes.byref(rows))
            if rows.value <= 0:
                break
            seen += rows.value
            lib.xs_release(h)
        assert rows.value == -1  # the short file is an error...
        assert b"short file" in lib.xs_error(h)
        data.tofile(p)  # ...the file is repaired...
        lib.xs_reset(h)  # ...and the rewind protocol must recover
        got = []
        while True:
            ptr = lib.xs_acquire(h, ctypes.byref(rows))
            if rows.value < 0:
                raise AssertionError("reset did not clear the error state")
            if rows.value == 0:
                break
            got.append(
                np.ctypeslib.as_array(ptr, shape=(rows.value, 4)).copy()
            )
            lib.xs_release(h)
        np.testing.assert_array_equal(np.concatenate(got), data)
    finally:
        lib.xs_close(h)


# -- round-5 close-out review: invalid superbatch geometry -------------------


def test_nonpositive_superbatch_rows_raise(dataset):
    """rows<=0 must raise eagerly at the source boundary — the native
    loader used to deliver a silent rows==0 EOF (zero of the declared
    rows, no error), and ArraySource's range() raised a cryptic step
    error."""
    from xpysom_dask_tpu.parallel.pipeline import ArraySource

    f, data = dataset
    for bad in (0, -4):
        with pytest.raises(ValueError, match="superbatch rows"):
            next(FileSource(f, 1000, 6).superbatches(bad))
        with pytest.raises(ValueError, match="superbatch rows"):
            next(ArraySource(data).superbatches(bad))


def test_train_streaming_rejects_nonpositive_superbatch_rows(dataset):
    from xpysom_dask_tpu.core import SomSpec
    from xpysom_dask_tpu.parallel.pipeline import ArraySource, train_streaming

    f, data = dataset
    spec = SomSpec(4, 4, 6, 2.0, 1.0, 0.5, 0.01)
    w = np.zeros((4, 4, 6), np.float32)
    with pytest.raises(ValueError, match="superbatch rows"):
        train_streaming(spec, w, ArraySource(data), 1, superbatch_rows=0)


@needs_native
def test_xs_open_rejects_invalid_geometry(dataset):
    """The C ABI itself rejects geometry that would silently stream
    nothing: sb_rows<=0, n_cols<=0, negative n_rows -> nullptr."""
    import ctypes

    from xpysom_dask_tpu.utils.native import load_chunkloader

    f, _ = dataset
    lib = load_chunkloader()
    path = str(f).encode()
    assert lib.xs_open(path, 1000, 6, 0, 2) is None
    assert lib.xs_open(path, 1000, 6, -4, 2) is None
    assert lib.xs_open(path, 1000, 0, 128, 2) is None
    assert lib.xs_open(path, -1, 6, 128, 2) is None
    # valid geometry still opens (and xs_error is empty + stable)
    h = lib.xs_open(path, 1000, 6, 128, 2)
    assert h is not None
    err_fn = getattr(lib, "xs_error", None)
    if err_fn is not None:
        assert (err_fn(h) or b"") == b""
    lib.xs_close(h)


@needs_native
def test_xs_open_rejects_size_overflow(dataset):
    """Magnitude guard (round-5 review): superbatch_rows * n_cols *
    sizeof(float) wrapping size_t must be rejected at xs_open — a
    wrapped product would allocate (almost) nothing and fread would
    then corrupt the heap in native code."""
    from xpysom_dask_tpu.utils.native import load_chunkloader

    f, _ = dataset
    lib = load_chunkloader()
    path = str(f).encode()
    # 2^40 * 2^24 * 4 == 2^66 wraps 64-bit size_t to 0
    assert lib.xs_open(path, 1000, 1 << 24, 1 << 40, 2) is None
    # just-wrapping boundary: sb * nc * 4 == 2^64 exactly
    assert lib.xs_open(path, 1000, 1 << 31, 1 << 31, 2) is None
    # big-but-representable products are rejected by the allocator
    # (bad_alloc -> nullptr), never by wraparound succeeding
    assert lib.xs_open(path, 1000, 1 << 20, 1 << 30, 2) is None
