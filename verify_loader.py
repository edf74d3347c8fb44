"""Verify drive: native-loader hardening (real TPU).

FileSource streamed training == resident; predict streamed == resident;
rows<=0 raises at the source boundary and via train's superbatch_rows;
xs_open rejects invalid geometry; short-file error still raises with
the specific native message.
"""
import numpy as np, os, tempfile, jax
from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu.parallel.pipeline import ArraySource, FileSource
from xpysom_dask_tpu.utils.native import load_chunkloader, native_available

print("backend:", jax.default_backend())
assert jax.default_backend() == "tpu"
assert native_available(), "native loader must be available here"

rng = np.random.RandomState(1)
data = rng.rand(3000, 6).astype(np.float32)
td = tempfile.mkdtemp()
f = os.path.join(td, "data.f32"); data.tofile(f)

resident = XPySom(6, 6, 6, sigma=2.0, random_seed=3)
resident.train(data, 5)
streamed = XPySom(6, 6, 6, sigma=2.0, random_seed=3)
streamed.train(FileSource(f, 3000, 6), 5)
np.testing.assert_allclose(streamed.get_weights(), resident.get_weights(),
                           rtol=1e-4, atol=1e-5)
print("streamed==resident train OK")

np.testing.assert_array_equal(
    resident.predict(FileSource(f, 3000, 6)), resident.predict(data))
print("streamed==resident predict OK")

for bad in (0, -4):
    try:
        next(FileSource(f, 3000, 6).superbatches(bad)); raise SystemExit("no raise")
    except ValueError as e:
        assert "superbatch rows" in str(e)
    try:
        next(ArraySource(data).superbatches(bad)); raise SystemExit("no raise")
    except ValueError as e:
        assert "superbatch rows" in str(e)
print("rows<=0 contract OK")

lib = load_chunkloader()
assert lib.xs_open(f.encode(), 3000, 6, 0, 2) is None
assert lib.xs_open(f.encode(), 3000, 6, -4, 2) is None
print("xs_open geometry OK")

# short-file: declare more rows than the file holds -> specific error
try:
    XPySom(4, 4, 6, random_seed=1).train(FileSource(f, 5000, 6), 1)
    raise SystemExit("expected short-file error")
except Exception as e:
    assert "short file" in str(e) or "delivered" in str(e), e
print("short-file error OK:", )

print("VERIFY_LOADER_OK")
