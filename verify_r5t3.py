# CPU public-API drive for the third-review fixes (relay wedged; TPU
# drive to follow when the probe comes back).
import os
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, pickle
from xpysom_dask_tpu import XPySom, SomPopulation
from xpysom_dask_tpu.parallel.pipeline import ArraySource
print("backend:", jax.default_backend(), len(jax.devices()), "devices")

rng = np.random.RandomState(0)
data = np.concatenate([c + 0.25*rng.randn(500,4) for c in rng.rand(3,4)*4]).astype(np.float32)

# 1. base recipe
som = XPySom(8, 8, 4, sigma=2.5, random_seed=1)
q0 = som.quantization_error(data); som.train(data, 20)
assert som.quantization_error(data) < q0/3
som.winner(data[:5]); som.distance_map()
te_res = som.topographic_error(data)
assert pickle.loads(pickle.dumps(som)).winner(data[:3]) == som.winner(data[:3])
print("recipe OK, TE resident:", te_res)

# 2. streaming TE (hoisted upload) == resident
te_str = som.topographic_error(ArraySource(data))
assert abs(te_str - te_res) < 1e-9, (te_str, te_res)
print("streaming TE == resident:", te_str)

# 3. tiny explicit n_parallel honored end-to-end
s4 = XPySom(8, 8, 4, n_parallel=4, random_seed=1)
s4.train(data, 5)
w4 = s4.winner(data[:10]); q4 = s4.quantization_error(data)
ch, _, _ = s4._chunked(data, bucket=True)
assert ch.shape[1] <= 4, ch.shape
print("n_parallel=4 honored (chunk=%d), QE %.4f" % (ch.shape[1], q4))

# 4. mesh='auto' vs mesh=None parity (exercises grid_sharded refactor path too)
# clustered data diverges chaotically via BMU near-ties (CLAUDE.md:
# compare QE there); weight parity is pinned on uniform data like
# tests/test_sharded.py
udata = np.random.RandomState(9).rand(1000, 4).astype(np.float32)
sa = XPySom(8, 8, 4, sigma=2.5, random_seed=1, mesh='auto'); sa.train(udata, 6)
sn = XPySom(8, 8, 4, sigma=2.5, random_seed=1, mesh=None);  sn.train(udata, 6)
assert np.allclose(sa._weights, sn._weights, atol=1e-4), np.abs(sa._weights-sn._weights).max()
ca = XPySom(8, 8, 4, sigma=2.5, random_seed=1, mesh='auto'); ca.train(data, 20)
cn = XPySom(8, 8, 4, sigma=2.5, random_seed=1, mesh=None);  cn.train(data, 20)
qa, qn = ca.quantization_error(data), cn.quantization_error(data)
assert abs(qa-qn) < 0.02*max(qa,qn) + 1e-3, (qa, qn)
print("mesh auto == none OK (uniform weights, clustered QE %.4f/%.4f)" % (qa, qn))

# 4b. grid (data, model) mesh streaming pipeline — uses make_update_fn_2d
from xpysom_dask_tpu.parallel.grid_sharded import make_grid_mesh
gm = make_grid_mesh(4, 2)
sg = XPySom(8, 8, 4, sigma=2.5, random_seed=1, mesh=gm)
sg.train(ArraySource(udata), 6)          # streaming -> stats + update_fn_2d
assert np.allclose(sg._weights, sn._weights, atol=1e-4), np.abs(sg._weights-sn._weights).max()
te_g = sg.topographic_error(ArraySource(udata))
print("grid-mesh streamed train == resident unsharded OK; grid TE", te_g)

# 5. population: fused member-sized chunks train + match batched; streaming QE
pop = SomPopulation(3, 6, 6, 4, random_seed=7)
pop.train(data, 5, strategy="fused")
popb = SomPopulation(3, 6, 6, 4, random_seed=7)
popb.train(data, 5, strategy="batched")
assert np.allclose(pop.weights, popb.weights, atol=2e-4)
qr = pop.quantization_errors(data); qs = pop.quantization_errors(ArraySource(data))
assert np.allclose(qr, qs, atol=1e-9)
# streaming train through the fused (member-sized) program
pops = SomPopulation(3, 6, 6, 4, random_seed=7)
pops.train(ArraySource(data), 5)          # auto -> fused (108 nodes)
print("population fused/batched/streaming OK, QE:", qr)

# 6. error contract
try:
    som.winner(np.zeros((3, 7), np.float32)); raise SystemExit("no error!")
except ValueError as e:
    assert "features" in str(e)
print("ALL CPU DRIVES GREEN")
