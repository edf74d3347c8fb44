# On-chip leg of the round-5 third-review verify drive.
import numpy as np, jax, time
from xpysom_dask_tpu import XPySom, SomPopulation
from xpysom_dask_tpu.parallel.pipeline import ArraySource
print("backend:", jax.default_backend(), jax.devices())
t0 = time.time()
rng = np.random.RandomState(0)
data = np.concatenate([c + 0.25*rng.randn(500,4) for c in rng.rand(3,4)*4]).astype(np.float32)
som = XPySom(8, 8, 4, sigma=2.5, random_seed=1)
q0 = som.quantization_error(data); som.train(data, 20)
q1 = som.quantization_error(data)
assert q1 < q0/3, (q0, q1)
te_res = som.topographic_error(data)
te_str = som.topographic_error(ArraySource(data))   # hoisted-upload path
assert abs(te_str - te_res) < 1e-9, (te_str, te_res)
print("TE streamed == resident on-chip: %.4f (QE %.4f->%.4f) [%.0fs]" % (te_res, q0, q1, time.time()-t0))
pop = SomPopulation(3, 6, 6, 4, random_seed=7)
pop.train(data, 5, strategy="fused")                 # member-sized chunks on real Mosaic
qs = pop.quantization_errors(data)
popb = SomPopulation(3, 6, 6, 4, random_seed=7)
popb.train(data, 5, strategy="batched")
assert np.allclose(pop.weights, popb.weights, atol=2e-3), np.abs(pop.weights-popb.weights).max()
print("population fused(member-chunks) == batched on-chip, QE:", qs, "[%.0fs]" % (time.time()-t0))
print("ON-CHIP DRIVE GREEN")
