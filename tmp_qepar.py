import numpy as np
from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu.models.golden import GoldenSom
rng = np.random.RandomState(2)
data = rng.rand(50000, 32).astype(np.float32)
som = XPySom(30, 30, 32, random_seed=8)
gold = GoldenSom(30, 30, 32, random_seed=8)
qe_t = som.quantization_error(data)
qe_g = gold.quantization_error(data)
print(f"QE(TPU)={qe_t:.9f} QE(f64 golden)={qe_g:.9f}", flush=True)
print(f"relative parity: {abs(qe_t-qe_g)/qe_g:.2e}  (target <= 1e-5)", flush=True)
