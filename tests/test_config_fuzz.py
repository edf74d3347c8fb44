"""Random-configuration fuzz: one exactly-comparable epoch (before any
near-tie chaos can compound) across random draws of the full constructor
space, checked against the golden reference algorithm."""

import numpy as np
import pytest

from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu.models.golden import GoldenSom

RNG = np.random.RandomState(123)


def _random_config(i):
    rng = np.random.RandomState(1000 + i)
    topology = rng.choice(["rectangular", "hexagonal"])
    neighborhoods = (
        ["gaussian", "mexican_hat", "bubble", "triangle"]
        if topology == "rectangular"
        else ["gaussian", "mexican_hat", "bubble"]
    )
    return dict(
        x=int(rng.randint(2, 9)),
        y=int(rng.randint(2, 9)),
        input_len=int(rng.randint(1, 7)),
        # sigma*std_coeff small enough creates an "underflow ring" where
        # f32 exp is subnormal: XLA flushes to zero (den==0, keep weight)
        # while NumPy keeps subnormals (den ~1e-40, fill with a noise
        # ratio) — both arbitrary; stay out of that degenerate regime.
        sigma=float(rng.uniform(1.0, 3.0)),
        sigmaN=float(rng.uniform(0.1, 1.0)),
        learning_rate=float(rng.uniform(0.1, 1.0)),
        learning_rateN=float(rng.uniform(0.01, 0.1)),
        decay_function=str(rng.choice(["exponential", "asymptotic", "linear"])),
        neighborhood_function=str(rng.choice(neighborhoods)),
        std_coeff=float(rng.uniform(0.3, 1.5)),
        topology=str(topology),
        compact_support=bool(rng.rand() < 0.5),
        random_seed=int(rng.randint(0, 10000)),
    )


@pytest.mark.parametrize("i", range(20))
def test_random_config_one_epoch_parity(i):
    cfg = _random_config(i)
    n = int(np.random.RandomState(i).randint(20, 300))
    data = np.random.RandomState(2000 + i).rand(n, cfg["input_len"]).astype(
        np.float32
    )

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = XPySom(n_parallel=32, **cfg)
    gold = GoldenSom(
        cfg["x"],
        cfg["y"],
        cfg["input_len"],
        sigma=cfg["sigma"],
        sigmaN=cfg["sigmaN"],
        learning_rate=cfg["learning_rate"],
        learning_rateN=cfg["learning_rateN"],
        decay=cfg["decay_function"],
        neighborhood=cfg["neighborhood_function"],
        std_coeff=cfg["std_coeff"],
        topology=cfg["topology"],
        compact_support=cfg["compact_support"],
        random_seed=cfg["random_seed"],
    )
    np.testing.assert_array_equal(ours._weights, gold.weights)

    total = 5
    ours.train(data, total, iter_beg=0, iter_end=1)
    gold.train(data, total, iter_beg=0, iter_end=1)
    np.testing.assert_allclose(
        ours._weights,
        gold.weights,
        rtol=2e-3,
        atol=2e-4,
        err_msg=f"config {cfg}",
    )
