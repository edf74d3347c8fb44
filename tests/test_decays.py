"""Decay-schedule parity vs the scalar golden definitions
(reference decays.py:4-65)."""

import numpy as np
import pytest

from xpysom_dask_tpu.models.golden import golden_decay
from xpysom_dask_tpu.ops.decays import DECAY_REGISTRY, make_decay


@pytest.mark.parametrize("name", ["exponential", "asymptotic", "linear"])
@pytest.mark.parametrize(
    "val0,valN", [(0.5, 0.01), (1.0, 1.0), (3.0, 0.0), (2.5, 0.3)]
)
@pytest.mark.parametrize("T", [1, 2, 10, 100])
def test_decay_parity(name, val0, valN, T):
    fn = DECAY_REGISTRY[name]
    for t in range(T):
        got = float(fn(val0, valN, t, T))
        want = golden_decay(name, val0, valN, t, T)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_decay_traced_iteration():
    """One compiled function serves every epoch: t may be traced."""
    import jax
    import jax.numpy as jnp

    for name in DECAY_REGISTRY:
        fn = jax.jit(lambda t, f=DECAY_REGISTRY[name]: f(0.5, 0.01, t, 10))
        for t in range(10):
            np.testing.assert_allclose(
                float(fn(jnp.int32(t))),
                golden_decay(name, 0.5, 0.01, t, 10),
                rtol=1e-5,
            )


def test_make_decay_validation():
    with pytest.raises(ValueError):
        make_decay("boooom")
    assert make_decay("linear") is DECAY_REGISTRY["linear"]


def test_linear_decay_single_epoch():
    assert float(DECAY_REGISTRY["linear"](0.7, 0.1, 0, 1)) == pytest.approx(0.7)
