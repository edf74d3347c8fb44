"""Long-schedule stability: hundreds of epochs in one compiled run must
stay finite and converge for every neighborhood family — including the
plateau kernels (bubble/triangle) whose den==0 keep-weight branch and the
late-schedule sigma underflow are the numerically delicate paths."""

import numpy as np
import pytest

from xpysom_dask_tpu import XPySom


@pytest.mark.parametrize(
    "neighborhood", ["gaussian", "mexican_hat", "bubble", "triangle"]
)
def test_200_epoch_soak_finite_and_converged(neighborhood):
    rng = np.random.RandomState(0)
    centers = rng.rand(4, 6) * 5
    data = np.concatenate(
        [c + 0.15 * rng.randn(120, 6) for c in centers]
    ).astype(np.float32)
    som = XPySom(
        7,
        7,
        6,
        sigma=3.0,
        neighborhood_function=neighborhood,
        random_seed=2,
    )
    q0 = som.quantization_error(data)
    som.train(data, 200)
    w = np.asarray(som._weights)
    assert np.isfinite(w).all(), f"{neighborhood}: non-finite weights"
    q1 = som.quantization_error(data)
    assert np.isfinite(q1) and q1 < q0, (neighborhood, q0, q1)


def test_segmented_equals_straight_through_long():
    rng = np.random.RandomState(1)
    data = rng.rand(400, 5).astype(np.float32)
    a = XPySom(6, 6, 5, sigma=2.0, random_seed=4)
    a.train(data, 120)
    b = XPySom(6, 6, 5, sigma=2.0, random_seed=4)
    for beg in range(0, 120, 40):  # 3 resume segments
        b.train(data, 120, iter_beg=beg, iter_end=beg + 40)
    np.testing.assert_allclose(
        np.asarray(a._weights), np.asarray(b._weights), rtol=1e-5, atol=1e-6
    )
