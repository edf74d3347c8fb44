"""Generated-input distance-kernel tests, modeled on the reference's
``xpysom_dask/test_distances.py``: exhaustive binary vectors for small
dims plus seeded fuzz inputs, all checked against a scalar per-pair golden
definition."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.models.golden import golden_distance
from xpysom_dask_tpu.ops import distances as D


def int_to_binary_array(v, l):
    return [(v >> i) & 1 for i in range(l)]


def get_inputs():
    """Exhaustive binary inputs for dims 1-3 in several matrix shapes plus
    seeded random floats (reference test_distances.py:37-88)."""
    inputs = []
    for l in range(1, 4):
        xys = []
        for xb in range(2**l):
            x = int_to_binary_array(xb, l)
            for yb in range(2**l):
                y = int_to_binary_array(yb, l)
                xys.append((x, y))
        inputs += [([x], [y]) for x, y in xys[:: max(1, len(xys) // 16)]]
        inputs.append(([xys[0][0]], [y for _x, y in xys]))
        inputs.append(([x for x, _y in xys], [xys[0][1]]))
        inputs.append(([x for x, _y in xys], [y for _x, y in xys]))
        inputs.append(([x for x, _y in xys], [y for _x, y in xys[::2]]))
        inputs.append(([x for x, _y in xys[::2]], [y for _x, y in xys]))
    rng = np.random.RandomState(0)
    for n in (2, 7):
        for m in (3, 11):
            for l in (5, 13):
                inputs.append((rng.rand(n, l).tolist(), rng.rand(m, l).tolist()))
    return inputs


INPUTS = get_inputs()

CASES = [
    (D.euclidean_squared_distance_part, "euclidean", {}),
    (D.euclidean_squared_distance, "euclidean_no_opt", {}),
    (D.euclidean_distance, "euclidean_full", {}),
    (D.cosine_distance, "cosine", {}),
    (D.manhattan_distance, "manhattan", {}),
    (D.manhattan_distance_no_opt, "manhattan", {}),
    (D.norm_p_power_distance, "norm_p", {"p": 2}),
    (D.norm_p_power_distance, "norm_p", {"p": 3}),
    (D.norm_p_power_distance, "norm_p", {"p": 4}),
    (D.norm_p_power_distance_generic, "norm_p", {"p": 2}),
]


@pytest.mark.parametrize("fn,golden_name,kwargs", CASES)
def test_distance_parity(fn, golden_name, kwargs):
    for x, y in INPUTS:
        xa = jnp.asarray(np.asarray(x, dtype=np.float32))
        ya = jnp.asarray(np.asarray(y, dtype=np.float32))
        got = np.asarray(fn(xa, ya, **kwargs))
        want = golden_distance(golden_name, x, y, **kwargs)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_w_sq_cache_equivalent():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(17, 9).astype(np.float32))
    w = jnp.asarray(rng.rand(30, 9).astype(np.float32))
    w_sq = jnp.sum(jnp.square(w), axis=1, keepdims=True)
    for fn in (
        D.euclidean_squared_distance_part,
        D.euclidean_squared_distance,
        D.cosine_distance,
    ):
        np.testing.assert_allclose(
            np.asarray(fn(x, w)), np.asarray(fn(x, w, w_sq)), rtol=1e-6
        )


def test_norm_p_even_requires_even():
    x = jnp.ones((2, 3))
    with pytest.raises(ValueError):
        D.norm_p_power_distance_even(x, x, p=3)


def test_dispatcher():
    with pytest.raises(ValueError):
        D.DistanceFunction("ridethewave", {})
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(5, 4).astype(np.float32))
    w3d = jnp.asarray(rng.rand(3, 2, 4).astype(np.float32))
    df = D.DistanceFunction("euclidean", {})
    assert df.can_cache
    got = np.asarray(df(x, w3d))
    want = golden_distance(
        "euclidean", np.asarray(x), np.asarray(w3d).reshape(-1, 4)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert not D.DistanceFunction("manhattan", {}).can_cache
    assert np.asarray(D.DistanceFunction("norm_p", {"p": 3})(x, w3d)).shape == (5, 6)
