"""Port of the reference oracle-parity suite (``xpysom_dask/tests.py``):
the hand-planted 5×5×1 fixture with closed-form expected winners/QE/TE,
behavioral tests (validation errors, seeded determinism, QE decrease,
init schemes, distance map, pickling)."""

import os
import pickle
import warnings

import numpy as np
import pytest

from xpysom_dask_tpu import XPySom


@pytest.fixture
def som():
    s = XPySom(5, 5, 1, std_coeff=1)
    # weights normalization at construction (reference tests.py:27-30)
    for i in range(5):
        for j in range(5):
            np.testing.assert_almost_equal(1.0, np.linalg.norm(s._weights[i, j]))
    s._weights = np.zeros((5, 5, 1))
    s._weights[2, 3] = 5.0
    s._weights[1, 1] = 2.0
    return s


def test_unavailable_neigh_function():
    with pytest.raises(ValueError):
        XPySom(5, 5, 1, neighborhood_function="boooom")


def test_unavailable_distance_function():
    with pytest.raises(ValueError):
        XPySom(5, 5, 1, activation_distance="ridethewave")


def test_unavailable_topology():
    with pytest.raises(ValueError):
        XPySom(5, 5, 1, topology="dodecahedral")


def test_hex_triangle_warns_then_raises():
    # reference parity (xpysom.py:206-208 + :227-230): hex+triangle first
    # WARNS, then raises — pin both halves of the contract
    with pytest.raises(ValueError):
        with pytest.warns(Warning, match="triangle"):
            XPySom(5, 5, 1, topology="hexagonal", neighborhood_function="triangle")


def test_win_map(som):
    winners = som.win_map([[5.0], [2.0]])
    assert winners[(2, 3)][0] == [5.0]
    assert winners[(1, 1)][0] == [2.0]


def test_labels_map(som):
    labels_map = som.labels_map([[5.0], [2.0]], ["a", "b"])
    assert labels_map[(2, 3)]["a"] == 1
    assert labels_map[(1, 1)]["b"] == 1
    with pytest.raises(ValueError):
        som.labels_map([[5.0]], ["a", "b"])


def test_activation_response(som):
    response = som.activation_response([[5.0], [2.0]])
    assert response[2, 3] == 1
    assert response[1, 1] == 1
    assert response.sum() == 2


def test_activate(som):
    assert som.activate(5.0).argmin() == 13.0  # unravel(13) = (2,3)


def test_distance_from_weights(som):
    data = np.arange(-5, 5).reshape(-1, 1)
    weights = som._weights.reshape(-1, som._weights.shape[2])
    distances = som.distance_from_weights(data)
    for i in range(len(data)):
        for j in range(len(weights)):
            assert distances[i][j] == np.linalg.norm(data[i] - weights[j])


def test_quantization_error(som):
    assert som.quantization_error([[5], [2]]) == 0.0
    assert som.quantization_error([[4], [1]]) == 1.0


def test_topographic_error(som):
    # 5 has bmu_1=(2,3), bmu_2=(2,4): adjacent (reference tests.py:81-90)
    som._weights[2, 4] = 6.0
    # 15 has bmu_1=(4,4), bmu_2=(0,0): not adjacent
    som._weights[4, 4] = 15.0
    som._weights[0, 0] = 14.0
    assert som.topographic_error([[5]]) == 0.0
    assert som.topographic_error([[15]]) == 1.0


def test_topographic_error_hex():
    s = XPySom(5, 5, 1, topology="hexagonal", std_coeff=1)
    s._weights = np.zeros((5, 5, 1))
    s._weights[2, 3] = 5.0
    s._weights[2, 4] = 6.0
    s._weights[4, 4] = 15.0
    s._weights[0, 0] = 14.0
    assert s.topographic_error([[5]]) == 0.0
    assert s.topographic_error([[15]]) == 1.0


def test_quantization(som):
    q = som.quantization(np.array([[4], [2]]))
    assert q[0] == 5.0
    assert q[1] == 2.0


def test_random_seed():
    som1 = XPySom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    som2 = XPySom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    np.testing.assert_array_almost_equal(som1._weights, som2._weights)
    data = np.random.rand(100, 2)
    som1 = XPySom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    som1.train_random(data, 10)
    som2 = XPySom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    som2.train_random(data, 10)
    np.testing.assert_array_almost_equal(som1._weights, som2._weights)


def test_train():
    som = XPySom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    data = np.array([[4, 2], [3, 1]])
    q1 = som.quantization_error(data)
    som.train(data, 10)
    assert q1 > som.quantization_error(data)

    data = np.array([[1, 5], [6, 7]])
    q1 = som.quantization_error(data)
    som.train(data, 10, verbose=True)
    assert q1 > som.quantization_error(data)


def test_train_iter_segments_compose():
    """Segmented training (iter_beg/iter_end) must equal one full run —
    the reference's checkpoint/resume mechanism (xpysom.py:470-482)."""
    data = np.random.RandomState(7).rand(64, 3).astype(np.float32)
    full = XPySom(6, 4, 3, sigma=1.5, random_seed=2)
    full.train(data, 8)
    seg = XPySom(6, 4, 3, sigma=1.5, random_seed=2)
    seg.train(data, 8, iter_beg=0, iter_end=3)
    seg.train(data, 8, iter_beg=3, iter_end=8)
    np.testing.assert_allclose(seg._weights, full._weights, rtol=1e-5, atol=1e-6)


def test_random_weights_init():
    som = XPySom(2, 2, 2, random_seed=1)
    som.random_weights_init(np.array([[1.0, 0.0]]))
    for w in som._weights:
        np.testing.assert_array_equal(w[0], np.array([1.0, 0.0]))


def test_pca_weights_init():
    som = XPySom(2, 2, 2)
    som.pca_weights_init(np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
    expected = np.array(
        [
            [[0.0, -1.41421356], [-1.41421356, 0.0]],
            [[1.41421356, 0.0], [0.0, 1.41421356]],
        ]
    )
    np.testing.assert_array_almost_equal(som._weights, expected)


def test_distance_map():
    som = XPySom(2, 2, 2, random_seed=1)
    som._weights = np.array([[[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 1.0]]])
    np.testing.assert_array_equal(som.distance_map(), np.array([[1.0, 1.0], [1.0, 1.0]]))

    som_hex = XPySom(2, 2, 2, topology="hexagonal", random_seed=1)
    som_hex._weights = np.array([[[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 1.0]]])
    np.testing.assert_array_equal(
        som_hex.distance_map(), np.array([[0.5, 1.0], [1.0, 0.5]])
    )


def test_pickling(som, tmp_path):
    p = tmp_path / "som.p"
    with open(p, "wb") as outfile:
        pickle.dump(som, outfile)
    with open(p, "rb") as infile:
        loaded = pickle.load(infile)
    np.testing.assert_array_equal(loaded._weights, som._weights)
    assert loaded.winner([5.0]) == (2, 3)


def test_winner_scalar_and_batch(som):
    assert som.winner(np.array([5.0])) == (2, 3)
    assert som.winner([[5.0], [2.0]]) == [(2, 3), (1, 1)]


def test_predict(som):
    got = som.predict([[5.0], [2.0]])
    np.testing.assert_array_equal(got, [13, 6])


def test_euclidean_coordinates_and_convert():
    s = XPySom(3, 3, 1, topology="hexagonal")
    xx, yy = s.get_euclidean_coordinates()
    assert xx.shape == (3, 3)
    cx, cy = s.convert_map_to_euclidean((1, 2))
    assert cx == xx[1, 2] and cy == yy[1, 2]


def test_sigma_default_and_warn():
    s = XPySom(6, 4, 2)
    assert s._sigma == 2.0
    with pytest.warns(UserWarning):
        XPySom(3, 3, 1, sigma=5)


def test_pickle_with_explicit_mesh():
    import pickle

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from xpysom_dask_tpu.parallel.mesh import make_data_mesh

    som = XPySom(4, 4, 2, mesh=make_data_mesh(2), random_seed=0)
    loaded = pickle.loads(pickle.dumps(som))
    assert loaded._mesh is not None
    np.testing.assert_array_equal(loaded._weights, som._weights)


def test_winner_duck_typing():
    """winner()/activate() must accept .compute()/.to_numpy() objects like
    predict() does (dask/cudf duck-typing ladder)."""

    class FakeDask:
        def __init__(self, arr):
            self.arr = arr

        def compute(self):
            return self.arr

    som = XPySom(5, 5, 1, std_coeff=1)
    som._weights = np.zeros((5, 5, 1))
    som._weights[2, 3] = 5.0
    wrapped = FakeDask(np.array([[5.0], [0.1]], dtype=np.float32))
    assert som.winner(wrapped) == [(2, 3), (0, 0)]
    assert som.activate(FakeDask(np.array([[5.0]], np.float32))).argmin() == 13


def test_te_1x1_map_warns_nan():
    with pytest.warns(UserWarning):
        som = XPySom(1, 1, 4, random_seed=0)
        assert np.isnan(som.topographic_error(np.random.rand(4, 4)))


def test_te_nonsquare_hex_raises():
    som = XPySom(8, 3, 2, topology="hexagonal", random_seed=0)
    with pytest.raises(ValueError, match="square"):
        som.topographic_error(np.random.rand(10, 2).astype(np.float32))


def test_get_neig_functions():
    """Reference xpysom.py:255-283: dict of prepared neighborhood
    callables for the map's topology (hex omits 'triangle')."""
    rect = XPySom(6, 5, 3, sigma=2.0, random_seed=1)
    fns = rect.get_neig_functions()
    assert set(fns) == {"gaussian", "mexican_hat", "bubble", "triangle"}
    c = (np.array([1, 4]), np.array([2, 0]))
    for name, f in fns.items():
        out = np.asarray(f(c, 2.0))
        assert out.shape == (2, 6, 5), name
        assert np.isfinite(out).all(), name
    # gaussian peaks at the center
    g = np.asarray(fns["gaussian"](c, 2.0))
    assert g[0].argmax() == 1 * 5 + 2 and g[1].argmax() == 4 * 5 + 0

    hexa = XPySom(4, 4, 3, sigma=2.0, random_seed=1, topology="hexagonal")
    assert set(hexa.get_neig_functions()) == {"gaussian", "mexican_hat", "bubble"}
    out = np.asarray(hexa.get_neig_functions()["gaussian"]((np.array([1]), np.array([1])), 1.5))
    assert out.shape == (1, 4, 4) and np.isfinite(out).all()
