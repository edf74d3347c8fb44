"""sklearn adapter contract tests (xpysom_dask_tpu/sklearn.py)."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.base import clone
from sklearn.pipeline import make_pipeline
from sklearn.preprocessing import StandardScaler

from xpysom_dask_tpu.sklearn import SomClusterer


def _blobs(n=300, d=4, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.rand(3, d) * 6
    return np.concatenate(
        [c + 0.2 * rng.randn(n // 3, d) for c in centers]
    ).astype(np.float32)


def test_fit_predict_transform_shapes():
    X = _blobs()
    est = SomClusterer(5, 4, num_epochs=8, sigma=2.0, random_seed=3)
    labels = est.fit_predict(X)
    assert labels.shape == (300,)
    assert labels.min() >= 0 and labels.max() < 20
    assert est.cluster_centers_.shape == (20, 4)
    d = est.transform(X[:7])
    assert d.shape == (7, 20)
    # predict == argmin of transform (euclidean contract)
    np.testing.assert_array_equal(est.predict(X[:7]), d.argmin(1))
    # inverse_transform returns codebook rows
    np.testing.assert_allclose(
        est.inverse_transform(labels[:5]), est.cluster_centers_[labels[:5]]
    )


def test_separates_blobs():
    X = _blobs()
    est = SomClusterer(6, 6, num_epochs=15, sigma=2.5, random_seed=1).fit(X)
    labels = est.predict(X)
    # samples of the same blob should concentrate on few nodes, and the
    # three blobs must not collapse onto one node
    assert len(set(labels.tolist())) >= 3
    assert est.quantization_error_ < 0.5
    assert -est.score(X) == pytest.approx(est.som_.quantization_error(X))


def test_pipeline_and_clone():
    X = _blobs(seed=5)
    pipe = make_pipeline(
        StandardScaler(), SomClusterer(4, 4, num_epochs=5, random_seed=2)
    )
    labels = pipe.fit_predict(X)
    assert labels.shape == (300,)
    est = SomClusterer(4, 3, num_epochs=2, sigma=1.5, random_seed=7)
    est2 = clone(est)
    assert est2.get_params() == est.get_params()
    est2.set_params(num_epochs=3)
    assert est2.num_epochs == 3 and est.num_epochs == 2


def test_validation_errors():
    X = _blobs()
    est = SomClusterer(4, 4, num_epochs=2, random_seed=1).fit(X)
    with pytest.raises(ValueError):
        est.predict(X[:, :2])  # wrong feature count
    with pytest.raises(ValueError):
        SomClusterer(4, 4, init="bogus").fit(X)
    from sklearn.exceptions import NotFittedError

    with pytest.raises(NotFittedError):
        SomClusterer(4, 4).predict(X)


def test_init_modes():
    X = _blobs(seed=9)
    for init in ("random", "pca", "samples"):
        est = SomClusterer(4, 4, num_epochs=3, random_seed=4, init=init).fit(X)
        assert est.quantization_error_ < 2.0
