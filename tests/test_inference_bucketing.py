"""Shape-bucketed inference chunking (VERDICT r2 #7).

The reference had no compile step, so repeated ``winner``/``predict``/
metric calls with varying batch sizes — the notebook usage pattern
(SURVEY §2.9) — must not retrace per distinct length. ``_chunked``
snaps inference shapes onto a small ladder (chunk rungs ×8 geometric +
power-of-two chunk counts), bounding the executables any call sequence
can create, with parity unchanged (padding is masked / sliced off).
"""

import numpy as np

from xpysom_dask_tpu import XPySom
from xpysom_dask_tpu import core


def _som(**kw):
    return XPySom(5, 4, 6, sigma=2, random_seed=0, **kw)


def test_winner_traces_bounded_over_30_sizes():
    som = _som()
    som.train(np.random.RandomState(0).rand(256, 6), 1)
    bmu_fn = core.make_bmu_fn(som._spec, som._mesh)
    before = bmu_fn._cache_size()
    rng = np.random.RandomState(1)
    sizes = list(range(1, 25)) + [30, 100, 257, 400, 511, 1000]
    assert len(sizes) == 30
    for n in sizes:
        som.winner(rng.rand(n, 6))
    assert bmu_fn._cache_size() - before <= 4


def test_qe_te_traces_bounded():
    som = _som()
    qe_fn = core.make_quantization_stats_fn(som._spec, som._mesh)
    te_fn = core.make_topographic_stats_fn(som._spec, som._mesh)
    rng = np.random.RandomState(2)
    for n in (3, 9, 17, 33, 65, 129, 250, 333, 480, 600):
        som.quantization_error(rng.rand(n, 6))
        som.topographic_error(rng.rand(n, 6))
    assert qe_fn._cache_size() <= 4
    assert te_fn._cache_size() <= 4


def test_bucketed_parity_with_unbucketed():
    """Bucketing only pads (masked rows / sliced-off indices): winners,
    QE and TE match a SOM fed exact-size batches through the training
    (unbucketed) chunker."""
    som = _som()
    som.train(np.random.RandomState(3).rand(300, 6), 2)
    rng = np.random.RandomState(4)
    for n in (1, 7, 19, 100, 300):
        x = rng.rand(n, 6).astype(np.float32)
        flat_b = som._winner_flat(x)
        # reference computation: plain argmin over the full matrix
        w = som.get_weights().reshape(-1, 6)
        d = ((x[:, None, :] - w[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(flat_b, d.argmin(1))
        qe = som.quantization_error(x)
        qe_ref = float(
            np.linalg.norm(x - w[d.argmin(1)].astype(np.float32), axis=1).mean()
        )
        np.testing.assert_allclose(qe, qe_ref, rtol=1e-5)


def test_bucketed_shapes_on_ladder():
    som = _som(n_parallel=2048)
    for n, want_chunk, want_c in [
        (1, 8, 1),
        (8, 8, 1),
        (9, 64, 1),
        (64, 64, 1),
        (65, 512, 1),
        (512, 512, 1),
        (513, 2048, 1),
        (2048, 2048, 1),
        (2049, 2048, 2),
        (5000, 2048, 4),  # C=3 -> pow2 -> 4
    ]:
        chunks, mask, got_n = som._chunked(np.zeros((n, 6), np.float32), bucket=True)
        assert got_n == n
        assert chunks.shape == (want_c, want_chunk, 6), (n, chunks.shape)
        assert float(np.asarray(mask).sum()) == n


def test_training_not_bucketed():
    """Training keeps the tight chunker — padding would cost every epoch."""
    som = _som(n_parallel=2048)
    chunks, _, _ = som._chunked(np.zeros((100, 6), np.float32))
    assert chunks.shape == (1, 104, 6)  # round_up(100, 8), no ladder
