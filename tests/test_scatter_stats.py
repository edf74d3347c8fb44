"""Mosaic scatter-stats prototype (VERDICT r2 #4) — interpreter-mode
correctness; the XLA-vs-Mosaic scatter race is measured on-chip."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.ops.pallas.stats import scatter_stats


@pytest.mark.parametrize(
    "n,d,xy",
    [
        (3000, 16, 256),  # ragged sample tiles
        (1024, 8, 64),  # exact tile fit
        (10, 3, 5),  # tiny
    ],
)
def test_scatter_stats_matches_numpy(n, d, xy):
    rng = np.random.RandomState(n)
    x = rng.rand(n, d).astype(np.float32)
    m = (rng.rand(n) > 0.1).astype(np.float32)
    idx = rng.randint(xy, size=n).astype(np.int32)
    S, cnt = scatter_stats(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(idx), xy, interpret=True
    )
    aug = np.concatenate([x, np.ones((n, 1), np.float32)], 1) * m[:, None]
    ref = np.zeros((xy, d + 1), np.float64)
    np.add.at(ref, idx, aug)
    np.testing.assert_allclose(np.asarray(S), ref[:, :d], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cnt), ref[:, d], rtol=1e-6)


def test_scatter_stats_all_masked():
    S, cnt = scatter_stats(
        jnp.ones((64, 4)), jnp.zeros(64), jnp.zeros(64, jnp.int32), 16,
        interpret=True,
    )
    assert float(jnp.abs(S).sum()) == 0.0
    assert float(cnt.sum()) == 0.0


def test_fits_vmem_gate():
    from xpysom_dask_tpu.ops.pallas.stats import fits_vmem

    assert fits_vmem(16384, 64)  # flagship 128x128 @ D=64: 4.3 MB
    assert not fits_vmem(65536, 64)  # 256x256 @ D=64: 17 MB
    assert not fits_vmem(16384, 512)  # 33.6 MB


def test_return_acc_matches_split():
    import jax.numpy as jnp
    from xpysom_dask_tpu.ops.pallas.stats import scatter_stats

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(200, 5).astype(np.float32))
    m = jnp.asarray((rng.rand(200) > 0.2).astype(np.float32))
    idx = jnp.asarray(rng.randint(37, size=200).astype(np.int32))
    S, cnt = scatter_stats(x, m, idx, 37, interpret=True)
    acc = scatter_stats(x, m, idx, 37, interpret=True, return_acc=True)
    np.testing.assert_array_equal(np.asarray(acc[:, :5]), np.asarray(S))
    np.testing.assert_array_equal(np.asarray(acc[:, 5]), np.asarray(cnt))


def test_core_gate_off_on_cpu():
    from xpysom_dask_tpu import core

    # tests force the CPU backend, so the gate must refuse regardless of
    # the fit (the kernel is TPU-only)
    assert not core._use_mosaic_scatter(None, 16384, 64)


def test_core_gate_requires_env_opt_in(monkeypatch):
    """The Mosaic scatter lost the in-context ranking to the XLA
    scatter-add (BASELINE.md round 3): it must never route without the
    explicit XPYSOM_MOSAIC_SCATTER benchmark hook."""
    from xpysom_dask_tpu import core

    monkeypatch.delenv("XPYSOM_MOSAIC_SCATTER", raising=False)
    assert not core._use_mosaic_scatter(None, 128, 8)
    # and even WITH the hook, the CPU backend still refuses
    monkeypatch.setenv("XPYSOM_MOSAIC_SCATTER", "1")
    assert not core._use_mosaic_scatter(None, 128, 8)


class TestSplitScatter:
    """Lane-boundary split scatter (round 3): S and cnt scatter
    separately when ``[x | 1]`` would pad a whole extra 128-lane tile."""

    def test_gate(self, monkeypatch):
        from xpysom_dask_tpu.core import _use_split_scatter

        monkeypatch.delenv("XPYSOM_SPLIT_SCATTER", raising=False)
        assert _use_split_scatter(128)
        assert _use_split_scatter(512)
        assert not _use_split_scatter(64)   # 65 and 64 both pad to 128
        assert not _use_split_scatter(513)  # 514 rounds to the same tile
        assert not _use_split_scatter(3)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "1")
        assert _use_split_scatter(64)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "0")
        assert not _use_split_scatter(512)
        # review r4: the force hook shares the shell-style grammar of
        # every other XPYSOM_* switch ('false' must not force the split)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "false")
        assert not _use_split_scatter(512)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "off")
        assert not _use_split_scatter(512)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "true")
        assert _use_split_scatter(64)

    @pytest.mark.parametrize("d", [64, 128])
    def test_split_matches_fused(self, d, monkeypatch):
        """Both formulations of _accumulate_stats produce the same
        (S, cnt) — same adds, per-chunk partials in both modes."""
        from xpysom_dask_tpu import core
        from xpysom_dask_tpu.models.som import XPySom

        som = XPySom(6, 5, d, random_seed=7)
        spec = som._spec
        dist = spec.distance_fn()
        rng = np.random.RandomState(d)
        data = jnp.asarray(rng.rand(3, 100, d).astype(np.float32))
        mask = jnp.asarray((rng.rand(3, 100) > 0.1).astype(np.float32))
        w = jnp.asarray(som._weights.reshape(30, d))
        w_sq = jnp.sum(jnp.square(w), axis=1, keepdims=True)

        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "0")
        s0, c0 = core._accumulate_stats(dist, w, w_sq, data, mask, 30, spec)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "1")
        s1, c1 = core._accumulate_stats(dist, w, w_sq, data, mask, 30, spec)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=0)

    def test_train_parity_at_lane_boundary(self, monkeypatch):
        """End-to-end: a D=128 training run (split auto-ON) matches the
        same run with the split forced OFF. The env hook resolves at
        factory-BUILD time and the factories are lru_cached on
        (spec, num_epochs, mesh), so each arm must clear the program
        caches or both arms run one cached executable (round-5 review:
        this test was vacuous without it)."""
        from xpysom_dask_tpu import core
        from xpysom_dask_tpu.models.som import XPySom

        rng = np.random.RandomState(0)
        data = rng.rand(400, 128).astype(np.float32)

        def train(env):
            monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", env)
            core.clear_program_caches()
            som = XPySom(7, 6, 128, sigma=2.0, random_seed=11)
            som.train(data, num_epochs=3)
            return som.get_weights()

        w_off = train("0")
        w_on = train("1")
        core.clear_program_caches()  # don't leak forced-ON programs
        np.testing.assert_allclose(w_on, w_off, rtol=2e-5, atol=1e-6)

    def test_grid_sharded_split_parity(self, monkeypatch):
        """Split scatter through the 2-D (data, model) mesh matches the
        single-device fused-scatter run."""
        import jax
        from xpysom_dask_tpu import XPySom
        from xpysom_dask_tpu.parallel.grid_sharded import make_grid_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from xpysom_dask_tpu import core

        rng = np.random.RandomState(5)
        data = rng.rand(300, 16).astype(np.float32)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "0")
        core.clear_program_caches()  # env resolves at factory build time
        single = XPySom(8, 4, 16, random_seed=3, n_parallel=64)
        single.train(data, 3)
        monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", "1")
        core.clear_program_caches()
        sharded = XPySom(
            8, 4, 16, random_seed=3, n_parallel=64, mesh=make_grid_mesh(2, 4)
        )
        sharded.train(data, 3)
        core.clear_program_caches()  # don't leak forced-ON programs
        np.testing.assert_allclose(
            sharded._weights, single._weights, rtol=1e-4, atol=1e-5
        )

    def test_population_split_parity(self, monkeypatch):
        """Split scatter in the population sweep matches the fused run.
        Each arm clears the cached program factories — the env hook
        resolves at build time, so without the clear both arms reuse one
        executable (round-5 review: this test was vacuous)."""
        from xpysom_dask_tpu import SomPopulation, core

        rng = np.random.RandomState(9)
        data = rng.rand(200, 8).astype(np.float32)

        def run(env):
            monkeypatch.setenv("XPYSOM_SPLIT_SCATTER", env)
            core.clear_program_caches()
            pop = SomPopulation(3, 4, 5, 8, sigma=[1.0, 1.5, 2.0], random_seed=2)
            pop.train(data, 3)
            return np.asarray(pop.weights)

        w_on, w_off = run("1"), run("0")
        core.clear_program_caches()  # don't leak forced-state programs
        np.testing.assert_allclose(w_on, w_off, rtol=1e-5, atol=1e-6)
