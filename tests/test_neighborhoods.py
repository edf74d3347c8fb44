"""Neighborhood-kernel parity vs the scalar golden definitions (the role
MiniSom plays in the reference suite, tests.py:188-246,271-314), plus
verification that the factorized operator form used by the training update
computes exactly the dense ``H`` contraction."""

import numpy as np
import pytest
import jax.numpy as jnp

from xpysom_dask_tpu.core import grid_coordinates
from xpysom_dask_tpu.models.golden import golden_neighborhood
from xpysom_dask_tpu.ops import neighborhoods as NB


def _all_centers(x, y):
    cx, cy = np.meshgrid(np.arange(x), np.arange(y))
    return (
        jnp.asarray(cx.flatten()),
        jnp.asarray(cy.flatten()),
    )


@pytest.mark.parametrize("name", ["gaussian", "mexican_hat", "bubble", "triangle"])
@pytest.mark.parametrize("sigma", [0.7, 1.0, 2.5])
@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("shape", [(5, 5), (4, 7)])
def test_rect_parity(name, sigma, compact, shape):
    x, y = shape
    neigx = jnp.arange(x, dtype=jnp.float32)
    neigy = jnp.arange(y, dtype=jnp.float32)
    c = _all_centers(x, y)
    std_coeff = 1.0
    if name == "gaussian":
        got = NB.gaussian_rect(neigx, neigy, std_coeff, compact, c, sigma)
    elif name == "mexican_hat":
        got = NB.mexican_hat_rect(neigx, neigy, std_coeff, compact, c, sigma)
    elif name == "bubble":
        if compact:
            pytest.skip("bubble has no compact_support parameter")
        got = NB.bubble(neigx, neigy, c, sigma)
    else:
        got = NB.triangle(neigx, neigy, compact, c, sigma)
    want = golden_neighborhood(
        name,
        x,
        y,
        (np.asarray(c[0]), np.asarray(c[1])),
        sigma,
        std_coeff=std_coeff,
        compact_support=compact,
        topology="rectangular",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["gaussian", "mexican_hat"])
@pytest.mark.parametrize("sigma", [1.0, 2.0])
@pytest.mark.parametrize("compact", [False, True])
def test_hex_parity(name, sigma, compact):
    x = y = 5
    xx, yy = grid_coordinates(x, y, "hexagonal")
    xxj = jnp.asarray(xx, jnp.float32)
    yyj = jnp.asarray(yy, jnp.float32)
    c = _all_centers(x, y)
    std_coeff = 1.0
    if name == "gaussian":
        got = NB.gaussian_generic(xxj, yyj, std_coeff, compact, c, sigma)
    else:
        got = NB.mexican_hat_generic(xxj, yyj, std_coeff, compact, c, sigma)
    want = golden_neighborhood(
        name,
        x,
        y,
        (np.asarray(c[0]), np.asarray(c[1])),
        sigma,
        std_coeff=std_coeff,
        compact_support=compact,
        topology="hexagonal",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "name,topology",
    [
        ("gaussian", "rectangular"),
        ("mexican_hat", "rectangular"),
        ("bubble", "rectangular"),
        ("triangle", "rectangular"),
        ("gaussian", "hexagonal"),
        ("mexican_hat", "hexagonal"),
        ("bubble", "hexagonal"),
    ],
)
@pytest.mark.parametrize("compact", [False, True])
# Both Y parities: the hex separable operator splits by offset-row parity
# classes, whose membership pattern (counted from the END of the grid)
# differs between odd and even Y.
@pytest.mark.parametrize("x,y", [(4, 5), (5, 4)])
def test_operator_matches_dense(name, topology, compact, x, y):
    """The factored operator applied to sufficient statistics must equal the
    dense contraction num[j] = Σ_b H[b,j]·S[b] with H built row-by-row from
    the batched kernels with every node as center."""
    if name == "bubble" and compact:
        pytest.skip("bubble has no compact_support parameter")
    d = 3
    sigma, std_coeff = 1.3, 0.8
    xx, yy = grid_coordinates(x, y, topology)
    op = NB.neighborhood_operator(
        name,
        topology,
        jnp.arange(x, dtype=jnp.float32),
        jnp.arange(y, dtype=jnp.float32),
        jnp.asarray(xx, jnp.float32),
        jnp.asarray(yy, jnp.float32),
        std_coeff,
        compact,
        sigma,
    )
    rng = np.random.RandomState(0)
    s = rng.rand(x * y, d).astype(np.float32)
    cnt = rng.randint(0, 5, size=(x * y,)).astype(np.float32)
    num, den = NB.apply_operator(op, jnp.asarray(s), jnp.asarray(cnt))

    # Dense H via golden batched kernels with all nodes as centers.
    centers = (np.repeat(np.arange(x), y), np.tile(np.arange(y), x))
    h = golden_neighborhood(
        name, x, y, centers, sigma, std_coeff, compact, topology
    ).reshape(x * y, x * y)
    want_num = h.T @ s
    want_den = h.T @ cnt
    np.testing.assert_allclose(np.asarray(num), want_num, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den), want_den, rtol=1e-4, atol=1e-5)


def test_prepare_neig_func():
    f = NB.prepare_neig_func(lambda a, b, c: (a, b, c), 1, 2)
    assert f(3) == (1, 2, 3)


def test_operator_validation():
    import pytest as _pt

    with _pt.raises(ValueError):
        NB.neighborhood_operator(
            "nope",
            "rectangular",
            jnp.arange(3.0),
            jnp.arange(3.0),
            None,
            None,
            0.5,
            False,
            1.0,
        )
    with _pt.raises(ValueError):
        NB.neighborhood_operator(
            "triangle",
            "hexagonal",
            jnp.arange(3.0),
            jnp.arange(3.0),
            jnp.zeros((3, 3)),
            jnp.zeros((3, 3)),
            0.5,
            False,
            1.0,
        )
