"""Adjointness and derivative-consistency invariants that hold by
construction in exact arithmetic:

- <push(u), v> == <u, pull(v)>  (pull and push are mutual adjoints; this
  is what the hand-wired VJPs rely on, reference pushpull.py:253, 277)
- count == push(ones)
- grad matches finite differences of pull along the grid
- pull against scipy.ndimage.map_coordinates goldens (mirror/reflect/wrap)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from _jit import jcount, jgrad, jpull, jpush


def rand_case(dim, seed=0):
    rng = np.random.default_rng(seed)
    B, C = 2, 2
    ishape = (6, 5, 4)[:dim]
    oshape = (4, 3, 5)[:dim]
    u = jnp.asarray(rng.standard_normal((B, C, *oshape)))
    v = jnp.asarray(rng.standard_normal((B, C, *ishape)))
    grid = jnp.asarray(rng.uniform(-2, 7, (B, *oshape, dim)))
    return u, v, grid, ishape


# Fast set reuses the static combinations already compiled by the parity
# suite where possible (the jit cache is shared process-wide).
FAST = [
    (1, 3, 0, 1), (1, 7, 3, 0),
    (2, 1, 3, 1), (2, 1, 5, 0), (2, 5, 2, 2), (2, 0, 1, 1),
    (3, 1, 3, 1), (3, 3, 0, 1),
]


def slow_cases():
    # full bound sweep at the common orders, plus high-order spot checks
    for dim in (1, 2, 3):
        for order in (0, 1, 3):
            for bound in range(7):
                yield dim, order, bound, 1
        for order in (2, 5):
            for bound in (0, 3, 6):
                yield dim, order, bound, 0
    yield 2, 7, 3, 1
    yield 1, 7, 5, 2


@pytest.mark.parametrize("dim,order,bound,ex", FAST + [
    pytest.param(*c, marks=pytest.mark.slow)
    for c in slow_cases() if c not in FAST])
def test_pull_push_adjoint(dim, order, bound, ex):
    u, v, grid, ishape = rand_case(dim)
    o, b = (order,) * dim, (bound,) * dim
    pulled = jpull(v, grid, o, b, ex)
    pushed = jpush(u, grid, ishape, o, b, ex)
    lhs = jnp.vdot(pushed, v)
    rhs = jnp.vdot(u, pulled)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_count_is_push_of_ones(dim):
    _, _, grid, ishape = rand_case(dim, seed=1)
    o, b = (3,) * dim, (3,) * dim
    ones = jnp.ones((grid.shape[0], 1) + grid.shape[1:-1])
    np.testing.assert_allclose(
        np.asarray(jcount(grid, ishape, o, b, 1)),
        np.asarray(jpush(ones, grid, ishape, o, b, 1)), atol=1e-12)


@pytest.mark.parametrize("dim", [1, 2])
@pytest.mark.parametrize("order", [1, 2, 3, 5])
def test_grad_matches_fd(dim, order):
    _, v, grid, _ = rand_case(dim, seed=2)
    o, b = (order,) * dim, (3,) * dim
    g = np.asarray(jgrad(v, grid, o, b, 1))
    eps = 1e-6
    for d in range(dim):
        dg = jnp.zeros_like(grid).at[..., d].set(eps)
        fd = (jpull(v, grid + dg, o, b, 1) -
              jpull(v, grid - dg, o, b, 1)) / (2 * eps)
        np.testing.assert_allclose(g[..., d], np.asarray(fd), atol=1e-5)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("mode,bound", [("mirror", 2), ("reflect", 3),
                                        ("grid-wrap", 6),
                                        ("nearest", 1)])
def test_scipy_map_coordinates_golden(order, mode, bound):
    ndi = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(7)
    img = rng.standard_normal((8, 7))
    pts = rng.uniform(-3, 10, (2, 40))
    ref = ndi.map_coordinates(img, pts, order=order, mode=mode,
                              prefilter=False)
    grid = jnp.asarray(pts.T)[None]            # (1, 40, 2)
    inp = jnp.asarray(img)[None, None]         # (1, 1, 8, 7)
    out = jpull(inp, grid, (order,) * 2, (bound,) * 2, 1)[0, 0]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)
