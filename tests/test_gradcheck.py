"""Gradient correctness via jax.test_util.check_grads (the JAX analogue of
the reference's torch.autograd.gradcheck suite,
interpol/tests/test_gradcheck_pushpull.py): first- and second-order
reverse-mode checks on tiny 3^dim volumes in float64, with randn-perturbed
identity grids so out-of-bounds folding and sign flips are exercised.

Coverage: the full bound sweep at orders 0-2 runs in 2D (the most
representative dimensionality); 1D/3D are spot-checked across orders, and
orders 3-7 run on dct2 as in the reference matrix
(test_gradcheck_pushpull.py:29-36).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from interpol_tpu.ops import pushpull as pp
from interpol_tpu.ops.coeff import spline_coeff

SHAPE1 = 3


def make_data(dim, seed):
    rng = np.random.default_rng(seed)
    B, C = 1, 2
    ishape = (SHAPE1,) * dim
    mesh = np.stack(np.meshgrid(*[np.arange(SHAPE1)] * dim, indexing="ij"),
                    -1).astype(np.float64)
    grid = mesh[None] + 0.3 * rng.standard_normal((B, *ishape, dim))
    vol = rng.standard_normal((B, C, *ishape))
    return jnp.asarray(vol), jnp.asarray(grid)


FAST = [
    (2, 1, 3), (2, 2, 5), (2, 3, 0), (2, 0, 6),
    (1, 3, 4), (3, 1, 3), (3, 3, 3), (2, 5, 3),
    (4, 2, 3),   # dim>3: the generic N-D path with no specialization
]


def slow_cases():
    # (dim, order, bound)
    for order in range(3):
        for bound in range(7):
            yield 2, order, bound
    for order in range(3, 8):
        yield 2, order, 3
    for dim in (1, 3):
        for order, bound in [(0, 0), (1, 3), (2, 5), (3, 6), (5, 3)]:
            yield dim, order, bound


CASES = FAST + [pytest.param(*c, marks=pytest.mark.slow)
                for c in slow_cases() if c not in FAST]


@pytest.mark.parametrize("dim,order,bound", CASES)
def test_gradcheck_pull(dim, order, bound):
    vol, grid = make_data(dim, seed=10 + dim)
    o, b = (order,) * dim, (bound,) * dim
    f = jax.jit(lambda v, g: pp.pull(v, g, o, b, 1))
    check_grads(f, (vol, grid), order=2, modes=["rev"],
                atol=1e-6, rtol=2e-3)


@pytest.mark.parametrize("dim,order,bound", CASES)
def test_gradcheck_push(dim, order, bound):
    vol, grid = make_data(dim, seed=20 + dim)
    o, b = (order,) * dim, (bound,) * dim
    ishape = (SHAPE1,) * dim
    f = jax.jit(lambda v, g: pp.push(v, g, ishape, o, b, 1))
    check_grads(f, (vol, grid), order=2, modes=["rev"],
                atol=1e-6, rtol=2e-3)


@pytest.mark.parametrize("dim,order,bound", CASES)
def test_gradcheck_count(dim, order, bound):
    _, grid = make_data(dim, seed=30 + dim)
    o, b = (order,) * dim, (bound,) * dim
    ishape = (SHAPE1,) * dim
    f = jax.jit(lambda g: pp.count(g, ishape, o, b, 1))
    check_grads(f, (grid,), order=1, modes=["rev"],
                atol=1e-6, rtol=2e-3)


@pytest.mark.parametrize("dim,order,bound", CASES)
def test_gradcheck_grad(dim, order, bound):
    vol, grid = make_data(dim, seed=40 + dim)
    o, b = (order,) * dim, (bound,) * dim
    f = jax.jit(lambda v, g: pp.grad(v, g, o, b, 1))
    check_grads(f, (vol, grid), order=2, modes=["rev"],
                atol=1e-6, rtol=2e-3)


@pytest.mark.parametrize("order", [2, 3, 5, 7])
@pytest.mark.parametrize("bound", [2, 3, 6])
def test_gradcheck_coeff(order, bound):
    rng = np.random.default_rng(50)
    x = jnp.asarray(rng.standard_normal((2, 9)))
    f = jax.jit(lambda v: spline_coeff(v, order, bound, axis=-1))
    check_grads(f, (x,), order=2, modes=["rev"], atol=1e-6, rtol=2e-3)


@pytest.mark.parametrize("ex", [0, 2])
def test_gradcheck_pull_masked(ex):
    # extrapolate = no/hist engages the in-bounds mask.
    vol, grid = make_data(2, seed=60)
    f = jax.jit(lambda v, g: pp.pull(v, g, (3, 3), (3, 3), ex))
    check_grads(f, (vol, grid), order=1, modes=["rev"],
                atol=1e-6, rtol=2e-3)


def test_gradcheck_mixed_orders_bounds():
    vol, grid = make_data(2, seed=61)
    f = jax.jit(lambda v, g: pp.pull(v, g, (2, 3), (4, 5), 1))
    check_grads(f, (vol, grid), order=2, modes=["rev"],
                atol=1e-6, rtol=2e-3)
