"""Spline weight engine: parity with the reference oracle
(interpol/splines.py) plus analytical invariants of the Cox-de Boor
recursion."""
import numpy as np
import pytest

import jax.numpy as jnp

from interpol_tpu.ops.splines import (
    bspline_grad, bspline_hess, bspline_taps, bspline_weight, node_origin)

from _reference import load_reference


@pytest.mark.parametrize("order", range(8))
def test_taps_match_reference(order):
    load_reference()
    import torch
    from interpol.splines import Spline

    rng = np.random.default_rng(0)
    g = rng.uniform(-3, 10, size=500)
    sp = Spline(order)
    n0, t = node_origin(jnp.asarray(g), order)
    w, gr, he = bspline_taps(t, order, grad=True, hess=True)
    tg = torch.as_tensor(g, dtype=torch.float64)
    n0t = torch.floor(tg - (order - 1) / 2)
    for j in range(order + 1):
        dist = tg - (n0t + j)
        np.testing.assert_allclose(np.asarray(w[j]),
                                   sp.fastweight(dist).numpy(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(he[j]),
                                   sp.fasthess(dist).numpy(), atol=1e-12)
        if order >= 2:
            np.testing.assert_allclose(np.asarray(gr[j]),
                                       sp.fastgrad(dist).numpy(), atol=1e-12)
        elif order == 1:
            # The reference's Spline(1).fastgrad returns sign(x) — the
            # negative of the true derivative beta_1'(x) = -sign(x) — and
            # is inconsistent with its own iso1 kernels (see
            # interpol_tpu/ops/splines.py docstring).  We check the true
            # derivative.
            np.testing.assert_allclose(np.asarray(gr[j]),
                                       -np.sign(dist.numpy()), atol=1e-12)


@pytest.mark.parametrize("order", range(8))
def test_pointwise_matches_reference(order):
    load_reference()
    import torch
    from interpol.splines import Spline

    rng = np.random.default_rng(1)
    x = rng.uniform(-6, 6, size=800)
    sp = Spline(order)
    np.testing.assert_allclose(
        np.asarray(bspline_weight(jnp.asarray(x), order)),
        sp.weight(torch.as_tensor(x)).numpy(), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bspline_hess(jnp.asarray(x), order)),
        sp.hess(torch.as_tensor(x)).numpy(), atol=1e-12)
    if order >= 2:
        np.testing.assert_allclose(
            np.asarray(bspline_grad(jnp.asarray(x), order)),
            sp.grad(torch.as_tensor(x)).numpy(), atol=1e-12)


@pytest.mark.parametrize("order", range(8))
def test_partition_of_unity(order):
    rng = np.random.default_rng(2)
    g = rng.uniform(-5, 5, size=200)
    _, t = node_origin(jnp.asarray(g), order)
    w, gr, he = bspline_taps(t, order, grad=True, hess=True)
    np.testing.assert_allclose(np.asarray(sum(w)), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sum(gr)), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sum(he)), 0.0, atol=1e-12)


@pytest.mark.parametrize("order", range(1, 8))
def test_grad_is_derivative(order):
    # Finite-difference check of the derivative identities, away from the
    # (half-)integer breakpoint lattice where low orders have kinks.
    x = np.linspace(-4, 4, 801)
    x = x[np.abs(2 * x - np.round(2 * x)) > 1e-3]
    x = jnp.asarray(x)
    eps = 1e-6
    fd = (bspline_weight(x + eps, order) - bspline_weight(x - eps, order)) \
        / (2 * eps)
    g = bspline_grad(x, order)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), atol=1e-5)


def test_support_cutoff():
    for order in range(8):
        lim = (order + 1) / 2
        x = jnp.asarray([-lim - 0.01, lim + 0.01, lim + 3.0])
        np.testing.assert_array_equal(np.asarray(bspline_weight(x, order)), 0)
