"""Numerical parity of the six kernel ops against the reference oracle
(interpol/pushpull.py forward entry points), across dimensions, orders,
boundary conditions and extrapolation modes, in float64.

Known reference defects are excluded (and our behavior asserted instead
elsewhere):
- iso0.pull2d masks with ``mask * mask`` instead of ``out * mask``
  (iso0.py:155), so pure order-0 2D with extrapolate in {0, 2} disagrees;
- Spline(1).fastgrad has a sign error (splines.py:90-97), so nd-path
  gradients with *mixed* orders including 1 disagree.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpol_tpu.ops import pushpull as pp

from _reference import load_reference

jpull = jax.jit(pp.pull, static_argnums=(2, 3, 4))
jpush = jax.jit(pp.push, static_argnums=(2, 3, 4, 5))
jcount = jax.jit(pp.count, static_argnums=(1, 2, 3, 4))
jgrad = jax.jit(pp.grad, static_argnums=(2, 3, 4))
jhess = jax.jit(pp.hess, static_argnums=(2, 3, 4))
jpushgrad = jax.jit(pp.pushgrad, static_argnums=(2, 3, 4, 5))

ISHAPES = {1: (5,), 2: (5, 6), 3: (5, 6, 4), 4: (4, 5, 3, 4)}
OSHAPES = {1: (3,), 2: (3, 4), 3: (3, 4, 5), 4: (2, 3, 4, 2)}


def make_data(dim, seed=0):
    rng = np.random.default_rng(seed)
    B, C = 2, 3
    ishape, oshape = ISHAPES[dim], OSHAPES[dim]
    inp = rng.standard_normal((B, C, *ishape))
    vals = rng.standard_normal((B, C, *oshape))
    valsg = rng.standard_normal((B, C, *oshape, dim))
    grid = rng.uniform(-2, max(ishape) + 2, (B, *oshape, dim))
    return inp, vals, valsg, grid


# Fast set: every code path (each dim, low/high/mixed orders, all seven
# bounds, every extrapolation mode) with one combination per path.
FAST_CASES = [
    (1, (0,), (3,), 1),
    (1, (1,), (4,), 1),
    (1, (3,), (0,), 1),
    (1, (7,), (3,), 0),
    (2, (1, 1), (3, 3), 1),
    (2, (1, 1), (5, 5), 0),
    (2, (3, 3), (6, 6), 0),
    (2, (0, 0), (1, 1), 1),
    (2, (2, 3), (4, 5), 1),     # mixed orders + mixed bounds
    (2, (5, 5), (2, 2), 2),
    (3, (1, 1, 1), (3, 3, 3), 1),
    (3, (3, 3, 3), (0, 0, 0), 1),
    (3, (2, 3, 5), (4, 5, 1), 1),
    (3, (0, 0, 0), (6, 6, 6), 0),
    # 4-D (no specialization anywhere: both the reference and this
    # framework route dim>3 through their generic N-D kernels —
    # interpol/pushpull.py:50-66 falls through to nd.pull)
    (4, (1, 1, 1, 1), (3, 3, 3, 3), 1),
    (4, (2, 2, 2, 2), (3, 3, 3, 3), 1),
    (4, (3, 2, 1, 0), (0, 6, 3, 2), 1),   # mixed orders + mixed bounds
]


def all_cases():
    for dim in (1, 2, 3, 4):
        orderset = [(0,) * dim, (1,) * dim, (2,) * dim, (3,) * dim]
        if dim <= 2:
            orderset += [(5,) * dim, (7,) * dim]
        elif dim == 3:
            orderset += [(5, 5, 5)]
        # dim 4: orders <= 3 (the reference oracle's Python node loop is
        # (order+1)^4 iterations; order 3 = 256 already covers the path)
        if dim > 1:
            orderset += [tuple(range(2, 2 + dim))]  # mixed orders
        for orders in orderset:
            boundsets = [(3,) * dim, (0,) * dim, (6,) * dim]
            if orders in ((1,) * dim, (3,) * dim):
                boundsets += [(1,) * dim, (2,) * dim, (4,) * dim,
                              (5,) * dim]
                if dim > 1:
                    boundsets += [tuple(range(4, 4 + dim))]  # mixed bounds
            for bounds in boundsets:
                for ex in (0, 1, 2):
                    yield dim, orders, bounds, ex


SLOW_CASES = [c for c in all_cases() if c not in FAST_CASES]


@pytest.mark.parametrize("dim,orders,bounds,ex", FAST_CASES + [
    pytest.param(*c, marks=pytest.mark.slow) for c in SLOW_CASES])
def test_parity(dim, orders, bounds, ex):
    load_reference()
    import torch
    from interpol import pushpull as rpp

    inp, vals, valsg, grid = make_data(dim)
    it, gt, vt, vgt = map(torch.as_tensor, (inp, grid, vals, valsg))
    ij, gj, vj, vgj = map(jnp.asarray, (inp, grid, vals, valsg))
    ishape = ISHAPES[dim]
    lo, lb = list(orders), list(bounds)

    atol = 1e-10

    # pull (skip known iso0.pull2d reference bug)
    if not (dim == 2 and set(orders) == {0} and ex != 1):
        ref = rpp.grid_pull(it, gt, lb, lo, ex).numpy()
        out = np.asarray(jpull(ij, gj, orders, bounds, ex))
        np.testing.assert_allclose(out, ref, atol=atol)

    # push
    ref = rpp.grid_push(vt, gt, list(ishape), lb, lo, ex).numpy()
    out = np.asarray(jpush(vj, gj, ishape, orders, bounds, ex))
    np.testing.assert_allclose(out, ref, atol=atol)

    # count
    ref = rpp.grid_count(gt, list(ishape), lb, lo, ex).numpy()
    out = np.asarray(jcount(gj, ishape, orders, bounds, ex))
    np.testing.assert_allclose(out, ref, atol=atol)

    # grad: skip the reference's nd-path order-1 sign bug
    # (Spline(1).fastgrad, splines.py:90-97).  The nd path is hit for
    # mixed orders at any dim, and for ALL orders — even pure order 1 —
    # at dim > 3 (no iso1 specialization there, pushpull.py:50-66).
    if 1 not in orders or (set(orders) == {1} and dim <= 3):
        ref = rpp.grid_grad(it, gt, lb, lo, ex).numpy()
        out = np.asarray(jgrad(ij, gj, orders, bounds, ex))
        np.testing.assert_allclose(out, ref, atol=atol)

    # hess / pushgrad (second-order primitives; orders >= 2 only, where
    # the reference's nd path is well-defined)
    if min(orders) >= 2:
        # The reference's nd.hess crashes for extrapolate != 1: its mask
        # is broadcast as (B,1,1,P,1,1) against (B,C,P,D,D)
        # (interpol/nd.py:456) — never exercised upstream.
        if ex == 1:
            ref = rpp.grid_hess(it, gt, lb, lo, ex).numpy()
            out = np.asarray(jhess(ij, gj, orders, bounds, ex))
            np.testing.assert_allclose(out, ref, atol=atol)

        ref = rpp.grid_pushgrad(vgt, gt, list(ishape), lb, lo, ex).numpy()
        out = np.asarray(jpushgrad(vgj, gj, ishape, orders, bounds, ex))
        np.testing.assert_allclose(out, ref, atol=atol)
