"""Prefilter correctness.

1. Resize-identity property (the reference's own acid test,
   interpol/tests/test_coeff.py): resizing to the same shape with
   prefilter=True must return the input exactly, for all orders, the three
   filter bounds, and lengths covering the degenerate n==1 / n<support
   cases — this holds iff spline_coeff is the exact inverse of the spline
   evaluation filter.
2. Direct parity with the reference's sequential filter.
3. Adjointness: <F(u), v> == <u, F(v)> (the filter is symmetric, the
   property its custom VJP relies on).
4. scipy golden: spline_filter along one axis matches scipy.ndimage.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpol_tpu.ops.coeff import spline_coeff
from interpol_tpu.ops.resize import resize

from _reference import load_reference

LENGTHS = [1, 2, 3, 7, 9, 11, 64, 200]
BOUNDS = ["dct1", "dct2", "dft"]
BOUND_IDS = {"dct1": 2, "dct2": 3, "dft": 6}


def _identity_cases():
    fast = {(le, o, b) for le in (1, 3, 9) for o in range(8)
            for b in ("dct2",)}
    fast |= {(7, o, b) for o in (0, 3, 7) for b in ("dct1", "dft")}
    for le in (1, 2, 3, 7, 9, 11):
        for o in range(8):
            for b in BOUNDS:
                if (le, o, b) in fast:
                    yield le, o, b
                else:
                    yield pytest.param(le, o, b, marks=pytest.mark.slow)


@pytest.mark.parametrize("length,order,bound", list(_identity_cases()))
def test_resize_identity(length, order, bound):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((1, 1, length)))
    y = resize(x, shape=[length], anchor="e", interpolation=order,
               bound=bound, prefilter=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               rtol=1e-5, atol=1e-7)


def _parity_cases():
    fast = {(le, o, b) for le in (2, 9, 200) for o in (2, 3, 7)
            for b in (2, 3, 6)}
    fast |= {(64, 5, 0), (64, 4, 1), (1, 6, 3)}
    for le in LENGTHS:
        for o in range(2, 8):
            for b in (0, 1, 2, 3, 6):
                if (le, o, b) in fast:
                    yield le, o, b
                else:
                    yield pytest.param(le, o, b, marks=pytest.mark.slow)


@pytest.mark.parametrize("length,order,bound", list(_parity_cases()))
def test_filter_parity(length, order, bound):
    load_reference()
    import torch
    from interpol.coeff import spline_coeff as ref_coeff

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, length))
    ref = ref_coeff(torch.as_tensor(x), bound, order, dim=-1).numpy()
    out = np.asarray(spline_coeff(jnp.asarray(x), order, bound, axis=-1))
    scale = max(np.abs(ref).max(), 1.0)
    # At multi-pole orders (>= 4) the reference deviates up to ~1e-8
    # (relative) from its own closed-form math (verified against exact
    # Fraction arithmetic and a plain-numpy fp64 replica, both of which
    # this implementation matches to ~1e-15), so the parity tolerance is
    # bounded by the *reference's* error, not ours.
    atol = 2e-7 if order >= 4 else 1e-9
    np.testing.assert_allclose(out / scale, ref / scale, atol=atol)


@pytest.mark.parametrize("order", [2, 3, 5, 7])
@pytest.mark.parametrize("bound", [2, 3, 6])
def test_filter_unimplemented_and_axis(order, bound):
    # non-last axis handling
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, 5))
    a = np.asarray(spline_coeff(jnp.asarray(x), order, bound, axis=0))
    b = np.asarray(spline_coeff(jnp.asarray(x.T), order, bound, axis=-1)).T
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_unsupported_bound_raises():
    x = jnp.zeros((3, 8))
    for bad in (4, 5):  # dst1 / dst2 unsupported, as in the reference
        with pytest.raises(NotImplementedError):
            spline_coeff(x, 3, bad, axis=-1)


@pytest.mark.parametrize("order", [2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("bound", [3, 6])
def test_filter_self_adjoint(order, bound):
    # dct2 / dft filters are self-adjoint (dct1 is not — its exact adjoint
    # is tested through the VJP below).
    rng = np.random.default_rng(5)
    u = rng.standard_normal((1, 31))
    v = rng.standard_normal((1, 31))
    fu = np.asarray(spline_coeff(jnp.asarray(u), order, bound, axis=-1))
    fv = np.asarray(spline_coeff(jnp.asarray(v), order, bound, axis=-1))
    np.testing.assert_allclose(np.vdot(fu, v), np.vdot(u, fv), rtol=1e-9)


@pytest.mark.parametrize("order", [2, 3, 5, 7])
@pytest.mark.parametrize("bound", [2, 3, 6])
def test_filter_vjp_is_exact_adjoint(order, bound):
    # <ct, F(u)> == <VJP_F(ct), u> for every bound, including dct1 where
    # the filter itself is not symmetric (the reference approximates this
    # backward with the forward filter; ours is the exact transpose).
    import jax

    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((1, 17)))
    ct = jnp.asarray(rng.standard_normal((1, 17)))
    f = lambda x: spline_coeff(x, order, bound, axis=-1)
    y, vjp = jax.vjp(f, u)
    (du,) = vjp(ct)
    np.testing.assert_allclose(float(jnp.vdot(ct, y)),
                               float(jnp.vdot(du, u)), rtol=1e-9)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_scipy_golden(order):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(6)
    x = rng.standard_normal(49)
    ref = scipy_ndimage.spline_filter1d(x, order=order, mode="mirror")
    out = np.asarray(spline_coeff(jnp.asarray(x)[None], order, 2,  # dct1
                                  axis=-1))[0]
    np.testing.assert_allclose(out, ref, atol=1e-9)


@pytest.mark.parametrize("order", [2, 3, 5, 7])
@pytest.mark.parametrize("bound", ["dct1", "dct2", "dft"])
def test_matrix_path_matches_scan_path(order, bound, monkeypatch):
    """The precomputed inverse-filter matrix (default for n <= _MATRIX_MAX)
    must agree with the blocked-scan cascade to fp accuracy."""
    from interpol_tpu.ops import coeff as C
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 37)))
    b = BOUND_IDS[bound]
    mat = C.spline_coeff(x, order, b, axis=-1)
    monkeypatch.setattr(C, "_MATRIX_MAX", 0)   # force the scan path
    scan = C.spline_coeff(x, order, b, axis=-1)
    np.testing.assert_allclose(np.asarray(mat), np.asarray(scan),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("bound", ["dct1", "dct2", "dft"])
def test_matrix_path_vjp_is_exact_adjoint(bound):
    """<f(u), v> == <u, f^T(v)> with the transposed-matrix backward."""
    from interpol_tpu.ops import coeff as C
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal(23))
    v = jnp.asarray(rng.standard_normal(23))
    b = BOUND_IDS[bound]
    f = lambda t: C.spline_coeff(t, 3, b, axis=-1)
    fu = f(u)
    _, pull = jax.vjp(f, u)
    (ftv,) = pull(v)
    np.testing.assert_allclose(float(fu @ v), float(u @ ftv), rtol=1e-12)
