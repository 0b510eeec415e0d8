"""resize / restrict: parity with the reference, adjointness of
resize/restrict, and anchor-mode behavior."""
import numpy as np
import pytest

import jax.numpy as jnp

import interpol_tpu as itp

from _reference import load_reference


@pytest.mark.parametrize("anchor", ["centers", "edges", "first", "last"])
@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("factor", [2, 0.5, 1.5])
def test_resize_parity(anchor, order, factor):
    load_reference()
    import torch
    import interpol as ref

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 8, 9))
    r = ref.resize(torch.as_tensor(img), factor=factor, anchor=anchor,
                   interpolation=order, prefilter=True).numpy()
    j = itp.resize(img, factor=factor, anchor=anchor,
                   interpolation=order, prefilter=True)
    np.testing.assert_allclose(np.asarray(j), r, atol=1e-8)


@pytest.mark.parametrize("anchor", ["centers", "edges", "first", "last"])
@pytest.mark.parametrize("reduce_sum", [False, True])
def test_restrict_parity(anchor, reduce_sum):
    load_reference()
    import torch
    import interpol as ref

    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 3, 8, 8))
    r = ref.restrict(torch.as_tensor(img), factor=2, anchor=anchor,
                     interpolation=1, reduce_sum=reduce_sum).numpy()
    j = itp.restrict(img, factor=2, anchor=anchor, interpolation=1,
                     reduce_sum=reduce_sum)
    np.testing.assert_allclose(np.asarray(j), r, atol=1e-9)


def test_resize_shape_arg():
    img = jnp.zeros((1, 1, 10, 12))
    out = itp.resize(img, shape=[5, 6])
    assert out.shape == (1, 1, 5, 6)


def test_resize_restrict_adjoint():
    # restrict(.) with reduce_sum=True is the exact adjoint of resize(.)
    # without prefilter: <restrict(u), v> == <u, resize(v)>.
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((1, 1, 6)))
    u = jnp.asarray(rng.standard_normal((1, 1, 12)))
    Rv = itp.resize(v, shape=[12], anchor="e", interpolation=3,
                    prefilter=False)
    Rtu = itp.restrict(u, shape=[6], anchor="e", interpolation=3,
                       reduce_sum=True)
    np.testing.assert_allclose(float(jnp.vdot(Rtu, v)),
                               float(jnp.vdot(u, Rv)), rtol=1e-10)


def test_resize_scipy_zoom_golden():
    # 'edges' anchor with prefilter matches scipy.ndimage.zoom with
    # grid_mode=True, mode='reflect' (dct2) up to boundary conventions on
    # interior voxels.
    ndi = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(3)
    img = rng.standard_normal((16,))
    ref = ndi.zoom(img, 2.0, order=3, mode="reflect", grid_mode=True)
    out = itp.resize(img[None, None], factor=2.0, anchor="edges",
                     interpolation=3, bound="dct2", prefilter=True)[0, 0]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
