"""Separable (matmul) fast path: must agree with the gather path and the
reference resize/restrict exactly."""
import numpy as np
import pytest

import jax.numpy as jnp

import interpol_tpu as itp
from interpol_tpu import backend
from interpol_tpu.ops import pushpull as pp
from interpol_tpu.ops.separable import (
    sampling_matrix, separable_pull, separable_push)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 5, 7])
@pytest.mark.parametrize("bound", [0, 1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("ex", [0, 1])
def test_matrix_matches_pull_1d(order, bound, ex):
    rng = np.random.default_rng(0)
    n_in, n_out = 9, 13
    v = jnp.asarray(rng.standard_normal((1, 1, n_in)))
    line = jnp.asarray(rng.uniform(-3, n_in + 2, n_out))
    S = sampling_matrix(line, n_in, order, bound, ex)
    ref = pp.pull(v, line[None, :, None], (order,), (bound,), ex)
    np.testing.assert_allclose(np.asarray(S @ v[0, 0]),
                               np.asarray(ref[0, 0]), atol=1e-12)


@pytest.mark.parametrize("deriv", [1, 2])
def test_matrix_deriv(deriv):
    rng = np.random.default_rng(1)
    n_in, n_out = 11, 7
    v = jnp.asarray(rng.standard_normal((1, 1, n_in)))
    line = jnp.asarray(rng.uniform(0, n_in - 1, n_out))
    S = sampling_matrix(line, n_in, 3, 3, 1, deriv=deriv)
    if deriv == 1:
        ref = pp.grad(v, line[None, :, None], (3,), (3,), 1)[0, 0, :, 0]
    else:
        ref = pp.hess(v, line[None, :, None], (3,), (3,), 1)[0, 0, :, 0, 0]
    np.testing.assert_allclose(np.asarray(S @ v[0, 0]), np.asarray(ref),
                               atol=1e-12)


def test_separable_pull_matches_grid_pull_2d():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((2, 3, 8, 9)))
    lx = jnp.asarray(rng.uniform(-1, 8, 5))
    ly = jnp.asarray(rng.uniform(-1, 9, 6))
    grid = jnp.stack(jnp.meshgrid(lx, ly, indexing="ij"), -1)[None]
    for order, bound in [(1, 3), (3, 6), (3, 0)]:
        sep = separable_pull(img, [lx, ly], (order,) * 2, (bound,) * 2, 1)
        ref = pp.pull(img, jnp.broadcast_to(grid, (2, 5, 6, 2)),
                      (order,) * 2, (bound,) * 2, 1)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(ref),
                                   atol=1e-11)


def test_separable_push_is_adjoint():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((5, 6)))
    v = jnp.asarray(rng.standard_normal((8, 9)))
    lx = jnp.asarray(rng.uniform(0, 7, 5))
    ly = jnp.asarray(rng.uniform(0, 8, 6))
    Rv = separable_pull(v, [lx, ly], (3, 3), (3, 3), 1)
    Rtu = separable_push(u, [lx, ly], (8, 9), (3, 3), (3, 3), 1)
    np.testing.assert_allclose(float(jnp.vdot(Rtu, v)),
                               float(jnp.vdot(u, Rv)), rtol=1e-11)


class TestResizeUsesBothPaths:
    """resize/restrict must give identical results on the separable fast
    path (default) and the forced-xla gather path."""

    @pytest.mark.parametrize("anchor", ["centers", "edges", "first",
                                        "last"])
    @pytest.mark.parametrize("order", [1, 3])
    def test_resize_paths_agree(self, anchor, order):
        rng = np.random.default_rng(4)
        img = rng.standard_normal((2, 3, 8, 9))
        fast = itp.resize(img, factor=[2, 1.5], anchor=anchor,
                          interpolation=order, prefilter=True)
        with backend.use_backend("xla"):
            slow = itp.resize(img, factor=[2, 1.5], anchor=anchor,
                              interpolation=order, prefilter=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-11)

    @pytest.mark.parametrize("anchor", ["centers", "edges"])
    def test_restrict_paths_agree(self, anchor):
        rng = np.random.default_rng(5)
        img = rng.standard_normal((2, 3, 8, 8))
        fast = itp.restrict(img, factor=[2, 2], anchor=anchor,
                            interpolation=1)
        with backend.use_backend("xla"):
            slow = itp.restrict(img, factor=[2, 2], anchor=anchor,
                                interpolation=1)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-11)

    def test_label_resize_still_works(self):
        rng = np.random.default_rng(6)
        labels = rng.integers(0, 3, (1, 1, 8, 8))
        out = itp.resize(labels, factor=[2, 2], interpolation=1,
                         prefilter=False)
        assert out.shape == (1, 1, 16, 16)
        assert set(np.unique(np.asarray(out))) <= {0, 1, 2}
