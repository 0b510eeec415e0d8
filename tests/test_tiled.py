"""Tiled one-hot-contraction path (ops/tiled.py): the MXU-matmul
formulation of dense-grid sampling.  Must agree exactly with the generic
kernels under the bounded-displacement contract."""
import numpy as np
import pytest

import jax.numpy as jnp

from interpol_tpu.ops import ndkernels as nd
from interpol_tpu.ops import tiled


def case(D, seed=0, disp=1.5):
    rng = np.random.default_rng(seed)
    ish = {1: (64,), 2: (24, 32), 3: (16, 16, 32)}[D]
    tile = {1: (16,), 2: (8, 16), 3: (4, 8, 16)}[D]
    C = 2
    inp = jnp.asarray(rng.standard_normal((C, *ish)))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    grid = jnp.asarray(ident + rng.uniform(-disp, disp, ident.shape))
    return inp, grid, ish, tile


@pytest.mark.parametrize("D", [1, 2, 3])
@pytest.mark.parametrize("order,bound,ex", [(1, 3, 1), (3, 0, 1),
                                            (3, 5, 0), (2, 1, 1)])
def test_tiled_pull_push_match_core(D, order, bound, ex):
    inp, grid, ish, tile = case(D)
    o, b = (order,) * D, (bound,) * D
    ref = nd.pull_core(inp, grid.reshape(-1, D), o, b, ex).reshape(
        inp.shape)
    out = tiled.pull_tiled(inp, grid, o, b, ex, max_disp=1.5, tile=tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-10)

    refp = nd.push_core(inp.reshape(inp.shape[0], -1),
                        grid.reshape(-1, D), ish, o, b, ex)
    outp = tiled.push_tiled(inp, grid, o, b, ex, max_disp=1.5, tile=tile)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-10)


def test_tiled_rejects_scattered_grid():
    inp = jnp.zeros((1, 8, 8))
    grid = jnp.zeros((5, 2))[None]
    with pytest.raises(ValueError):
        tiled.pull_tiled(inp, jnp.zeros((3, 4, 2)), (1, 1), (3, 3), 1,
                         max_disp=1.0, tile=(4, 4))
