"""Pallas warp kernel: interpret-mode equivalence with the windowed XLA
path (the on-chip compiled path is exercised by bench/scripts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpol_tpu.ops import pallas_warp, window


def case(seed=0, ish=(16, 16, 128), disp=1.5):
    rng = np.random.default_rng(seed)
    inp = jnp.asarray(rng.standard_normal(ish))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    grid = jnp.asarray(ident + rng.uniform(-disp, disp, ident.shape))
    return inp, grid


@pytest.mark.parametrize("orders,bounds", [
    ((3, 3, 3), (3, 3, 3)),
    ((1, 1, 1), (6, 6, 6)),
    ((3, 2, 1), (0, 4, 5)),
    ((5, 5, 5), (2, 2, 2)),
])
@pytest.mark.parametrize("ex", [0, 1])
def test_interpret_matches_window(orders, bounds, ex):
    inp, grid = case()
    ref = window.pull_window(inp[None], grid, orders, bounds, ex, 1.5)[0]
    out = pallas_warp.pull_window_pallas(inp, grid, orders, bounds, ex,
                                         1.5, tile=(8, 8, 64),
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_tile_divisibility_validated():
    inp, grid = case(ish=(16, 16, 100))
    with pytest.raises(ValueError):
        pallas_warp.pull_window_pallas(inp, grid, (3,) * 3, (3,) * 3, 1,
                                       1.5, tile=(8, 8, 64),
                                       interpret=True)


def test_adaptive_tile_192ish():
    # 192-divisible shapes pick a 64-lane tile and stay exact
    from interpol_tpu.ops.pallas_warp import default_tile
    # lane tiles must be 128-multiples or span the whole axis
    assert default_tile((192, 192, 192)) == (8, 8, 192)
    assert default_tile((128, 128, 128)) == (8, 8, 128)
    assert default_tile((100, 128, 128)) == (4, 8, 128)
    assert default_tile((128, 100, 128)) is None   # sublane indivisible

    inp, grid = case(ish=(16, 16, 192))
    ref = window.pull_window(inp[None], grid, (3,) * 3, (3,) * 3, 1,
                             1.5)[0]
    out = pallas_warp.pull_window_pallas(inp, grid, (3,) * 3, (3,) * 3,
                                         1, 1.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_bf16_inputs_compute_f32():
    # bf16 image with f32 coordinates (bf16 positions would quantize to
    # half-voxel ulps at |g| ~ 100); internal compute is f32
    inp, grid = case()
    out = pallas_warp.pull_window_pallas(
        inp.astype(jnp.bfloat16), grid.astype(jnp.float32),
        (3,) * 3, (3,) * 3, 1, 1.5, tile=(8, 8, 64), interpret=True)
    assert out.dtype == jnp.float32   # result_type(bf16, f32)
    ref = window.pull_window(inp[None], grid, (3,) * 3, (3,) * 3, 1,
                             1.5)[0]
    np.testing.assert_allclose(np.asarray(out, dtype=np.float64),
                               np.asarray(ref), atol=0.05)
