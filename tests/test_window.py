"""Windowed (gather-free) warp fast path: exact agreement with the
general kernels under the bounded-displacement contract, plus gradient
correctness through its custom VJPs and API-level dispatch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

import interpol_tpu as itp
from interpol_tpu.ops import ndkernels as nd
from interpol_tpu.ops import window as wd


def warp_case(D, seed=0, disp=1.5):
    rng = np.random.default_rng(seed)
    ish = {1: (32,), 2: (12, 16), 3: (8, 10, 12)}[D]
    C = 2
    inp = jnp.asarray(rng.standard_normal((C, *ish)))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    grid = jnp.asarray(ident + rng.uniform(-disp, disp, ident.shape))
    return inp, grid, ish


CASES = [
    (1, 3, 6, 1), (1, 7, 3, 0),
    (2, 1, 3, 1), (2, 0, 0, 1), (2, 3, 4, 1), (2, 2, 5, 0),
    (3, 1, 3, 1), (3, 3, 2, 1), (3, 3, 1, 2),
]


@pytest.mark.parametrize("D,order,bound,ex", CASES)
def test_window_matches_core(D, order, bound, ex):
    inp, grid, ish = warp_case(D)
    o, b = (order,) * D, (bound,) * D
    ref = nd.pull_core(inp, grid.reshape(-1, D), o, b, ex).reshape(
        inp.shape)
    out = wd.pull_window(inp, grid, o, b, ex, 1.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refg = nd.grad_core(inp, grid.reshape(-1, D), o, b, ex).reshape(
        inp.shape + (D,))
    outg = wd.grad_window(inp, grid, o, b, ex, 1.5)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)

    refp = nd.push_core(inp.reshape(inp.shape[0], -1),
                        grid.reshape(-1, D), ish, o, b, ex)
    outp = wd.push_window(inp, grid, o, b, ex, 1.5)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-11)


@pytest.mark.parametrize("max_disp", [0.5, 1.0, 1.5, 2.0])
def test_window_order0_extreme_displacements(max_disp):
    """Order 0 uses round-half-even nodes: the window must cover taps at
    displacements of exactly ±max_disp and at half-integer crossings
    (regression: the floor-based window formula dropped the tap for
    |disp| > 0.5, returning 0 for ~half the voxels)."""
    rng = np.random.default_rng(7)
    ish = (9, 11)
    D = 2
    inp = jnp.asarray(rng.standard_normal((1, *ish)))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    eps = 1e-9
    # deterministic extremes: window contract boundaries and every
    # half-integer crossing inside the budget, both signs
    vals = [0.0, max_disp, -max_disp, max_disp - eps, -(max_disp - eps)]
    vals += [s * (k + 0.5) for k in range(int(max_disp + 0.5))
             for s in (1.0, -1.0)]
    vals += [s * (k + 0.5 - eps) for k in range(int(max_disp + 0.5))
             for s in (1.0, -1.0)]
    disp = np.asarray(vals)[
        rng.integers(0, len(vals), ident.shape)]
    grid = jnp.asarray(ident + disp)
    o, b = (0,) * D, (3,) * D
    ref = nd.pull_core(inp, grid.reshape(-1, D), o, b, 1).reshape(
        inp.shape)
    out = wd.pull_window(inp, grid, o, b, 1, max_disp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)
    refp = nd.push_core(inp.reshape(inp.shape[0], -1),
                        grid.reshape(-1, D), ish, o, b, 1)
    outp = wd.push_window(inp, grid, o, b, 1, max_disp)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-12)


def test_window_adjoint():
    inp, grid, ish = warp_case(2, seed=1)
    u = jnp.asarray(np.random.default_rng(2).standard_normal(inp.shape))
    o, b = (3, 3), (3, 3)
    lhs = jnp.vdot(wd.push_window(u, grid, o, b, 1, 1.5), inp)
    rhs = jnp.vdot(u, wd.pull_window(inp, grid, o, b, 1, 1.5))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-11)


@pytest.mark.parametrize("order,bound", [(1, 3), (3, 6), (2, 0)])
def test_window_gradcheck(order, bound):
    rng = np.random.default_rng(3)
    ish = (6, 7)
    inp = jnp.asarray(rng.standard_normal((1, *ish)))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    grid = jnp.asarray(ident + rng.uniform(-0.8, 0.8, ident.shape))
    o, b = (order,) * 2, (bound,) * 2
    f = jax.jit(lambda v, g: wd.pull_window(v, g, o, b, 1, 1.0))
    check_grads(f, (inp, grid), order=2, modes=["rev"],
                atol=1e-6, rtol=2e-3)
    fp = jax.jit(lambda v, g: wd.push_window(v, g, o, b, 1, 1.0))
    check_grads(fp, (inp, grid), order=1, modes=["rev"],
                atol=1e-6, rtol=2e-3)


def test_api_max_disp_dispatch_matches():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, 3, 10, 12))
    ident = np.stack(np.meshgrid(np.arange(10), np.arange(12),
                                 indexing="ij"), -1).astype(np.float64)
    grid = ident[None] + rng.uniform(-1.2, 1.2, (2, 10, 12, 2))
    a = itp.grid_pull(img, grid, interpolation=3, bound="dct2",
                      extrapolate=True)
    bq = itp.grid_pull(img, grid, interpolation=3, bound="dct2",
                       extrapolate=True, max_disp=1.2)
    np.testing.assert_allclose(np.asarray(bq), np.asarray(a), atol=1e-11)

    c = itp.grid_push(img, grid, interpolation=3, bound="dct2",
                      extrapolate=True)
    d = itp.grid_push(img, grid, interpolation=3, bound="dct2",
                      extrapolate=True, max_disp=1.2)
    np.testing.assert_allclose(np.asarray(d), np.asarray(c), atol=1e-11)

    e = itp.grid_grad(img, grid, interpolation=3, bound="dct2",
                      extrapolate=True)
    f = itp.grid_grad(img, grid, interpolation=3, bound="dct2",
                      extrapolate=True, max_disp=1.2)
    np.testing.assert_allclose(np.asarray(f), np.asarray(e), atol=1e-11)


def test_warp_model_trains():
    from interpol_tpu.models import WarpModel, train_step

    rng = np.random.default_rng(5)
    model = WarpModel(vol_shape=(12, 12), coarse_shape=(4, 4),
                      interpolation=1, max_disp=2.0)
    moving = jnp.asarray(rng.standard_normal((1, 1, 12, 12)),
                         dtype=jnp.float32)
    # fixed = moving shifted: the model should reduce the loss
    fixed = jnp.roll(moving, 1, axis=2)
    params = model.init_params(1)
    losses = []
    for _ in range(5):
        params, loss = train_step(model, params, moving, fixed, lr=1.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_wide_window_chunking_exact(monkeypatch):
    """Windows wider than the kernel's unroll cap split into exact
    sub-range launches that sum: forcing a tiny cap must reproduce the
    single-launch results bit-for-bit in exact arithmetic."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from interpol_tpu import backend
    from interpol_tpu.ops import window as wd

    rng = np.random.default_rng(13)
    ish = (16, 16, 64)
    inp = jnp.asarray(rng.standard_normal((1,) + ish))
    ident = np.stack(np.meshgrid(*[np.arange(n) for n in ish],
                                 indexing="ij"), -1).astype(np.float64)
    grid = jnp.asarray(ident + rng.uniform(-2, 2, ident.shape))
    o, b = (3,) * 3, (3,) * 3

    ref = wd._pull_impl(inp, grid, o, b, 1, 2.0)     # XLA full window
    refg = wd._grad_impl(inp, grid, o, b, 1, 2.0)
    refp = wd._push_impl(inp, grid, o, b, 1, 2.0)
    monkeypatch.setattr(wd, "_SPAN_CAP", 4)          # S=8 -> 2 chunks/axis
    monkeypatch.setattr(wd, "_PUSH_SPAN_CAP", 5)
    with backend.use_backend("pallas"), \
            pltpu.force_tpu_interpret_mode():
        out = wd._pull_impl(inp, grid, o, b, 1, 2.0)
        outg = wd._grad_impl(inp, grid, o, b, 1, 2.0)
        outp = wd._push_impl(inp, grid, o, b, 1, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-12)
