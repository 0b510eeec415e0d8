"""Scattered-grid native tier (interpret mode): exact agreement with
the generic gather core for arbitrary point clouds, including the
fallback paths (out-of-volume points, box-capacity overflow)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpol_tpu.ops import ndkernels as nd
from interpol_tpu.ops import scattered as sc


def cloud(P=400, ish=(12, 12, 24), seed=0, C=2, outside=0.0):
    rng = np.random.default_rng(seed)
    inp = jnp.asarray(rng.standard_normal((C,) + ish))
    lo, hi = 0.0, np.asarray(ish) - 1.0
    pts = rng.uniform(lo, hi, (P, 3))
    if outside:
        n_out = int(P * outside)
        pts[:n_out] = rng.uniform(-3.0, np.asarray(ish) + 2.0, (n_out, 3))
    return inp, jnp.asarray(pts)


@pytest.mark.parametrize("orders,bounds,ex", [
    ((3, 3, 3), (3, 3, 3), 1),
    ((1, 1, 1), (6, 6, 6), 1),
    pytest.param((3, 2, 1), (0, 4, 5), 0, marks=pytest.mark.slow),
    ((0, 3, 3), (2, 2, 2), 1),
    pytest.param((5, 5, 5), (1, 1, 1), 2, marks=pytest.mark.slow),
])
def test_scattered_matches_core(orders, bounds, ex):
    inp, pts = cloud()
    ref = nd.pull_core(inp, pts, orders, bounds, ex)
    out = sc.pull_scattered(inp, pts, orders, bounds, ex,
                            box=(4, 4, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refg = nd.grad_core(inp, pts, orders, bounds, ex)
    outg = sc.grad_scattered(inp, pts, orders, bounds, ex,
                             box=(4, 4, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)


@pytest.mark.parametrize("ex", [0, 1, 2])
def test_scattered_out_of_volume_fallback(ex):
    """Points outside the closed volume bounds route through the exact
    cond-fallback (extrapolate=1 computes them; 0/2 mask per the
    inbounds threshold)."""
    inp, pts = cloud(P=400, outside=0.3, seed=1)
    o, b = (3,) * 3, (3,) * 3
    ref = nd.pull_core(inp, pts, o, b, ex)
    out = sc.pull_scattered(inp, pts, o, b, ex, box=(4, 4, 8),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)


def test_scattered_capacity_overflow_exact():
    """More than CAP=128 points in one box: the overflow ranks must be
    computed by the fallback, not dropped."""
    rng = np.random.default_rng(2)
    ish = (16, 16, 32)
    inp = jnp.asarray(rng.standard_normal((1,) + ish))
    # 300 points clustered inside a single (4, 4, 8) box core
    pts = rng.uniform([4.0, 4.0, 8.0], [7.5, 7.5, 15.5], (300, 3))
    pts = jnp.asarray(np.concatenate(
        [pts, rng.uniform(0, np.asarray(ish) - 1, (200, 3))]))
    o, b = (3,) * 3, (3,) * 3
    ref = nd.pull_core(inp, pts, o, b, 1)
    out = sc.pull_scattered(inp, pts, o, b, 1, box=(4, 4, 8),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)


def test_scattered_overflow_round_two():
    """Between CAP and 2*CAP points in one box: the cond'd overflow
    round serves ranks 128+ exactly (pull, grad, push), without the
    XLA fallback."""
    rng = np.random.default_rng(24)
    ish = (16, 16, 32)
    inp = jnp.asarray(rng.standard_normal((2,) + ish))
    pts = jnp.asarray(np.concatenate([
        # ~200 points clustered inside a single (4, 4, 8) box core
        rng.uniform([4.0, 4.0, 8.0], [7.5, 7.5, 15.5], (200, 3)),
        rng.uniform(0, np.asarray(ish) - 1, (300, 3)),
    ]))
    o, b = (3,) * 3, (3,) * 3
    ref = nd.pull_core(inp, pts, o, b, 1)
    out = sc.pull_scattered(inp, pts, o, b, 1, box=(4, 4, 8),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refg = nd.grad_core(inp, pts, o, b, 1)
    outg = sc.grad_scattered(inp, pts, o, b, 1, box=(4, 4, 8),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)

    vals = jnp.asarray(rng.standard_normal((2, pts.shape[0])))
    refp = nd.push_core(vals, pts, ish, o, b, 1)
    outp = sc.push_scattered(vals, pts, ish, o, b, 1, box=(4, 4, 8),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-11)


def test_scattered_anisotropic_volume_and_order0():
    inp, pts = cloud(P=500, ish=(9, 20, 33), seed=3, C=1)
    o, b = (0, 1, 3), (5, 3, 6)
    ref = nd.pull_core(inp, pts, o, b, 1)
    out = sc.pull_scattered(inp, pts, o, b, 1, box=(4, 8, 8),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)


def test_api_dispatch_scattered_backend():
    """grid_pull / grid_grad WITHOUT max_disp route through the
    scattered native tier under the pallas backend (the auto backend's
    documented threshold is scattered.MIN_POINTS on a real TPU) and
    match the XLA gather path, including through the custom VJPs."""
    import interpol_tpu as itp
    from interpol_tpu import backend
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    ish = (12, 16, 32)
    img = jnp.asarray(rng.standard_normal((2,) + ish))
    # scattered clouds enter the API as an (N, 1, 1, 3) point lattice
    # (the shape engine — like the reference's — wants D spatial dims)
    pts = jnp.asarray(rng.uniform(0, np.asarray(ish) - 1,
                                  (900, 1, 1, 3)))

    ref = itp.grid_pull(img, pts, interpolation=3, bound="dct2",
                        extrapolate=True)
    refg = itp.grid_grad(img, pts, interpolation=3, bound="dct2",
                         extrapolate=True)

    def loss(v, g):
        return (itp.grid_pull(v, g, interpolation=3, bound="dct2",
                              extrapolate=True) ** 2).sum()

    refd = jax.grad(loss, argnums=(0, 1))(img, pts)

    with backend.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
        out = itp.grid_pull(img, pts, interpolation=3, bound="dct2",
                            extrapolate=True)
        outg = itp.grid_grad(img, pts, interpolation=3, bound="dct2",
                             extrapolate=True)
        outd = jax.grad(loss, argnums=(0, 1))(img, pts)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)
    for a, c in zip(outd, refd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)


def test_precomputed_tables_match():
    """pre= (cached box tables) reproduces the one-shot path exactly,
    including gradients through the cached table."""
    inp, pts = cloud(P=300)
    o, b = (3,) * 3, (3,) * 3
    box = (4, 4, 8)
    ref = sc.pull_scattered(inp, pts, o, b, 1, box=box, interpret=True)
    pre = sc.precompute_tables(inp, o, b, box)
    out = sc.pull_scattered(inp, pts, o, b, 1, box=box, interpret=True,
                            pre=pre)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0)

    def loss(v):
        t = sc.precompute_tables(v, o, b, box)
        return (sc.pull_scattered(v, pts, o, b, 1, box=box,
                                  interpret=True, pre=t) ** 2).sum()

    def loss_ref(v):
        return (sc.pull_scattered(v, pts, o, b, 1, box=box,
                                  interpret=True) ** 2).sum()

    ga = jax.grad(loss)(inp)
    gr = jax.grad(loss_ref)(inp)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=1e-9)


# ------------------------------------------------------------ push/count

@pytest.mark.parametrize("orders,bounds,ex", [
    ((3, 3, 3), (3, 3, 3), 1),
    ((1, 1, 1), (6, 6, 6), 1),
    pytest.param((3, 2, 1), (0, 4, 5), 0, marks=pytest.mark.slow),
    ((0, 3, 3), (2, 2, 2), 1),
    pytest.param((5, 5, 5), (1, 1, 1), 2, marks=pytest.mark.slow),
])
def test_scattered_push_matches_core(orders, bounds, ex):
    """The box-densifying MXU push kernel matches the XLA scatter core
    exactly (all bounds, mixed orders, extrapolation modes)."""
    inp, pts = cloud()
    C, P = 2, pts.shape[0]
    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.standard_normal((C, P)))
    ish = tuple(inp.shape[1:])
    ref = nd.push_core(vals, pts, ish, orders, bounds, ex)
    out = sc.push_scattered(vals, pts, ish, orders, bounds, ex,
                            box=(4, 4, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)


@pytest.mark.parametrize("ex", [0, 1])
def test_scattered_push_fallbacks(ex):
    """Out-of-volume points and box-capacity overflow route through the
    exact scatter-core fallback (incl. ex=0 points inside the inbounds
    threshold but outside the closed volume)."""
    rng = np.random.default_rng(8)
    ish = (16, 16, 32)
    vals = jnp.asarray(rng.standard_normal((1, 500)))
    pts = np.concatenate([
        rng.uniform([4.0, 4.0, 8.0], [7.5, 7.5, 15.5], (300, 3)),
        rng.uniform(-3.0, np.asarray(ish) + 2.0, (150, 3)),
        rng.uniform(-0.04, 0.04, (50, 3)),     # in-threshold, ineligible
    ])
    pts = jnp.asarray(pts)
    o, b = (3,) * 3, (3,) * 3
    ref = nd.push_core(vals, pts, ish, o, b, ex)
    out = sc.push_scattered(vals, pts, ish, o, b, ex, box=(4, 4, 8),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)


def test_scattered_count_and_vjp():
    """count = push of ones; push VJP matches the scatter core's
    (d_vals via scattered pull, d_grid via scattered grad)."""
    inp, pts = cloud(P=300)
    ish = tuple(inp.shape[1:])
    o, b = (3,) * 3, (3,) * 3
    refc = nd.count_core(pts, ish, o, b, 1)
    outc = sc.count_scattered(pts, ish, o, b, 1, box=(4, 4, 8),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(outc), np.asarray(refc),
                               atol=1e-11)

    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.standard_normal((2, pts.shape[0])))

    def f_sc(v, p):
        return (sc.push_scattered(v, p, ish, o, b, 1, box=(4, 4, 8),
                                  interpret=True) ** 2).sum()

    def f_nd(v, p):
        return (nd.push_core(v, p, ish, o, b, 1) ** 2).sum()

    for a, c in zip(jax.grad(f_sc, argnums=(0, 1))(vals, pts),
                    jax.grad(f_nd, argnums=(0, 1))(vals, pts)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)


def test_api_dispatch_scattered_push_count():
    """grid_push / grid_count on point clouds route through the
    scattered native tier under the pallas backend and match the XLA
    scatter path, including through the custom VJPs."""
    import interpol_tpu as itp
    from interpol_tpu import backend
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(10)
    ish = (12, 16, 32)
    pts = jnp.asarray(rng.uniform(0, np.asarray(ish) - 1,
                                  (900, 1, 1, 3)))
    vals = jnp.asarray(rng.standard_normal((2, 900, 1, 1)))

    ref = itp.grid_push(vals, pts, shape=ish, interpolation=3,
                        bound="dct2", extrapolate=True)
    refc = itp.grid_count(pts, shape=ish, interpolation=3,
                          bound="dct2", extrapolate=True)

    def loss(v, g):
        return (itp.grid_push(v, g, shape=ish, interpolation=3,
                              bound="dct2", extrapolate=True) ** 2).sum()

    refd = jax.grad(loss, argnums=(0, 1))(vals, pts)

    with backend.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
        out = itp.grid_push(vals, pts, shape=ish, interpolation=3,
                            bound="dct2", extrapolate=True)
        outc = itp.grid_count(pts, shape=ish, interpolation=3,
                              bound="dct2", extrapolate=True)
        outd = jax.grad(loss, argnums=(0, 1))(vals, pts)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(outc), np.asarray(refc),
                               atol=1e-11)
    for a, c in zip(outd, refd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)


# ------------------------------------------------------------ 2-D lift

def cloud2d(P=500, ish=(24, 40), seed=11, C=2, outside=0.0):
    rng = np.random.default_rng(seed)
    inp = jnp.asarray(rng.standard_normal((C,) + ish))
    pts = rng.uniform(0.0, np.asarray(ish) - 1.0, (P, 2))
    if outside:
        n_out = int(P * outside)
        pts[:n_out] = rng.uniform(-3.0, np.asarray(ish) + 2.0, (n_out, 2))
    return inp, jnp.asarray(pts)


@pytest.mark.parametrize("orders,bounds,ex", [
    ((3, 3), (3, 3), 1),
    ((1, 3), (6, 1), 1),
    pytest.param((0, 5), (4, 2), 0, marks=pytest.mark.slow),
])
def test_scattered_2d_matches_core(orders, bounds, ex):
    """2-D clouds ride the 3-D kernels via the zero-cost degenerate
    trailing axis (scattered._lift_2d): exact parity with the 2-D
    gather core for pull and grad."""
    inp, pts = cloud2d()
    ref = nd.pull_core(inp, pts, orders, bounds, ex)
    out = sc.pull_scattered(inp, pts, orders, bounds, ex,
                            box=(8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refg = nd.grad_core(inp, pts, orders, bounds, ex)
    outg = sc.grad_scattered(inp, pts, orders, bounds, ex,
                             box=(8, 8), interpret=True)
    assert outg.shape == refg.shape == (inp.shape[0], pts.shape[0], 2)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)


def test_scattered_2d_lift_is_free():
    """The degenerate axis must not inflate the table: TAB for the
    lifted 2-D box equals the rounded 2-D extent product (ext_z == 1,
    not 2 — the whole point of the box_geometry ishape rule)."""
    blo, ext, tab = sc.box_geometry((3, 3, 0), (8, 8, 1), (24, 40, 1))
    assert ext == (11, 11, 1)
    assert tab == -(-11 * 11 // 128) * 128
    # without ishape the conservative rule doubles it — documented
    _, ext_c, _ = sc.box_geometry((3, 3, 0), (8, 8, 1))
    assert ext_c == (11, 11, 2)


def test_scattered_2d_fallback_and_autobox():
    """Out-of-volume 2-D points route through the exact fallback; the
    auto box for a 2-D cloud comes from the 2-D ladder."""
    inp, pts = cloud2d(P=600, outside=0.3, seed=12)
    o, b = (3, 3), (3, 3)
    ref = nd.pull_core(inp, pts, o, b, 1)
    out = sc.pull_scattered(inp, pts, o, b, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)
    box = sc.auto_box(tuple(inp.shape[1:]), pts.shape[0])
    assert len(box) == 2
    box3 = sc.auto_box(tuple(inp.shape[1:]) + (1,), pts.shape[0])
    assert box3 == box + (1,)


def test_scattered_2d_push_count_and_vjp():
    """2-D scattered push/count parity + VJPs through the lift."""
    inp, pts = cloud2d(P=400, seed=13)
    ish = tuple(inp.shape[1:])
    o, b = (3, 3), (3, 3)
    rng = np.random.default_rng(14)
    vals = jnp.asarray(rng.standard_normal((2, pts.shape[0])))

    ref = nd.push_core(vals, pts, ish, o, b, 1)
    out = sc.push_scattered(vals, pts, ish, o, b, 1, box=(8, 8),
                            interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refc = nd.count_core(pts, ish, o, b, 1)
    outc = sc.count_scattered(pts, ish, o, b, 1, box=(8, 8),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(outc), np.asarray(refc),
                               atol=1e-11)

    def f_sc(v, p):
        return (sc.push_scattered(v, p, ish, o, b, 1, box=(8, 8),
                                  interpret=True) ** 2).sum()

    def f_nd(v, p):
        return (nd.push_core(v, p, ish, o, b, 1) ** 2).sum()

    for a, c in zip(jax.grad(f_sc, argnums=(0, 1))(vals, pts),
                    jax.grad(f_nd, argnums=(0, 1))(vals, pts)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)


def test_scattered_2d_precomputed_tables():
    """2-D pre= tables (lifted internally) reproduce the one-shot path
    exactly."""
    inp, pts = cloud2d(P=300, seed=15)
    o, b = (3, 3), (3, 3)
    box = (8, 8)
    ref = sc.pull_scattered(inp, pts, o, b, 1, box=box, interpret=True)
    pre = sc.precompute_tables(inp, o, b, box)
    out = sc.pull_scattered(inp, pts, o, b, 1, box=box, interpret=True,
                            pre=pre)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_api_dispatch_scattered_2d():
    """2-D point clouds route through the scattered tier under the
    pallas backend (pull/grad/push, incl. VJPs) and match the XLA
    path."""
    import interpol_tpu as itp
    from interpol_tpu import backend
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(16)
    ish = (24, 40)
    img = jnp.asarray(rng.standard_normal((2,) + ish))
    pts = jnp.asarray(rng.uniform(0, np.asarray(ish) - 1, (700, 1, 2)))

    ref = itp.grid_pull(img, pts, interpolation=3, bound="dct2",
                        extrapolate=True)
    refg = itp.grid_grad(img, pts, interpolation=3, bound="dct2",
                         extrapolate=True)

    def loss(v, g):
        return (itp.grid_pull(v, g, interpolation=3, bound="dct2",
                              extrapolate=True) ** 2).sum()

    refd = jax.grad(loss, argnums=(0, 1))(img, pts)

    with backend.use_backend("pallas"), pltpu.force_tpu_interpret_mode():
        out = itp.grid_pull(img, pts, interpolation=3, bound="dct2",
                            extrapolate=True)
        outg = itp.grid_grad(img, pts, interpolation=3, bound="dct2",
                             extrapolate=True)
        outd = jax.grad(loss, argnums=(0, 1))(img, pts)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)
    for a, c in zip(outd, refd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)


# ------------------------------------------- derivative adjoints / hess

def test_scattered_pushgrad_hess_match_core():
    """pushgrad (derivative-spec splat kernel) and hess (6-plane fused
    gather kernel) match the generic cores exactly."""
    inp, pts = cloud(P=350, seed=17)
    ish = tuple(inp.shape[1:])
    o, b = (3,) * 3, (3,) * 3
    rng = np.random.default_rng(18)
    ct = jnp.asarray(rng.standard_normal((2, pts.shape[0], 3)))

    ref = nd.pushgrad_core(ct, pts, ish, o, b, 1)
    out = sc.pushgrad_scattered(ct, pts, ish, o, b, 1, box=(4, 4, 8),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refh = nd.hess_core(inp, pts, o, b, 1)
    outh = sc.hess_scattered(inp, pts, o, b, 1, box=(4, 4, 8),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(outh), np.asarray(refh),
                               atol=1e-11)


def test_scattered_pushgrad_hess_2d():
    """2-D pushgrad / hess ride the degenerate-axis lift."""
    inp, pts = cloud2d(P=300, seed=20)
    ish = tuple(inp.shape[1:])
    o, b = (3, 3), (3, 3)
    rng = np.random.default_rng(21)
    ct = jnp.asarray(rng.standard_normal((2, pts.shape[0], 2)))

    ref = nd.pushgrad_core(ct, pts, ish, o, b, 1)
    out = sc.pushgrad_scattered(ct, pts, ish, o, b, 1, box=(8, 8),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refh = nd.hess_core(inp, pts, o, b, 1)
    outh = sc.hess_scattered(inp, pts, o, b, 1, box=(8, 8),
                             interpret=True)
    assert outh.shape == (inp.shape[0], pts.shape[0], 2, 2)
    np.testing.assert_allclose(np.asarray(outh), np.asarray(refh),
                               atol=1e-11)


def test_scattered_grad_fully_native_second_order():
    """First-order AD through grad_scattered runs the native pushgrad +
    hess kernels (no XLA-core straggler) and matches the generic core's
    derivatives; rev-of-rev HVP through pull_scattered also agrees."""
    inp, pts = cloud(P=250, seed=19, C=1)
    o, b = (3,) * 3, (3,) * 3

    def loss_sc(v, p):
        return (sc.grad_scattered(v, p, o, b, 1, box=(4, 4, 8),
                                  interpret=True) ** 2).sum()

    def loss_nd(v, p):
        return (nd.grad_core(v, p, o, b, 1) ** 2).sum()

    for a, c in zip(jax.grad(loss_sc, argnums=(0, 1))(inp, pts),
                    jax.grad(loss_nd, argnums=(0, 1))(inp, pts)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)

    rng = np.random.default_rng(22)
    tang = jnp.asarray(rng.standard_normal(pts.shape))

    def pl_sc(v, p):
        return (sc.pull_scattered(v, p, o, b, 1, box=(4, 4, 8),
                                  interpret=True) ** 2).sum()

    def pl_nd(v, p):
        return (nd.pull_core(v, p, o, b, 1) ** 2).sum()

    def hvp(fn):
        return jax.grad(
            lambda p: (jax.grad(fn, argnums=1)(inp, p) * tang).sum())

    np.testing.assert_allclose(np.asarray(hvp(pl_sc)(pts)),
                               np.asarray(hvp(pl_nd)(pts)), atol=1e-8)


@pytest.mark.slow
def test_scattered_third_order_smoke():
    """Third-order reverse AD through grad_scattered terminates on the
    documented XLA trace legs (never a raw pallas_call) and matches the
    generic core."""
    inp, pts = cloud(P=120, seed=23, C=1)
    o, b = (3,) * 3, (3,) * 3

    def make(fn):
        def f1(p):
            return (fn(inp, p) ** 2).sum()

        def f2(p):
            return (jax.grad(f1)(p) ** 2).sum()

        return jax.grad(f2)

    f_sc = make(lambda v, p: sc.grad_scattered(v, p, o, b, 1,
                                               box=(4, 4, 8),
                                               interpret=True))
    f_nd = make(lambda v, p: nd.grad_core(v, p, o, b, 1))
    np.testing.assert_allclose(np.asarray(f_sc(pts)),
                               np.asarray(f_nd(pts)), atol=1e-7)


# ------------------------------------------------------------ 1-D lift

def cloud1d(P=400, L=300, seed=15, C=2, outside=0.0):
    rng = np.random.default_rng(seed)
    inp = jnp.asarray(rng.standard_normal((C, L)))
    pts = rng.uniform(0.0, L - 1.0, (P, 1))
    if outside:
        n_out = int(P * outside)
        pts[:n_out] = rng.uniform(-3.0, L + 2.0, (n_out, 1))
    return inp, jnp.asarray(pts)


def test_scattered_1d_matches_core():
    """1-D clouds ride the 3-D kernels via TWO zero-cost degenerate
    trailing axes (round 5 — last dim gap vs jitfields, reference
    interpol/jitfields.py:47-114): exact parity for the full op
    family."""
    inp, pts = cloud1d(outside=0.2)
    o, b = (3,), (3,)
    ref = nd.pull_core(inp, pts, o, b, 1)
    out = sc.pull_scattered(inp, pts, o, b, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-11)

    refg = nd.grad_core(inp, pts, o, b, 1)
    outg = sc.grad_scattered(inp, pts, o, b, 1, interpret=True)
    assert outg.shape == refg.shape == (inp.shape[0], pts.shape[0], 1)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=1e-11)

    refh = nd.hess_core(inp, pts, o, b, 1)
    outh = sc.hess_scattered(inp, pts, o, b, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(outh), np.asarray(refh),
                               atol=1e-11)

    L = inp.shape[1]
    rng = np.random.default_rng(16)
    vals = jnp.asarray(rng.standard_normal((2, pts.shape[0])))
    refp = nd.push_core(vals, pts, (L,), o, b, 1)
    outp = sc.push_scattered(vals, pts, (L,), o, b, 1, interpret=True)
    assert outp.shape == refp.shape == (2, L)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-11)

    ct = jnp.asarray(rng.standard_normal((2, pts.shape[0], 1)))
    refpg = nd.pushgrad_core(ct, pts, (L,), o, b, 1)
    outpg = sc.pushgrad_scattered(ct, pts, (L,), o, b, 1,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(outpg), np.asarray(refpg),
                               atol=1e-11)

    box = sc.auto_box((L,), pts.shape[0])
    assert len(box) == 1
    assert sc.auto_box((L, 1, 1), pts.shape[0]) == box + (1, 1)


def test_scattered_1d_vjp():
    """First- and second-order AD through the doubly-lifted tier."""
    inp, pts = cloud1d(P=200, L=120, seed=17, C=1)
    o, b = (3,), (3,)

    def loss(v, p):
        return (sc.pull_scattered(v, p, o, b, 1, interpret=True) ** 2).sum()

    def rloss(v, p):
        return (nd.pull_core(v, p, o, b, 1) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1))(inp, pts)
    r = jax.grad(rloss, argnums=(0, 1))(inp, pts)
    for a, c in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)

    def lossg(v, p):
        return (sc.grad_scattered(v, p, o, b, 1, interpret=True) ** 2).sum()

    def rlossg(v, p):
        return (nd.grad_core(v, p, o, b, 1) ** 2).sum()

    gg = jax.grad(lossg, argnums=(0, 1))(inp, pts)
    rr = jax.grad(rlossg, argnums=(0, 1))(inp, pts)
    for a, c in zip(gg, rr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-9)
