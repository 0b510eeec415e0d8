"""Multi-device tests on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 in conftest — the JAX
analogue of the reference's cpu-multithread device coverage).

Every sharded op must agree exactly with its single-device counterpart.
"""
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from interpol_tpu.ops import pushpull as pp
from interpol_tpu.parallel import batch as dp
from interpol_tpu.parallel import spatial as sp


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices, have {len(jax.devices())}")


def make_mesh(n, name):
    return Mesh(np.array(jax.devices()[:n]), (name,))


class TestBatchDP:
    def test_pull_dp_matches(self):
        require_devices(4)
        mesh = make_mesh(4, "data")
        rng = np.random.default_rng(0)
        inp = jnp.asarray(rng.standard_normal((8, 2, 6, 5)))
        grid = jnp.asarray(rng.uniform(-1, 6, (8, 4, 3, 2)))
        o, b = (3, 3), (3, 3)
        ref = pp.pull(inp, grid, o, b, 1)
        out = dp.pull_dp(inp, grid, o, b, 1, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    def test_push_count_grad_dp_match(self):
        require_devices(4)
        mesh = make_mesh(4, "data")
        rng = np.random.default_rng(1)
        inp = jnp.asarray(rng.standard_normal((8, 2, 4, 3)))
        grid = jnp.asarray(rng.uniform(-1, 6, (8, 4, 3, 2)))
        o, b = (2, 2), (6, 6)
        np.testing.assert_allclose(
            np.asarray(dp.push_dp(inp, grid, (6, 5), o, b, 1, mesh=mesh)),
            np.asarray(pp.push(inp, grid, (6, 5), o, b, 1)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(dp.count_dp(grid, (6, 5), o, b, 1, mesh=mesh)),
            np.asarray(pp.count(grid, (6, 5), o, b, 1)), atol=1e-12)
        inp2 = jnp.asarray(rng.standard_normal((8, 2, 6, 5)))
        np.testing.assert_allclose(
            np.asarray(dp.grad_dp(inp2, grid, o, b, 1, mesh=mesh)),
            np.asarray(pp.grad(inp2, grid, o, b, 1)), atol=1e-12)


def spatial_case(order, bound, seed=0, n=32, disp=1.5):
    """Volume sharded along axis 0; grid = identity + bounded displacement
    (the halo-contract regime)."""
    rng = np.random.default_rng(seed)
    B, C = 2, 2
    ishape = (n, 6)
    inp = rng.standard_normal((B, C, *ishape))
    mesh1 = np.stack(np.meshgrid(np.arange(n), np.arange(6),
                                 indexing="ij"), -1).astype(np.float64)
    grid = mesh1[None] + rng.uniform(-disp, disp, (B, n, 6, 2))
    return jnp.asarray(inp), jnp.asarray(grid), ishape


class TestSpatialSharding:
    @pytest.mark.parametrize("order,bound", [(1, 3), (3, 6), (3, 0),
                                             (2, 5), (5, 2)])
    def test_pull_sharded_matches(self, order, bound):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(order, bound)
        o, b = (order,) * 2, (bound,) * 2
        ref = pp.pull(inp, grid, o, b, 1)
        out = sp.pull_sharded(inp, grid, o, b, 1, mesh=mesh, max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)

    @pytest.mark.parametrize("order,bound", [(1, 3), (3, 6), (2, 0)])
    def test_push_sharded_matches(self, order, bound):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(order, bound, seed=1)
        o, b = (order,) * 2, (bound,) * 2
        ref = pp.push(inp, grid, ishape, o, b, 1)
        out = sp.push_sharded(inp, grid, ishape, o, b, 1, mesh=mesh,
                              max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)

    def test_count_sharded_matches(self):
        require_devices(4)
        mesh = make_mesh(4, "x")
        _, grid, ishape = spatial_case(3, 3, seed=2)
        o, b = (3, 3), (3, 3)
        ref = pp.count(grid, ishape, o, b, 1)
        out = sp.count_sharded(grid, ishape, o, b, 1, mesh=mesh,
                               max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)

    def test_grad_sharded_matches(self):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(3, 3, seed=3)
        o, b = (3, 3), (3, 3)
        ref = pp.grad(inp, grid, o, b, 1)
        out = sp.grad_sharded(inp, grid, o, b, 1, mesh=mesh, max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)

    def test_pull_sharded_8dev(self):
        require_devices(8)
        mesh = make_mesh(8, "x")
        inp, grid, _ = spatial_case(3, 3, seed=4, n=64)
        o, b = (3, 3), (3, 3)
        ref = pp.pull(inp, grid, o, b, 1)
        out = sp.pull_sharded(inp, grid, o, b, 1, mesh=mesh, max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)

    def test_halo_contract_validated(self):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(3, 3)
        with pytest.raises(ValueError):
            sp.pull_sharded(inp, grid, (3, 3), (3, 3), 1, mesh=mesh,
                            halo=100)

    def test_pull_sharded_differentiable(self):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, _ = spatial_case(3, 6, seed=5)
        o, b = (3, 3), (6, 6)

        def loss_sharded(v, g):
            return (sp.pull_sharded(v, g, o, b, 1, mesh=mesh,
                                    max_disp=1.5) ** 2).sum()

        def loss_ref(v, g):
            return (pp.pull(v, g, o, b, 1) ** 2).sum()

        gs = jax.grad(loss_sharded, argnums=(0, 1))(inp, grid)
        gr = jax.grad(loss_ref, argnums=(0, 1))(inp, grid)
        np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]),
                                   atol=1e-10)


class TestShardedCoeff:
    def test_coeff_sharded_matches(self):
        require_devices(4)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from interpol_tpu.parallel.coeff import spline_coeff_nd_sharded
        from interpol_tpu.ops.coeff import spline_coeff_nd

        mesh = make_mesh(4, "x")
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "x")))
        orders, bounds = (3, 3, 3), (3, 3, 6)

        shard = NamedSharding(mesh, P(None, "x"))

        @partial(jax.jit, out_shardings=shard)
        def f(v):
            return spline_coeff_nd_sharded(v, orders, bounds, 3,
                                           mesh=mesh, axis_name="x",
                                           sharded_axis=0)

        out = f(xs)
        ref = spline_coeff_nd(x, orders, bounds, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)
        assert out.sharding.spec == P(None, "x")


class TestPointSharding:
    """Point-axis data parallelism for scattered grids
    (parallel/points.py): exact match vs the single-device ops, and
    zero-extra-collective differentiability through the psum'd splat."""

    def _case(self, seed=0, P_pts=24, ish=(7, 6)):
        rng = np.random.default_rng(seed)
        B, C, D = 2, 2, len(ish)
        inp = jnp.asarray(rng.standard_normal((B, C) + ish))
        pts = jnp.asarray(rng.uniform(-1, max(ish), (B, P_pts, D)))
        vals = jnp.asarray(rng.standard_normal((B, C, P_pts)))
        return inp, pts, vals

    def test_pull_grad_points_match(self):
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "data")
        inp, pts, _ = self._case(3)
        o, b = (3, 3), (3, 3)
        np.testing.assert_allclose(
            np.asarray(ps.pull_points(inp, pts, o, b, 1, mesh=mesh)),
            np.asarray(pp.pull(inp, pts, o, b, 1)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ps.grad_points(inp, pts, o, b, 1, mesh=mesh)),
            np.asarray(pp.grad(inp, pts, o, b, 1)), atol=1e-12)

    def test_push_count_points_match(self):
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "data")
        inp, pts, vals = self._case(4)
        o, b, osh = (2, 2), (6, 6), (7, 6)
        np.testing.assert_allclose(
            np.asarray(ps.push_points(vals, pts, osh, o, b, 1,
                                      mesh=mesh)),
            np.asarray(pp.push(vals, pts, osh, o, b, 1)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ps.count_points(pts, osh, o, b, 1, mesh=mesh)),
            np.asarray(pp.count(pts, osh, o, b, 1)), atol=1e-12)

    def test_point_sharded_loss_grads_match(self):
        """d(loss)/d(volume) and d(loss)/d(points) through the
        point-sharded pull == the single-device gradients (the custom
        VJPs compose with shard_map + the psum transpose)."""
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "data")
        inp, pts, _ = self._case(5)
        o, b = (3, 3), (3, 3)
        tgt = jnp.asarray(np.random.default_rng(9)
                          .standard_normal((2, 2, 24)))

        def loss_sh(v, g):
            out = ps.pull_points(v, g, o, b, 1, mesh=mesh)
            return jnp.sum((out - tgt) ** 2)

        def loss_1d(v, g):
            return jnp.sum((pp.pull(v, g, o, b, 1) - tgt) ** 2)

        gv_s, gp_s = jax.grad(loss_sh, argnums=(0, 1))(inp, pts)
        gv_r, gp_r = jax.grad(loss_1d, argnums=(0, 1))(inp, pts)
        np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_r),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_r),
                                   atol=1e-11)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == args[1].shape

    def test_dryrun_multichip(self):
        require_devices(8)
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestWindowPathDispatch:
    """The dense-warp window fast path and the generic gather path must
    agree inside shard_map (the auto-dispatch uses the window path for
    dense grids with max_disp > 0 and extrapolate=1)."""

    @pytest.mark.parametrize("bound", [0, 2, 3, 5, 6])
    def test_pull_window_vs_gather_path(self, bound):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(3, bound, seed=2)
        o, b = (3,) * 2, (bound,) * 2
        fast = sp.pull_sharded(inp, grid, o, b, 1, mesh=mesh,
                               max_disp=1.5, use_window=True)
        slow = sp.pull_sharded(inp, grid, o, b, 1, mesh=mesh,
                               max_disp=1.5, use_window=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-11)

    @pytest.mark.parametrize("bound", [1, 3, 6])
    def test_push_window_vs_gather_path(self, bound):
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(3, bound, seed=3)
        o, b = (3,) * 2, (bound,) * 2
        fast = sp.push_sharded(inp, grid, ishape, o, b, 1, mesh=mesh,
                               max_disp=1.5, use_window=True)
        slow = sp.push_sharded(inp, grid, ishape, o, b, 1, mesh=mesh,
                               max_disp=1.5, use_window=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-11)

    def test_extrapolate_falls_back_to_gather(self):
        # extrapolate != 1 masks against *global* extents, which the
        # local window kernels cannot see -> auto-dispatch must pick the
        # gather path and still match single-chip numerics
        require_devices(4)
        mesh = make_mesh(4, "x")
        inp, grid, ishape = spatial_case(3, 3, seed=4)
        o, b = (3,) * 2, (3,) * 2
        ref = pp.pull(inp, grid, o, b, 0)
        out = sp.pull_sharded(inp, grid, o, b, 0, mesh=mesh, max_disp=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-11)


class TestSlabPointSharding:
    """Scattered sampling on SLAB-SHARDED volumes (round 5 — the
    volume-scale regime where the volume exceeds one device's memory):
    exact match vs the replicated-volume ops, with points replicated,
    point-sharded on an orthogonal axis, and through AD."""

    def _case(self, seed=0, P_pts=48, ish=(16, 6, 5)):
        rng = np.random.default_rng(seed)
        B, C, D = 2, 2, len(ish)
        inp = jnp.asarray(rng.standard_normal((B, C) + ish))
        # in-volume points plus a few outside (exercise the
        # extrapolate mask through the ownership routing)
        pts = rng.uniform(0, np.asarray(ish) - 1, (B, P_pts, D))
        pts[:, :4] = rng.uniform(-2, np.asarray(ish) + 1, (B, 4, D))
        vals = jnp.asarray(rng.standard_normal((B, C, P_pts)))
        return inp, jnp.asarray(pts), vals

    @pytest.mark.parametrize("bound", [3, 2])   # dct2 + dft (ring wrap)
    def test_pull_grad_slab_match(self, bound):
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "x")
        inp, pts, _ = self._case(11)
        o, b = (3,) * 3, (bound,) * 3
        np.testing.assert_allclose(
            np.asarray(ps.pull_points_slab(inp, pts, o, b, 0,
                                           mesh=mesh)),
            np.asarray(pp.pull(inp, pts, o, b, 0)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ps.pull_points_slab(inp, pts, o, b, 1,
                                           mesh=mesh)),
            np.asarray(pp.pull(inp, pts, o, b, 1)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ps.grad_points_slab(inp, pts, o, b, 1,
                                           mesh=mesh)),
            np.asarray(pp.grad(inp, pts, o, b, 1)), atol=1e-12)

    def test_push_slab_match(self):
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "x")
        inp, pts, vals = self._case(12)
        o, b, osh = (3,) * 3, (3,) * 3, (16, 6, 5)
        np.testing.assert_allclose(
            np.asarray(ps.push_points_slab(vals, pts, osh, o, b, 1,
                                           mesh=mesh)),
            np.asarray(pp.push(vals, pts, osh, o, b, 1)), atol=1e-12)

    def test_2d_mesh_points_and_volume(self):
        """Volume sharded over 'x' AND points sharded over 'data' on a
        (2, 4) mesh: the full composition for huge-volume + huge-cloud."""
        require_devices(8)
        from interpol_tpu.parallel import points as ps
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("data", "x"))
        inp, pts, vals = self._case(13)
        o, b, osh = (3,) * 3, (3,) * 3, (16, 6, 5)
        np.testing.assert_allclose(
            np.asarray(ps.pull_points_slab(
                inp, pts, o, b, 1, mesh=mesh, point_axis="data")),
            np.asarray(pp.pull(inp, pts, o, b, 1)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ps.push_points_slab(
                vals, pts, osh, o, b, 1, mesh=mesh,
                point_axis="data")),
            np.asarray(pp.push(vals, pts, osh, o, b, 1)), atol=1e-12)

    def test_slab_points_loss_grads_match(self):
        """AD through the slab-routed pull (psum transposes to a
        broadcast; the masked gather core is plain jnp)."""
        require_devices(4)
        from interpol_tpu.parallel import points as ps
        mesh = make_mesh(4, "x")
        inp, pts, _ = self._case(14)
        o, b = (3,) * 3, (3,) * 3
        tgt = jnp.asarray(np.random.default_rng(9)
                          .standard_normal((2, 2, 48)))

        def loss_sh(v, g):
            out = ps.pull_points_slab(v, g, o, b, 1, mesh=mesh)
            return jnp.sum((out - tgt) ** 2)

        def loss_1d(v, g):
            return jnp.sum((pp.pull(v, g, o, b, 1) - tgt) ** 2)

        gv_s, gp_s = jax.grad(loss_sh, argnums=(0, 1))(inp, pts)
        gv_r, gp_r = jax.grad(loss_1d, argnums=(0, 1))(inp, pts)
        np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_r),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_r),
                                   atol=1e-10)
