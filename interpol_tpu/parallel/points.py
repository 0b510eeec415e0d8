"""Point-parallel scattered sampling: shard the POINT axis over devices.

The third distribution strategy, complementing batch DP
(`parallel/batch.py`) and spatial slab sharding (`parallel/spatial.py`):
for scattered-grid workloads (landmark tracking, surface sampling,
point-cloud losses) the natural axis to scale is the *point list* —
every sample point is independent, so with the volume replicated:

  * ``pull_points`` / ``grad_points`` need **zero collectives**: each
    device samples its own point shard with the single-chip op (on TPU
    that is the scattered Pallas tier of ``ops/scattered.py``, whose
    box sort and gather kernel then each see a P/ndev-sized problem —
    the schedule's ``lax.sort`` cost drops superlinearly);
  * the splat adjoints ``push_points`` / ``count_points`` accumulate
    into the shared volume: each device splats its shard into a private
    volume and ONE ``psum`` over the mesh axis merges them — exactly
    the race-free parallel-reduction layout the Pallas push kernel uses
    per-box, lifted to the mesh level, riding ICI.

Differentiation composes: ``shard_map`` is transparent to autodiff, the
inner ops carry hand-wired ``custom_vjp``s (pull ⊣ push), and the
``psum`` transposes to a broadcast — so ``jax.grad`` of a point-sharded
sampling loss needs zero extra collectives in the backward either.

The reference (single-device) has no equivalent; semantics match the
single-chip ops bit-for-bit (exact-match tests in
tests/test_sharding.py::TestPointSharding).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ndkernels as nd
from ..ops import pushpull as _pp

__all__ = ["pull_points", "grad_points", "push_points", "count_points",
           "pull_points_slab", "grad_points_slab", "push_points_slab"]


def _points_sharded(fn, mesh: Mesh, in_specs, out_spec,
                    reduce_axis: str = None):
    """shard_map ``fn`` over ``mesh`` with explicit specs;
    ``reduce_axis`` psums the result over that axis (splat ops)."""
    if reduce_axis is not None:
        inner = fn

        def fn(*args):
            return jax.lax.psum(inner(*args), reduce_axis)
    return jax.shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=out_spec, check_vma=False)


def pull_points(inp, points, orders, bounds, extrapolate, *,
                mesh: Mesh, axis_name: str = "data"):
    """Point-sharded scattered pull: (B, C, *ishape) replicated x
    (B, P, D) point-sharded -> (B, C, P) point-sharded.  P must divide
    the mesh axis."""
    f = partial(_pp.pull, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(), P(None, axis_name, None)),
        P(None, None, axis_name))(inp, points)


def grad_points(inp, points, orders, bounds, extrapolate, *,
                mesh: Mesh, axis_name: str = "data"):
    """Point-sharded scattered spatial gradients: -> (B, C, P, D)."""
    f = partial(_pp.grad, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(), P(None, axis_name, None)),
        P(None, None, axis_name, None))(inp, points)


def push_points(values, points, oshape: Tuple[int, ...], orders, bounds,
                extrapolate, *, mesh: Mesh, axis_name: str = "data"):
    """Point-sharded splat: (B, C, P) x (B, P, D) -> (B, C, *oshape)
    replicated (each device splats its shard; one psum merges)."""
    f = partial(_pp.push, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(None, None, axis_name), P(None, axis_name, None)),
        P(), reduce_axis=axis_name)(values, points)


def count_points(points, oshape: Tuple[int, ...], orders, bounds,
                 extrapolate, *, mesh: Mesh, axis_name: str = "data"):
    """Point-sharded splat density: (B, P, D) -> (B, 1, *oshape)."""
    f = partial(_pp.count, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(None, axis_name, None),), P(),
        reduce_axis=axis_name)(points)


# ------------------------------------------------ slab-sharded volumes
# Round-5 (r4 verdict stretch #3, the SURVEY §5 volume-scale axis): a
# volume too large for one device's HBM, sampled at scattered points.
# The volume rides the spatial slab sharding of parallel/spatial.py
# (first spatial axis split over ``vol_axis``, ring-exchanged halos);
# points may additionally shard over an orthogonal ``point_axis``.
#
# Routing is by OWNERSHIP MASK, not all-to-all: every device evaluates
# its point shard against its halo-extended slab with the gather core's
# global-folding mode (``fold_shapes`` folds taps against the GLOBAL
# axis length, ``shifts`` maps them into the local buffer — the same
# machinery the dense sharded gather path uses), masks points whose
# clipped axis-0 coordinate falls outside its slab, and one ``psum``
# over ``vol_axis`` merges (each point is owned by exactly one slab).
# Taps of an owned point reach at most (order+1)//2 + 1 rows past its
# position, so the halo guarantees every owned tap is local; global
# boundary folds land correctly because folding happens BEFORE the
# local mapping.  Non-owned points gather garbage (clamped indices) —
# multiplied by a zero mask, never by NaN.
#
# The inner op is the generic jnp core (differentiable to any order);
# the scattered Pallas tier needs the whole volume resident and so
# cannot serve this regime — by construction this path exists precisely
# when that is impossible.

def _slab_geom(ishape, mesh, vol_axis, orders, halo):
    from . import spatial as sp
    H = halo if halo is not None else sp.halo_width(orders, 0.0)
    ndev = mesh.shape[vol_axis]
    n_loc = sp._check(ishape[0], ndev, H)
    return H, ndev, n_loc


def _own_mask(pts, N, n_loc, vol_axis, wdtype):
    x0 = jax.lax.axis_index(vol_axis) * n_loc
    xc = jnp.clip(pts[..., 0], 0, N - 1)
    return ((xc >= x0) & (xc < x0 + n_loc)).astype(wdtype)


def pull_points_slab(inp, points, orders, bounds, extrapolate, *,
                     mesh: Mesh, vol_axis: str = "x",
                     point_axis: str = None, halo: int = None):
    """Scattered pull from a slab-sharded volume.

    inp (B, C, *ishape) sharded along spatial axis 0 over ``vol_axis``;
    points (B, P, D) sharded over ``point_axis`` (or replicated) ->
    (B, C, P) sharded like the points.  Exact match with the
    replicated-volume path (tests/test_sharding.py).

    Out-of-volume points (``extrapolate=1``) are exact while their
    boundary-folded taps stay within the owner slab's halo — i.e. for
    axis-0 excursions up to ~``halo`` voxels past the volume; raise
    ``halo`` for clouds that extrapolate further (``extrapolate=0``
    masks them regardless)."""
    from . import spatial as sp
    D = points.shape[-1]
    ishape = tuple(inp.shape[2:])
    H, ndev, n_loc = _slab_geom(ishape, mesh, vol_axis, orders, halo)

    def local(inp_loc, pts_loc):
        left, right = sp._exchange_halos(inp_loc, vol_axis, ndev, H)
        ext = jnp.concatenate([left, inp_loc, right], axis=2)
        shifts = (sp._shift(vol_axis, n_loc, H),) + (None,) * (D - 1)
        core = partial(nd.pull_core, orders=tuple(orders),
                       bounds=tuple(bounds), extrapolate=extrapolate,
                       fold_shapes=ishape, shifts=shifts)
        out = jax.vmap(core)(ext, pts_loc)            # (B, C, P_loc)
        own = _own_mask(pts_loc, ishape[0], n_loc, vol_axis, out.dtype)
        return jax.lax.psum(out * own[:, None], vol_axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, vol_axis), P(None, point_axis, None)),
        out_specs=P(None, None, point_axis),
        check_vma=False)(inp, points)


def grad_points_slab(inp, points, orders, bounds, extrapolate, *,
                     mesh: Mesh, vol_axis: str = "x",
                     point_axis: str = None, halo: int = None):
    """Scattered spatial gradients from a slab-sharded volume:
    -> (B, C, P, D) sharded like the points."""
    from . import spatial as sp
    D = points.shape[-1]
    ishape = tuple(inp.shape[2:])
    H, ndev, n_loc = _slab_geom(ishape, mesh, vol_axis, orders, halo)

    def local(inp_loc, pts_loc):
        left, right = sp._exchange_halos(inp_loc, vol_axis, ndev, H)
        ext = jnp.concatenate([left, inp_loc, right], axis=2)
        shifts = (sp._shift(vol_axis, n_loc, H),) + (None,) * (D - 1)
        core = partial(nd.grad_core, orders=tuple(orders),
                       bounds=tuple(bounds), extrapolate=extrapolate,
                       fold_shapes=ishape, shifts=shifts)
        out = jax.vmap(core)(ext, pts_loc)            # (B, C, P_loc, D)
        own = _own_mask(pts_loc, ishape[0], n_loc, vol_axis, out.dtype)
        return jax.lax.psum(out * own[:, None, :, None], vol_axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, vol_axis), P(None, point_axis, None)),
        out_specs=P(None, None, point_axis, None),
        check_vma=False)(inp, points)


def push_points_slab(values, points, oshape: Tuple[int, ...], orders,
                     bounds, extrapolate, *, mesh: Mesh,
                     vol_axis: str = "x", point_axis: str = None,
                     halo: int = None):
    """Scattered splat into a slab-sharded volume (adjoint of
    :func:`pull_points_slab`).

    values (B, C, P) / points (B, P, D) sharded over ``point_axis`` ->
    (B, C, *oshape) sharded along spatial axis 0 over ``vol_axis``.
    Each device splats its OWNED points into its halo-extended slab
    (global folds land via the modular local mapping), the margins ride
    the ring to their neighbor slabs, and a psum over ``point_axis``
    merges the point shards."""
    from . import spatial as sp
    D = points.shape[-1]
    oshape = tuple(oshape)
    H, ndev, n_loc = _slab_geom(oshape, mesh, vol_axis, orders, halo)
    ext_shape = (n_loc + 2 * H,) + oshape[1:]

    def local(vals_loc, pts_loc):
        B, C = vals_loc.shape[:2]
        own = _own_mask(pts_loc, oshape[0], n_loc, vol_axis,
                        vals_loc.dtype)
        shifts = (sp._shift(vol_axis, n_loc, H),) + (None,) * (D - 1)
        core = partial(nd.push_core, oshape=ext_shape,
                       orders=tuple(orders), bounds=tuple(bounds),
                       extrapolate=extrapolate, fold_shapes=oshape,
                       shifts=shifts)
        ext = jax.vmap(core)(vals_loc * own[:, None], pts_loc)
        out = ext[:, :, H:H + n_loc]
        if ndev == 1:
            out = out.at[:, :, -H:].add(ext[:, :, :H])
            out = out.at[:, :, :H].add(ext[:, :, -H:])
        else:
            bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
            fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
            from_right = jax.lax.ppermute(ext[:, :, :H], vol_axis, bwd)
            from_left = jax.lax.ppermute(ext[:, :, -H:], vol_axis, fwd)
            out = out.at[:, :, -H:].add(from_right)
            out = out.at[:, :, :H].add(from_left)
        if point_axis is not None:
            out = jax.lax.psum(out, point_axis)
        return out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, point_axis), P(None, point_axis, None)),
        out_specs=P(None, None, vol_axis),
        check_vma=False)(values, points)
