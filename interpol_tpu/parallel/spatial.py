"""Spatially-sharded pull/push/count/grad with ICI halo exchange.

New TPU-native capability (the reference is single-device only; SURVEY §5):
volumes too large for one chip are sharded into slabs along their first
spatial axis over a mesh axis, and sampling runs fully distributed:

  pull / grad : each device ring-exchanges (``ppermute``) a halo of width
      H with its neighbors, extends its slab, and samples locally — grid
      coordinates stay *global*; boundary folding is computed against the
      global axis length and mapped into halo-extended local coordinates
      by ``(folded + H - start) mod n_global``, which places circular (dft)
      edge folds exactly in the ring-exchanged halos, and reflective folds
      (≤ H voxels deep) inside the edge device's own slab.
  push / count : the adjoint — each device splats into a halo-extended
      local buffer, then the halo margins are ``ppermute``-d to the
      neighbors that own them and accumulated.  Deterministic by
      construction (pure local scatter + one ring add).

Correctness contract: every sample position must stay within ``max_disp``
voxels of its own slab (axis-0 displacement bound).  The required halo is
``ceil(max_disp) + (max(orders)+1)//2 + 1`` (support reach derived from the
node-origin convention, reference nd.py:45-49) — see :func:`halo_width`.
Positions violating the contract produce garbage only for themselves.

Semantics note (changed in round 2): when the grid is dense-warp shaped
and ``max_disp > 0``, pull/grad/push_sharded default to the *windowed*
fast path (``use_window=None`` → auto), which makes ``max_disp`` a hard
per-axis window bound on EVERY axis — samples displaced beyond it lose
taps exactly like single-device ``grid_pull(max_disp=...)``.  Previously
``max_disp`` only sized the axis-0 halo, so displacements slightly above
the declared bound (but within the halo) still sampled exactly.  Callers
relying on that slack should pass ``use_window=False`` to keep the
gather-core behavior (halo-bound only), or declare an honest
``max_disp``.

Collectives ride the mesh axis (ICI on TPU): two ``ppermute`` per op,
payload ``B*C*H*prod(rest)`` elements — independent of the slab size.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..options import BoundType
from ..ops import ndkernels as nd
from ..ops.bounds import fold_index, fold_sign

__all__ = ["halo_width", "pull_sharded", "push_sharded", "count_sharded",
           "grad_sharded"]


def halo_width(orders: Tuple[int, ...], max_disp: float = 0.0) -> int:
    """Halo needed for slab-sharded sampling with axis-0 displacements
    bounded by ``max_disp`` voxels."""
    return int(math.ceil(max_disp)) + (max(orders) + 1) // 2 + 1


def _check(n_global, ndev, H):
    n_loc = n_global // ndev
    if n_loc * ndev != n_global:
        raise ValueError(
            f"sharded axis ({n_global}) must divide the mesh axis ({ndev})")
    if H > n_loc:
        raise ValueError(f"halo ({H}) exceeds slab width ({n_loc})")
    if ndev > 1 and 2 * H + n_loc > n_global:
        raise ValueError(
            f"halo ({H}) too large: extended slab aliases (n={n_global})")
    return n_loc


def _exchange_halos(slab, axis_name, ndev, H):
    """Ring-exchange: returns (left_halo, right_halo) of width H along
    axis 2 of a (B, C, n_loc, ...) slab."""
    if ndev == 1:
        # Degenerate mesh: halos wrap onto the slab itself.
        return slab[:, :, -H:], slab[:, :, :H]
    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
    bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
    left = jax.lax.ppermute(slab[:, :, -H:], axis_name, fwd)
    right = jax.lax.ppermute(slab[:, :, :H], axis_name, bwd)
    return left, right


def _shift(axis_name, n_loc, H):
    """Local-coordinate shift: global folded index + shift, mod n_global,
    is the halo-extended buffer position."""
    start = jax.lax.axis_index(axis_name) * n_loc
    return H - start


# ------------------------------------------------ dense-warp fast path
# When the grid is dense (one sample per voxel) with |disp| <= max_disp,
# the shard-local sampling problem is itself a dense warp on the
# halo-extended slab, so the windowed/Pallas kernels (ops/window.py
# dispatch) run *inside* shard_map instead of the generic gather
# kernels.  Axis-0 boundary folding cannot be done per-tap there (the
# window path folds by padding), so the ring-exchanged halos are
# *corrected in place* on the edge devices: their halo content is
# replaced by the boundary fold of their own slab (every reflective
# fold of depth <= H lands inside the edge slab; dft wrap is exactly
# the ring content already).

def _edge_halo_tables(n_global, n_loc, H, bound):
    """Static fold tables for the edge-device halo correction.

    Returns (lf, ls, rf, rs): local row indices (and optional signs)
    inside the first/last slab that boundary-fold the global rows
    [-H..-1] / [n..n+H-1]."""
    li = np.arange(-H, 0)
    ri = np.arange(n_global, n_global + H)
    lf = fold_index(li, n_global, bound, xp=np)
    rf = fold_index(ri, n_global, bound, xp=np) - (n_global - n_loc)
    ls = fold_sign(li, n_global, bound, np.float32, xp=np)
    rs = fold_sign(ri, n_global, bound, np.float32, xp=np)
    if (lf >= n_loc).any() or (rf < 0).any():
        raise ValueError(
            f"boundary fold depth exceeds the slab width ({n_loc}); "
            "increase the per-device slab or reduce the halo")
    return lf, ls, rf, rs


def _dense_eligible(inp, grid, extrapolate, max_disp, bounds):
    ishape = tuple(inp.shape[2:])
    return (max_disp > 0 and extrapolate == 1
            and tuple(grid.shape[1:-1]) == ishape)


def _sgn(x, s, axis_rank):
    if s is None:
        return x
    shape = [1] * x.ndim
    shape[axis_rank] = len(s)
    return x * jnp.asarray(s, x.dtype).reshape(shape)


def _corrected_halos(slab, axis_name, ndev, H, n_global, bound):
    """Ring halos along axis 2, with boundary-correct content on the
    edge devices (no-op for dft: the wrap IS the ring content)."""
    left, right = _exchange_halos(slab, axis_name, ndev, H)
    if bound == BoundType.dft:
        return left, right
    n_loc = slab.shape[2]
    lf, ls, rf, rs = _edge_halo_tables(n_global, n_loc, H, bound)
    lfold = _sgn(jnp.take(slab, jnp.asarray(lf), axis=2), ls, 2)
    rfold = _sgn(jnp.take(slab, jnp.asarray(rf), axis=2), rs, 2)
    if bound == BoundType.zero:
        lfold, rfold = jnp.zeros_like(lfold), jnp.zeros_like(rfold)
    idx = jax.lax.axis_index(axis_name)
    shp = (1,) * slab.ndim
    is_first = (idx == 0).reshape(shp)
    is_last = (idx == ndev - 1).reshape(shp)
    left = jnp.where(is_first, lfold, left)
    right = jnp.where(is_last, rfold, right)
    return left, right


def _local_dense_grid(grid_loc, axis_name, n_loc, H, D):
    """Global grid coords -> halo-extended local frame, edge-padded to
    cover the extended slab (halo-row outputs are discarded)."""
    start = jax.lax.axis_index(axis_name) * n_loc
    off = jnp.zeros((D,), grid_loc.dtype).at[0].set(
        (start - H).astype(grid_loc.dtype))
    gl = grid_loc - off
    pads = [(0, 0), (H, H)] + [(0, 0)] * (D - 1) + [(0, 0)]
    return jnp.pad(gl, pads, mode="edge")


def pull_sharded(inp, grid, orders, bounds, extrapolate, *,
                 mesh: Mesh, axis_name: str = "x", halo: int = None,
                 max_disp: float = 0.0, batch_axis: str = None,
                 use_window: bool = None):
    """Slab-sharded grid_pull.

    inp (B, C, *ishape) and grid (B, *oshape, D) are sharded along their
    first spatial axis over ``mesh[axis_name]``; grid holds *global* voxel
    coordinates.  Returns (B, C, *oshape) with the same sharding.
    """
    D = grid.shape[-1]
    ishape = tuple(inp.shape[2:])
    H = halo if halo is not None else halo_width(orders, max_disp)
    ndev = mesh.shape[axis_name]
    n_loc = _check(ishape[0], ndev, H)
    if use_window is None:
        use_window = _dense_eligible(inp, grid, extrapolate, max_disp,
                                     bounds)

    if use_window:
        from ..ops import window as wd
        smin, smax = wd.window_range(max(orders), max_disp)
        assert H >= max(-smin, smax), (H, smin, smax)
        # axis-0 bound inside the local warp is irrelevant (interior
        # samples never reach the extended slab's own pad; halo-row
        # outputs are discarded) — use replicate, keep real bounds on
        # the unsharded axes
        lbounds = (int(BoundType.replicate),) + tuple(bounds[1:])

        def local_w(inp_loc, grid_loc):
            left, right = _corrected_halos(inp_loc, axis_name, ndev, H,
                                           ishape[0], bounds[0])
            ext = jnp.concatenate([left, inp_loc, right], axis=2)
            gext = _local_dense_grid(grid_loc, axis_name, n_loc, H, D)
            f = lambda v, g2: wd.pull_window(v, g2, tuple(orders),
                                             lbounds, 1, max_disp)
            out = jax.vmap(f)(ext, gext)
            return out[:, :, H:H + n_loc]

        return jax.shard_map(
            local_w, mesh=mesh,
            in_specs=(P(batch_axis, None, axis_name),
                      P(batch_axis, axis_name)),
            out_specs=P(batch_axis, None, axis_name),
            check_vma=False)(inp, grid)

    def local(inp_loc, grid_loc):
        left, right = _exchange_halos(inp_loc, axis_name, ndev, H)
        ext = jnp.concatenate([left, inp_loc, right], axis=2)
        shifts = (_shift(axis_name, n_loc, H),) + (None,) * (D - 1)
        gflat = grid_loc.reshape(grid_loc.shape[0], -1, D)
        core = partial(nd.pull_core, orders=orders, bounds=bounds,
                       extrapolate=extrapolate, fold_shapes=ishape,
                       shifts=shifts)
        out = jax.vmap(core)(ext, gflat)
        return out.reshape(out.shape[:2] + grid_loc.shape[1:-1])

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None, axis_name), P(batch_axis, axis_name)),
        out_specs=P(batch_axis, None, axis_name),
        check_vma=False)(inp, grid)


def grad_sharded(inp, grid, orders, bounds, extrapolate, *,
                 mesh: Mesh, axis_name: str = "x", halo: int = None,
                 max_disp: float = 0.0, batch_axis: str = None,
                 use_window: bool = None):
    """Slab-sharded grid_grad; same layout contract as pull_sharded,
    returning (B, C, *oshape, D)."""
    D = grid.shape[-1]
    ishape = tuple(inp.shape[2:])
    H = halo if halo is not None else halo_width(orders, max_disp)
    ndev = mesh.shape[axis_name]
    n_loc = _check(ishape[0], ndev, H)
    if use_window is None:
        use_window = _dense_eligible(inp, grid, extrapolate, max_disp,
                                     bounds)

    if use_window:
        from ..ops import window as wd
        smin, smax = wd.window_range(max(orders), max_disp)
        assert H >= max(-smin, smax), (H, smin, smax)
        lbounds = (int(BoundType.replicate),) + tuple(bounds[1:])

        def local_w(inp_loc, grid_loc):
            left, right = _corrected_halos(inp_loc, axis_name, ndev, H,
                                           ishape[0], bounds[0])
            ext = jnp.concatenate([left, inp_loc, right], axis=2)
            gext = _local_dense_grid(grid_loc, axis_name, n_loc, H, D)
            f = lambda v, g2: wd.grad_window(v, g2, tuple(orders),
                                             lbounds, 1, max_disp)
            out = jax.vmap(f)(ext, gext)
            return out[:, :, H:H + n_loc]

        return jax.shard_map(
            local_w, mesh=mesh,
            in_specs=(P(batch_axis, None, axis_name),
                      P(batch_axis, axis_name)),
            out_specs=P(batch_axis, None, axis_name),
            check_vma=False)(inp, grid)

    def local(inp_loc, grid_loc):
        left, right = _exchange_halos(inp_loc, axis_name, ndev, H)
        ext = jnp.concatenate([left, inp_loc, right], axis=2)
        shifts = (_shift(axis_name, n_loc, H),) + (None,) * (D - 1)
        gflat = grid_loc.reshape(grid_loc.shape[0], -1, D)
        core = partial(nd.grad_core, orders=orders, bounds=bounds,
                       extrapolate=extrapolate, fold_shapes=ishape,
                       shifts=shifts)
        out = jax.vmap(core)(ext, gflat)
        return out.reshape(out.shape[:2] + grid_loc.shape[1:-1] + (D,))

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None, axis_name), P(batch_axis, axis_name)),
        out_specs=P(batch_axis, None, axis_name),
        check_vma=False)(inp, grid)


def push_sharded(inp, grid, oshape: Tuple[int, ...], orders, bounds,
                 extrapolate, *, mesh: Mesh, axis_name: str = "x",
                 halo: int = None, max_disp: float = 0.0,
                 batch_axis: str = None, use_window: bool = None):
    """Slab-sharded grid_push (adjoint of pull_sharded).

    inp (B, C, *gshape) and grid (B, *gshape, D) sharded along the first
    spatial axis; output (B, C, *oshape) sharded likewise.
    """
    D = grid.shape[-1]
    oshape = tuple(oshape)
    H = halo if halo is not None else halo_width(orders, max_disp)
    ndev = mesh.shape[axis_name]
    n_loc = _check(oshape[0], ndev, H)
    ext_shape = (n_loc + 2 * H,) + oshape[1:]
    if use_window is None:
        use_window = (max_disp > 0 and extrapolate == 1
                      and tuple(grid.shape[1:-1]) == oshape
                      and tuple(inp.shape[2:]) == oshape)

    if use_window:
        from ..ops import window as wd
        smin, smax = wd.window_range(max(orders), max_disp)
        assert H >= max(-smin, smax), (H, smin, smax)
        lbounds = (int(BoundType.replicate),) + tuple(bounds[1:])
        wrap = int(bounds[0]) == BoundType.dft

        def local_w(inp_loc, grid_loc):
            gext = _local_dense_grid(grid_loc, axis_name, n_loc, H, D)
            vext = jnp.pad(inp_loc, [(0, 0), (0, 0), (H, H)]
                           + [(0, 0)] * (D - 1))
            f = lambda v, g2: wd.push_window(v, g2, tuple(orders),
                                             lbounds, 1, max_disp)
            ext = jax.vmap(f)(vext, gext)       # (B, C, n_loc + 2H, ...)
            out = ext[:, :, H:H + n_loc]
            left_m, right_m = ext[:, :, :H], ext[:, :, -H:]
            idx = jax.lax.axis_index(axis_name)
            shp = (1,) * out.ndim
            is_first = (idx == 0).reshape(shp)
            is_last = (idx == ndev - 1).reshape(shp)
            if ndev == 1:
                from_right, from_left = left_m, right_m
            else:
                bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
                fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
                from_right = jax.lax.ppermute(left_m, axis_name, bwd)
                from_left = jax.lax.ppermute(right_m, axis_name, fwd)
            if not wrap:
                # edge devices: the wrapped ring pieces don't belong to
                # them; their own margins fold back through the global
                # boundary into their own slab (adjoint of the halo
                # correction in the pull path)
                lf, ls, rf, rs = _edge_halo_tables(
                    oshape[0], n_loc, H, bounds[0])
                zero = int(bounds[0]) == BoundType.zero
                lad = jnp.zeros_like(out)
                rad = jnp.zeros_like(out)
                if not zero:
                    lad = lad.at[:, :, jnp.asarray(lf)].add(
                        _sgn(left_m, ls, 2))
                    rad = rad.at[:, :, jnp.asarray(rf)].add(
                        _sgn(right_m, rs, 2))
                from_left = jnp.where(is_first, 0, from_left)
                from_right = jnp.where(is_last, 0, from_right)
                out = out + jnp.where(is_first, lad, 0)
                out = out + jnp.where(is_last, rad, 0)
            out = out.at[:, :, -H:].add(from_right)
            out = out.at[:, :, :H].add(from_left)
            return out

        return jax.shard_map(
            local_w, mesh=mesh,
            in_specs=(P(batch_axis, None, axis_name),
                      P(batch_axis, axis_name)),
            out_specs=P(batch_axis, None, axis_name),
            check_vma=False)(inp, grid)

    def local(inp_loc, grid_loc):
        B, C = inp_loc.shape[:2]
        shifts = (_shift(axis_name, n_loc, H),) + (None,) * (D - 1)
        gflat = grid_loc.reshape(grid_loc.shape[0], -1, D)
        vals = inp_loc.reshape(B, C, -1)
        core = partial(nd.push_core, oshape=ext_shape, orders=orders,
                       bounds=bounds, extrapolate=extrapolate,
                       fold_shapes=oshape, shifts=shifts)
        ext = jax.vmap(core)(vals, gflat)      # (B, C, n_loc + 2H, ...)
        out = ext[:, :, H:H + n_loc]
        if ndev == 1:
            out = out.at[:, :, -H:].add(ext[:, :, :H])
            out = out.at[:, :, :H].add(ext[:, :, -H:])
        else:
            bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
            fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
            from_right = jax.lax.ppermute(ext[:, :, :H], axis_name, bwd)
            from_left = jax.lax.ppermute(ext[:, :, -H:], axis_name, fwd)
            out = out.at[:, :, -H:].add(from_right)
            out = out.at[:, :, :H].add(from_left)
        return out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis, None, axis_name), P(batch_axis, axis_name)),
        out_specs=P(batch_axis, None, axis_name),
        check_vma=False)(inp, grid)


def count_sharded(grid, oshape: Tuple[int, ...], orders, bounds,
                  extrapolate, *, mesh: Mesh, axis_name: str = "x",
                  halo: int = None, max_disp: float = 0.0,
                  batch_axis: str = None):
    """Slab-sharded grid_count = push_sharded of unit weights."""
    ones = jnp.ones((grid.shape[0], 1) + grid.shape[1:-1],
                    dtype=grid.dtype)
    return push_sharded(ones, grid, oshape, orders, bounds, extrapolate,
                        mesh=mesh, axis_name=axis_name, halo=halo,
                        max_disp=max_disp, batch_axis=batch_axis)
