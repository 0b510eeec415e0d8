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

Collectives ride the mesh axis (ICI on TPU): two ``ppermute`` per op,
payload ``B*C*H*prod(rest)`` elements — independent of the slab size.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ndkernels as nd

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


def pull_sharded(inp, grid, orders, bounds, extrapolate, *,
                 mesh: Mesh, axis_name: str = "x", halo: int = None,
                 max_disp: float = 0.0, batch_axis: str = None):
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
                 max_disp: float = 0.0, batch_axis: str = None):
    """Slab-sharded grid_grad; same layout contract as pull_sharded,
    returning (B, C, *oshape, D)."""
    D = grid.shape[-1]
    ishape = tuple(inp.shape[2:])
    H = halo if halo is not None else halo_width(orders, max_disp)
    ndev = mesh.shape[axis_name]
    n_loc = _check(ishape[0], ndev, H)

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
                 batch_axis: str = None):
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
