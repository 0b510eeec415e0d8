"""Gather-free tiled warp sampling: the TPU fast path for dense grids.

XLA's general gather is the worst-mapped primitive on TPU (measured ~100x
off the HBM roofline for the flat-index formulation); this module removes
gathers entirely for the dominant workload — *dense* sampling grids
(warps: identity + bounded displacement), the case served by
``grid_pull(image, add_identity_grid(disp))``.

Algorithm ("tiled one-hot contraction"):
  1. Partition the output volume into tiles of shape T.  Under the
     bounded-displacement contract (|g_d - p_d| <= max_disp for every
     sample), all taps of a tile live in a static *box*: the tile dilated
     by halo H = ceil(max_disp) + (order+1)//2 + 1 per axis, clamped to
     the volume (same contract as the distributed slab sharding,
     interpol_tpu/parallel/spatial.py).
  2. Extract all boxes with *static* window indices (XLA lowers these to
     cheap strided slices, not dynamic gathers).
  3. Per axis, build the tile's sparse sampling operator densely:
         M_d[b, p] = sum_j [fold(node_j(p)) - box_start == b]
                      * weight_j(p) * sign_j(p)
     via iota comparison — a pure VPU construction.
  4. Contract the box against M_z, M_y, M_x in three einsum stages:
         B1[c,x,y,p] = sum_z box[c,x,y,z] M_z[z,p]        (MXU matmul)
         B2[c,x,p]   = sum_y B1[c,x,y,p]  M_y[y,p]        (VPU reduce)
         out[c,p]    = sum_x B2[c,x,p]    M_x[x,p]        (VPU reduce)
     — exact separable spline interpolation with zero gathers.

Correctness contract: every sample must stay within ``max_disp`` voxels
of its own output site (per axis).  Boundary folding is exact for all
clamp/reflect-type bounds (zero, replicate, dct1, dct2, dst1, dst2);
``dft`` wraps to the far side of the volume, which a local box cannot
represent, so dft grids must keep samples in-range or use the gather
path.  Violating samples produce garbage only for themselves.

The adjoint (``push_tiled``) runs the same stages transposed and
accumulates overlapping boxes back with static-index scatter-adds.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .bounds import fold_index, fold_sign
from .ndkernels import inbounds_mask
from .splines import bspline_taps, node_origin

__all__ = ["halo_width", "pull_tiled", "push_tiled", "default_tile"]


def halo_width(order: int, max_disp: float) -> int:
    return int(math.ceil(max_disp)) + (order + 1) // 2 + 1


def default_tile(D: int) -> Tuple[int, ...]:
    """Tile shapes chosen so per-tile intermediates stay VMEM-sized with
    the last axis lane-friendly."""
    return {1: (256,), 2: (8, 128), 3: (4, 8, 64)}.get(D, (4,) * D)


def _windows(n: int, tile: int, box: int) -> np.ndarray:
    """Static per-tile box start offsets along one axis."""
    nt = n // tile
    starts = np.arange(nt) * tile - (box - tile) // 2
    return np.clip(starts, 0, n - box)


def _axis_operator(g, n, order, bound, start, box, dtype):
    """Dense per-tile sampling operator M[nt, box, P_t] for one axis.

    g: (nt, P_t) global sample coords for this axis; start: (nt,) static
    box starts.
    """
    n0, t = node_origin(g.astype(dtype), order)
    w, _, _ = bspline_taps(t, order)
    iota = jnp.arange(box, dtype=jnp.int32)            # (box,)
    M = jnp.zeros(g.shape[:1] + (box,) + g.shape[1:], dtype)
    for j in range(order + 1):
        node = n0 + j
        wj = w[j]
        sign = fold_sign(node, n, bound, dtype)
        if sign is not None:
            wj = wj * sign
        loc = fold_index(node, n, bound) - start[:, None]   # (nt, P_t)
        M = M + jnp.where(iota[None, :, None] == loc[:, None, :],
                          wj[:, None, :], 0)
    return M


def _prep(ishape, tile, orders, max_disp):
    D = len(ishape)
    tile = tuple(tile) if tile is not None else default_tile(D)
    for n, t in zip(ishape, tile):
        if n % t:
            raise ValueError(
                f"volume shape {ishape} not divisible by tile {tile}")
    boxes, starts = [], []
    for d, (n, t) in enumerate(zip(ishape, tile)):
        H = halo_width(orders[d], max_disp)
        b = min(t + 2 * H, n)
        boxes.append(b)
        starts.append(_windows(n, t, b))
    return tile, tuple(boxes), starts


def _extract_boxes(inp, starts, boxes):
    """(C, *ishape) -> (nt_1*..*nt_D, C, *boxes) with static windows."""
    D = len(boxes)
    out = inp
    # index one axis at a time with static windows: spatial axis d
    # (at position 1 + 2d after the previous expansions) becomes the
    # axis pair (nt_d, box_d)
    for d in range(D):
        ax = 1 + 2 * d
        win = jnp.asarray(starts[d][:, None] + np.arange(boxes[d])[None])
        out = jnp.take(out, win, axis=ax)
    # layout now (C, nt_1, b_1, ..., nt_D, b_D) -> (nt..., C, b...)
    nts = tuple(out.shape[1 + 2 * d] for d in range(D))
    perm = [1 + 2 * d for d in range(D)] + [0] \
        + [2 + 2 * d for d in range(D)]
    out = jnp.transpose(out, perm)
    return out.reshape((math.prod(nts),) + (out.shape[D],) + tuple(boxes)), \
        nts


def pull_tiled(inp: jnp.ndarray, grid: jnp.ndarray,
               orders: Tuple[int, ...], bounds: Tuple[int, ...],
               extrapolate: int = 1, *, max_disp: float,
               tile: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Dense-grid pull without gathers.

    inp: (C, *ishape); grid: (*ishape, D) — one sample per voxel, within
    ``max_disp`` of its own site.  Returns (C, *ishape).
    """
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if tuple(grid.shape[:-1]) != ishape:
        raise ValueError(
            "pull_tiled requires a dense grid with one sample per voxel "
            f"(grid spatial {grid.shape[:-1]} vs volume {ishape}); use "
            "the general gather path for scattered points")
    C = inp.shape[0]
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    tile, boxes, starts = _prep(ishape, tile, orders, max_disp)

    bx, nts = _extract_boxes(inp, starts, boxes)     # (T, C, *boxes)
    T = bx.shape[0]
    P = math.prod(tile)

    # grid -> (T, P, D): block the spatial axes by tile
    g = grid
    for d in range(D):
        g = g.reshape(g.shape[:2 * d] + (nts[d], tile[d]) + g.shape[2 * d + 1:])
    # axes: (nt1, t1, nt2, t2, ..., D) -> (nt..., t..., D)
    perm = [2 * d for d in range(D)] + [2 * d + 1 for d in range(D)] + [2 * D]
    g = jnp.transpose(g, perm).reshape(T, P, D)

    mask = inbounds_mask(g, ishape, extrapolate, wdtype)   # (T, P) or None

    Ms = []
    for d in range(D):
        start = jnp.asarray(starts[d])
        # tile index along axis d for each flat tile id
        tidx = (jnp.arange(T) // math.prod(nts[d + 1:])) % nts[d]
        Ms.append(_axis_operator(g[..., d], ishape[d], orders[d],
                                 bounds[d], start[tidx], boxes[d], wdtype))

    # contraction stages, innermost (last) axis first on the MXU
    cur = bx.astype(wdtype)                       # (T, C, b1..bD)
    out = None
    if D == 3:
        B1 = jnp.einsum('tcxyz,tzp->tcxyp', cur, Ms[2])
        B2 = jnp.einsum('tcxyp,typ->tcxp', B1, Ms[1])
        out = jnp.einsum('tcxp,txp->tcp', B2, Ms[0])
    elif D == 2:
        B1 = jnp.einsum('tcxy,typ->tcxp', cur, Ms[1])
        out = jnp.einsum('tcxp,txp->tcp', B1, Ms[0])
    else:
        out = jnp.einsum('tcx,txp->tcp', cur, Ms[0])

    if mask is not None:
        out = out * mask[:, None, :]

    # (T, C, P) -> (C, *ishape): interleave (nt_d, t_d) back per axis
    out = out.reshape(tuple(nts) + (C,) + tuple(tile))
    order_axes = [D]
    for d in range(D):
        order_axes += [d, D + 1 + d]
    out = jnp.transpose(out, order_axes)
    return out.reshape((C,) + ishape)


def push_tiled(inp: jnp.ndarray, grid: jnp.ndarray,
               orders: Tuple[int, ...], bounds: Tuple[int, ...],
               extrapolate: int = 1, *, max_disp: float,
               tile: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Adjoint of :func:`pull_tiled`: splat dense-grid values, gather-free
    in-tile (transposed contractions) with a static-index box accumulation.

    inp: (C, *ishape) values at the grid's sample positions; returns
    (C, *ishape) splatted volume.
    """
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    C = inp.shape[0]
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    tile, boxes, starts = _prep(ishape, tile, orders, max_disp)
    nts = tuple(ishape[d] // tile[d] for d in range(D))
    T = math.prod(nts)
    P = math.prod(tile)

    # values -> (T, C, P)
    v = inp
    v = jnp.moveaxis(v, 0, -1)                      # (*ishape, C)
    for d in range(D):
        v = v.reshape(v.shape[:2 * d] + (nts[d], tile[d]) + v.shape[2 * d + 1:])
    perm = [2 * d for d in range(D)] + [2 * d + 1 for d in range(D)] + [2 * D]
    v = jnp.transpose(v, perm).reshape(T, P, C)
    v = jnp.moveaxis(v, -1, 1)                      # (T, C, P)

    g = grid
    for d in range(D):
        g = g.reshape(g.shape[:2 * d] + (nts[d], tile[d]) + g.shape[2 * d + 1:])
    g = jnp.transpose(g, perm).reshape(T, P, D)

    mask = inbounds_mask(g, ishape, extrapolate, wdtype)
    if mask is not None:
        v = v * mask[:, None, :]

    Ms = []
    for d in range(D):
        start = jnp.asarray(starts[d])
        tidx = (jnp.arange(T) // math.prod(nts[d + 1:])) % nts[d]
        Ms.append(_axis_operator(g[..., d], ishape[d], orders[d],
                                 bounds[d], start[tidx], boxes[d], wdtype))

    v = v.astype(wdtype)
    if D == 3:
        B2 = jnp.einsum('tcp,txp->tcxp', v, Ms[0])
        B1 = jnp.einsum('tcxp,typ->tcxyp', B2, Ms[1])
        bxs = jnp.einsum('tcxyp,tzp->tcxyz', B1, Ms[2])
    elif D == 2:
        B1 = jnp.einsum('tcp,txp->tcxp', v, Ms[0])
        bxs = jnp.einsum('tcxp,typ->tcxy', B1, Ms[1])
    else:
        bxs = jnp.einsum('tcp,txp->tcx', v, Ms[0])

    # accumulate overlapping boxes back into the volume (static indices)
    out = jnp.zeros((C,) + ishape, wdtype)
    bxs = bxs.reshape(nts + (C,) + boxes)
    # move C first: (C, nt..., box...)
    bxs = jnp.moveaxis(bxs, D, 0)
    idxs = []
    for d in range(D):
        win = starts[d][:, None] + np.arange(boxes[d])[None]  # (nt_d, b_d)
        idxs.append(jnp.asarray(win))
    if D == 1:
        out = out.at[:, idxs[0]].add(bxs)
    elif D == 2:
        out = out.at[:, idxs[0][:, None, :, None],
                     idxs[1][None, :, None, :]].add(bxs)
    else:
        out = out.at[:, idxs[0][:, None, None, :, None, None],
                     idxs[1][None, :, None, None, :, None],
                     idxs[2][None, None, :, None, None, :]].add(bxs)
    return out
