"""Pallas TPU kernel: windowed warp pull (dense grids, bounded
displacement) with the whole tap window resident in VMEM.

This is the native tier of the framework — the role the external
C++/CUDA ``jitfields`` package plays for the reference (SURVEY §2: the
rebuild's fast backend is first-class, in-tree).  The XLA formulation of
the same windowed algorithm (ops/window.py) re-reads the volume from HBM
for each of the (2*max_disp + order + 2)^D shifted views because fusions
cannot cache across slices; this kernel loads each input box into VMEM
once, builds the per-axis tap-coefficient stacks in VMEM, and runs the
whole S^3 shift accumulation out of on-chip memory:

    per output tile (TX, TY, TZ):
      1. async-DMA the (TX+S-1, TY+S-1, TZ+S-1) box of the pre-padded
         volume HBM -> VMEM (pad carries the boundary folding + signs,
         so no clamps or folds in-kernel; see ops/window._pad_folded)
      2. per axis: node origin, Cox-de Boor taps, and the S coefficient
         planes  coef_d[s] = w_{s - delta0_d}  (VPU, branch-free)
      3. acc += coefx[sx] * coefy[sy] * coefz[sz] * box[shifted slice]
         over the S^3 window — all VMEM reads
      4. write the tile

Mosaic-shaped details (each learned from a failed compile):
  - grid coordinates are passed as three separate (X, Y, Z) arrays — a
    trailing length-3 axis would be lane-padded 42x in VMEM;
  - the x/y shift loops are rolled ``fori_loop``s with the coefficient
    planes staged through VMEM scratch (values cannot be dynamically
    indexed), only the z-shift sum is unrolled — fully unrolling S^3
    terms exploded both compile time and register pressure (~190 MB of
    spill slots);
  - VMEM slice extents are rounded up to the (8, 128) tiling.

Traffic: ~1.2x volume read + volume write (vs ~S^3 x for the XLA path).
Compute: S^3 fused multiply-adds per voxel on the VPU.

Scope (v1): 3D, C folded into the batch/vmap outside, grids dense, tile
sizes must divide the volume.  Falls back to ops/window.py elsewhere.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splines import bspline_taps
from .window import _pad_folded, _window_geom, window_range
from .ndkernels import inbounds_mask

__all__ = ["pull_window_pallas", "default_tile"]


def default_tile() -> Tuple[int, int, int]:
    """Best-measured tile on v5e (tile sweep, scripts/tpu_tile_sweep.py)."""
    return (8, 8, 128)


def _coef_planes(g, order, smin, smax, origin, axis, tile_shape):
    """In-kernel per-axis coefficient planes: list of S arrays, where
    plane k is the weight this voxel sends to relative shift smin+k."""
    n0f = jnp.floor(g - (order - 1) / 2) if order > 0 else jnp.round(g)
    t = g - n0f
    w, _, _ = bspline_taps(t, order)
    # delta0 = n0 - p, p = global voxel index along `axis` for this tile
    p = origin + jax.lax.broadcasted_iota(jnp.int32, tile_shape, axis)
    d0 = n0f.astype(jnp.int32) - p
    d0min, d0max = smin, smax - order
    planes = []
    for s in range(smin, smax + 1):
        acc = None
        for j in range(order + 1):
            if d0min <= s - j <= d0max:
                term = jnp.where(d0 == s - j, w[j], 0)
                acc = term if acc is None else acc + term
        planes.append(acc if acc is not None else jnp.zeros_like(g))
    return planes


def _warp_kernel(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref,
                 box, ybox, cx_ref, cy_ref, acc_ref, ysem, *,
                 orders, ranges, tile, box_shape):
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    # 1. one aligned box DMA (pad absorbs the window: box origin in
    # padded coords is the tile origin; extents rounded to (8, 128))
    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(x0, box_shape[0]), pl.ds(y0, box_shape[1]),
                    pl.ds(z0, box_shape[2])],
        box, ysem)
    cp.start()

    # 2. coefficient planes (overlaps the DMA); x/y stacks go to VMEM
    # scratch for dynamic indexing by the rolled shift loops
    shape = (TX, TY, TZ)
    for k, c in enumerate(_coef_planes(gx_ref[...], orders[0], sx0, sx1,
                                       x0, 0, shape)):
        cx_ref[k] = c
    for k, c in enumerate(_coef_planes(gy_ref[...], orders[1], sy0, sy1,
                                       y0, 1, shape)):
        cy_ref[k] = c
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape)

    cp.wait()

    # 3. build the per-ky sublane-aligned slabs: neither VMEM nor HBM
    # memrefs may be sliced at a misaligned sublane offset, but a value-
    # level circular roll is a native Mosaic op — ybox[ky] holds the box
    # rolled so that row ky sits at 0, making every later read aligned.
    bval = box[...]
    BY = bval.shape[1]
    for ky in range(Sy):
        # circular roll by BY - ky == roll by -ky (shift must be >= 0)
        ybox[ky] = bval if ky == 0 else pltpu.roll(bval, BY - ky, 1)

    acc_ref[...] = jnp.zeros(shape, dtype=out_ref.dtype)

    def ybody(ky, kx):
        # one ref read; dynamic indices only on untiled leading dims
        box_xy = ybox[ky, pl.ds(kx, TX), 0:TY, :]
        zsum = None
        for kz in range(Sz):        # static lane shifts (value-level)
            term = czs[kz] * box_xy[:, :, kz:kz + TZ]
            zsum = term if zsum is None else zsum + term
        acc_ref[...] += (cx_ref[kx] * cy_ref[ky]) * zsum
        return kx

    def xbody(kx, _):
        jax.lax.fori_loop(0, Sy, ybody, kx)
        return 0

    jax.lax.fori_loop(0, Sx, xbody, 0)
    out_ref[...] = acc_ref[...]


def pull_window_pallas(inp: jnp.ndarray, grid: jnp.ndarray,
                       orders: Tuple[int, ...], bounds: Tuple[int, ...],
                       extrapolate: int, max_disp: float,
                       tile: Tuple[int, int, int] = (8, 8, 128),
                       interpret: bool = False) -> jnp.ndarray:
    """Dense-grid 3D pull on the Pallas native tier.

    inp: (*ishape,); grid: (*ishape, 3).  Single channel — callers vmap
    over channels/batch.  Same semantics and contract as
    ops/window.pull_window.
    """
    ishape = tuple(inp.shape)
    D = 3
    if grid.shape != ishape + (D,):
        raise ValueError("pull_window_pallas needs a dense (X,Y,Z,3) grid")
    for n, t in zip(ishape, tile):
        if n % t:
            raise ValueError(f"shape {ishape} not divisible by tile {tile}")
    wdtype = jnp.result_type(inp.dtype, grid.dtype)

    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)

    # Mosaic tiling: VMEM slice extents must align to (sublane=8,
    # lane=128) on the last two dims; round the box up and extend the
    # right-hand pad so edge-tile DMAs stay in range.
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]

    vpad = _pad_folded(inp.astype(wdtype)[None], ishape, bounds,
                       lo, hi, wdtype)[0]
    ntiles = tuple(n // t for n, t in zip(ishape, tile))

    kernel = partial(_warp_kernel, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    g = grid.astype(wdtype)
    out = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[gspec, gspec, gspec,
                  # the padded volume must stay in HBM: VMEM slices have
                  # sublane alignment constraints the per-ky slab DMAs
                  # cannot satisfy (HBM is byte-addressed)
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ishape, wdtype),
        scratch_shapes=[
            pltpu.VMEM(box_shape, wdtype),
            pltpu.VMEM((S[1],) + box_shape, wdtype),
            pltpu.VMEM((S[0],) + tuple(tile), wdtype),
            pltpu.VMEM((S[1],) + tuple(tile), wdtype),
            pltpu.VMEM(tuple(tile), wdtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g[..., 0], g[..., 1], g[..., 2], vpad)

    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape(ishape)
    return out
