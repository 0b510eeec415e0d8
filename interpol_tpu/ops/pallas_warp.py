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

Scope (v1): 3D, C folded into the batch/vmap outside, grids dense
(arbitrary volume shapes — the wrappers pad to tile alignment and slice
the result).  Falls back to ops/window.py elsewhere.
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

__all__ = ["pull_window_pallas", "push_window_pallas", "default_tile"]


def default_tile(ishape: Tuple[int, ...] = None):
    """Best-measured tile on v5e (tile sweep, scripts/tpu_tile_sweep.py).
    Any 3-D volume is eligible: the wrappers pad internally to tile
    alignment (zeros beyond the folded window pad) and slice the result.
    Returns None only for non-3-D shapes."""
    if ishape is not None and len(ishape) != 3:
        return None
    return (8, 8, 128)


def _aligned(ishape, tile):
    """Volume shape rounded up to tile multiples."""
    return tuple(-(-n // t) * t for n, t in zip(ishape, tile))


def _pad_grid_edge(grid, ishape_a):
    """Edge-replicate grid coordinates into the alignment margin (the
    margin's outputs are discarded; edge coords keep the displacement
    contract so the kernel computes harmless values there)."""
    pads = [(0, a - n) for a, n in zip(ishape_a, grid.shape[:-1])]
    return jnp.pad(grid, pads + [(0, 0)], mode="edge")


def _coef_planes(g, order, smin, smax, origin, axis, tile_shape,
                 deriv=False):
    """In-kernel per-axis coefficient planes: list of S arrays, where
    plane k is the weight this voxel sends to relative shift smin+k.
    ``deriv`` selects the first-derivative tap factors."""
    n0f = jnp.floor(g - (order - 1) / 2) if order > 0 else jnp.round(g)
    t = g - n0f
    w, gr, _ = bspline_taps(t, order, grad=deriv)
    if deriv:
        w = gr
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
                 orders, ranges, tile, box_shape, deriv_axis=None):
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
                                       x0, 0, shape,
                                       deriv=(deriv_axis == 0))):
        cx_ref[k] = c
    for k, c in enumerate(_coef_planes(gy_ref[...], orders[1], sy0, sy1,
                                       y0, 1, shape,
                                       deriv=(deriv_axis == 1))):
        cy_ref[k] = c
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape,
                       deriv=(deriv_axis == 2))

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
                       tile: Tuple[int, int, int] = None,
                       interpret: bool = False,
                       deriv_axis: int = None) -> jnp.ndarray:
    """Dense-grid 3D pull on the Pallas native tier.

    inp: (*ishape,); grid: (*ishape, 3).  Single channel — callers vmap
    over channels/batch.  Same semantics and contract as
    ops/window.pull_window.
    """
    ishape = tuple(inp.shape)
    tile = tile or default_tile(ishape)
    D = 3
    if tile is None:
        raise ValueError("pull_window_pallas is 3-D only")
    if grid.shape != ishape + (D,):
        raise ValueError("pull_window_pallas needs a dense (X,Y,Z,3) grid")
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    # compute in at least f32: bf16 accumulation over S^3 taps is lossy
    # and bf16 VMEM tiling differs (16-sublane)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

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

    # boundary-folded window pad for the real volume, then zero-extend to
    # tile alignment (the margin tiles compute garbage that is sliced off)
    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(wdtype)[None], ishape, bounds,
                       lo, hi, wdtype)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    kernel = partial(_warp_kernel, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape,
                     deriv_axis=deriv_axis)
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
        out_shape=jax.ShapeDtypeStruct(ishape_a, wdtype),
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
    out = out[:ishape[0], :ishape[1], :ishape[2]]

    gridr = grid[:ishape[0], :ishape[1], :ishape[2]]
    mask = inbounds_mask(gridr.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape(ishape)
    return out.astype(out_dtype)


# ---------------------------------------------------------------- push

def _push_kernel(gx_ref, gy_ref, gz_ref, val_ref, box_out,
                 cx_ref, cy_ref, zslab_ref, sem, *,
                 orders, ranges, tile, box_shape):
    """Adjoint of _warp_kernel: splat one tile's values into its private
    halo-extended box (written to HBM; overlapping boxes are added back
    in XLA).  Transposed data movement: value-level rolls place each
    shift's contribution, so no misaligned memref access is needed."""
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    shape = (TX, TY, TZ)
    for k, c in enumerate(_coef_planes(gx_ref[...], orders[0], sx0, sx1,
                                       x0, 0, shape)):
        cx_ref[k] = c
    for k, c in enumerate(_coef_planes(gy_ref[...], orders[1], sy0, sy1,
                                       y0, 1, shape)):
        cy_ref[k] = c
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape)

    val = val_ref[...]
    # per-kz weighted values (unplaced), shared across (kx, ky)
    vzs = jnp.stack([czs[kz] * val for kz in range(Sz)])  # (Sz, T*)
    zpad = BZa - TZ

    # z-deferred slab accumulation: zslab[ky, kz] accumulates the x-placed
    # contributions in *unplaced* z, so the expensive lane rolls happen
    # once per (ky, kz) at the end instead of once per (kx, ky, kz) term.
    for ky in range(Sy):
        zslab_ref[ky] = jnp.zeros((Sz, BXa, TY, TZ), dtype=val.dtype)

    def ybody(ky, kx):
        wxy = cx_ref[kx] * cy_ref[ky]
        cur = zslab_ref[ky, :, pl.ds(kx, TX), :, :]
        zslab_ref[ky, :, pl.ds(kx, TX), :, :] = cur + wxy[None] * vzs
        return kx

    def xbody(kx, _):
        jax.lax.fori_loop(0, Sy, ybody, kx)
        return 0

    jax.lax.fori_loop(0, Sx, xbody, 0)

    # fold the slabs into the box: z-place each (ky, kz) plane with one
    # lane roll, then y-place each ky slab with one sublane roll
    ypad = BYa - TY
    acc = None
    for ky in range(Sy):
        zsum = None
        for kz in range(Sz):
            t = jnp.pad(zslab_ref[ky, kz], ((0, 0), (0, 0), (0, zpad)))
            t = t if kz == 0 else pltpu.roll(t, kz, 2)
            zsum = t if zsum is None else zsum + t
        t = jnp.pad(zsum, ((0, 0), (0, ypad), (0, 0)))
        t = t if ky == 0 else pltpu.roll(t, ky, 1)
        acc = t if acc is None else acc + t
    box_out[0, 0, 0] = acc


def push_window_pallas(inp: jnp.ndarray, grid: jnp.ndarray,
                       orders: Tuple[int, ...], bounds: Tuple[int, ...],
                       extrapolate: int, max_disp: float,
                       tile: Tuple[int, int, int] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Dense-grid 3D push (exact adjoint of pull_window_pallas).

    inp: (*ishape,) values at grid sites; grid: (*ishape, 3).  Returns
    the splatted (*ishape,) volume.  Kernel splats per-tile private boxes
    (race-free by construction); the overlap-add and the boundary-fold of
    the pad margins run in XLA with static indices.
    """
    from .window import _window_geom  # local import to avoid cycle

    ishape = tuple(inp.shape)
    tile = tile or default_tile(ishape)
    D = 3
    if tile is None:
        raise ValueError("push_window_pallas is 3-D only")
    if grid.shape != ishape + (D,):
        raise ValueError("push_window_pallas needs a dense (X,Y,Z,3) grid")
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]

    # extrapolation mask applies to the *values* before splatting
    vals = inp.astype(wdtype)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        vals = vals * mask.reshape(ishape)

    # tile-alignment padding: zero values in the margin contribute
    # nothing; edge-replicated grid coords keep the kernel well-defined
    ishape_a = _aligned(ishape, tile)
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vals = jnp.pad(vals, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))
    pshape = tuple(a + l + h for a, l, h in zip(ishape_a, lo, hi))

    kernel = partial(_push_kernel, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    g = grid.astype(wdtype)
    boxes = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[gspec, gspec, gspec, gspec],
        out_specs=pl.BlockSpec((1, 1, 1) + box_shape,
                               lambda i, j, k: (i, j, k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ntiles + box_shape, wdtype),
        scratch_shapes=[
            pltpu.VMEM((S[0],) + tuple(tile), wdtype),
            pltpu.VMEM((S[1],) + tuple(tile), wdtype),
            pltpu.VMEM((S[1], S[2], box_shape[0], tile[1], tile[2]),
                       wdtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g[..., 0], g[..., 1], g[..., 2], vals)

    # XLA epilogue 1: overlap-add the private boxes into the padded
    # volume — scatter-free: boxes are regularly strided (origin =
    # tile origin in padded coords), so padding each box to a whole
    # number of tile-sized chunks turns the overlap-add into a few
    # static dense block adds (a scatter formulation of this step was
    # measured to dominate the whole op).
    nch = tuple(-(-b // t) for b, t in zip(box_shape, tile))
    BP = tuple(c * t for c, t in zip(nch, tile))
    boxes = jnp.pad(boxes, [(0, 0)] * 3
                    + [(0, p - b) for p, b in zip(BP, box_shape)])
    accw = tuple(max(p, n - t + bp) for p, n, t, bp
                 in zip(pshape, ishape_a, tile, BP))
    acc = jnp.zeros(accw, wdtype)
    for cx in range(nch[0]):
        for cy in range(nch[1]):
            for cz in range(nch[2]):
                blk = boxes[:, :, :,
                            cx * tile[0]:(cx + 1) * tile[0],
                            cy * tile[1]:(cy + 1) * tile[1],
                            cz * tile[2]:(cz + 1) * tile[2]]
                blk = blk.transpose(0, 3, 1, 4, 2, 5).reshape(ishape_a)
                acc = acc.at[cx * tile[0]:cx * tile[0] + ishape_a[0],
                             cy * tile[1]:cy * tile[1] + ishape_a[1],
                             cz * tile[2]:cz * tile[2] + ishape_a[2]
                             ].add(blk)
    acc = acc[:pshape[0], :pshape[1], :pshape[2]]

    # XLA epilogue 2: fold the pad margins back through the boundary
    # (adjoint of the pull path's _pad_folded), reusing the window
    # implementation's margin logic (the alignment margin folds too —
    # it only ever holds zeros)
    from .window import _fold_pad_margins
    hi_tot = [h + e for h, e in zip(hi, extra)]
    out = _fold_pad_margins(acc[None], ishape, bounds, lo, hi_tot,
                            wdtype)[0]
    return out.astype(out_dtype)
