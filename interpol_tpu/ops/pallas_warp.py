"""Pallas TPU kernels: windowed warp sampling (dense grids, bounded
displacement) — the framework's native tier.

This is the role the external C++/CUDA ``jitfields`` package plays for
the reference (SURVEY §2: the rebuild's fast backend is first-class,
in-tree).  Semantics match the generic kernels (reference
interpol/nd.py:80-143 for pull, :146-213 for push) under the
displacement contract of ops/window.py.

Round-2 kernel structure (measured on v5e, scripts/tpu_kernel_lab*.py):

  pull / grad (fused, ``_warp_kernel``):
    per output tile (TX, TY=8, TZ=128) and channel:
      1. one aligned box DMA of the pre-padded volume HBM -> VMEM (the
         pad carries boundary folding + signs; ops/window._pad_folded)
      2. per axis: Cox-de Boor tap planes for weights AND first
         derivatives in one recursion pass (shared one-hot selects)
      3. fully static-unrolled shift accumulation with *value*
         (register-resident) accumulators:
           for ky: sublane-roll the box once; take the Sz lane-shifted
           slabs once (shared across kx); accumulate per-kx z-sums;
           combine with x/y coefficient (and derivative) planes into
           up to four outputs (value, d/dx, d/dy, d/dz) in the same
           pass — derivatives share the box DMA, the tap recursion,
           the rolls, the slab slices, and (for d/dx, d/dy) even the
           z-sums with the value output.
    Per-voxel FMA count: S^3 (+ S^3 for d/dz's derivative z-sum), the
    information-theoretic floor of the shift-window formulation; the
    earlier kernel (round 1) spent ~3x this on VMEM round-trips through
    scratch-staged slabs and a fori_loop accumulator.

  push (``_push_kernel``): exact transpose of the pull data movement —
    per (ky, kz): accumulate the x-placed row sums (leading-dim
    placement is free), one lane-roll per (ky, kz) to z-place, one
    sublane-roll per ky to y-place — so the shuffle count matches the
    pull kernel instead of growing with the window volume.  Tiles splat
    into private halo-extended boxes (race-free by construction);
    overlap-add + boundary fold-back run in XLA with static indices.

Batching: a leading (C,) grid dimension replaces round 1's per-channel
Python loop (one kernel launch per op instead of C); callers vmap over
the batch axis, which Pallas lifts to one more grid dimension.

Mosaic constraints honored (each learned from a failed compile):
  - grid coordinates passed as three separate (X, Y, Z) arrays — a
    trailing length-3 axis would be lane-padded 42x in VMEM;
  - no misaligned sublane slicing of any memref: y-shifts are value
    rolls, z-shifts are value lane-slices, x-shifts index the leading
    (untiled) dimension;
  - VMEM slice extents rounded up to the (8, 128) tiling;
  - no bf16 compute: measured VPU bf16 FMA rate equals f32 (no packed
    win) and bf16 sublane rolls fail to lower.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splines import bspline_taps
from .window import _pad_folded, _window_geom, window_range
from .ndkernels import inbounds_mask

__all__ = ["warp_pallas", "push_window_pallas", "default_tile",
           "pull_window_pallas"]


def default_tile(ishape: Tuple[int, ...] = None, push: bool = False):
    """Best-measured tile on v5e (scripts/tpu_tile_sweep.py, lab runs).
    Any 3-D volume is eligible: the wrappers pad internally to tile
    alignment and slice the result.  Returns None for non-3-D shapes.

    PULL: when the last axis is not a 128-multiple, a FULL-SPAN z tile
    avoids the round-up-to-128 alignment margin (Mosaic accepts
    non-128 lane dims only as full spans): 192^3 paid a 33% padding
    tax on 128-tiles (BASELINE.md round-2 note); full-span measured
    0.94 -> 1.73 Gvox/s at 192^3 cubic.  PUSH keeps the padded
    128-tile: its transposed placement (private box + overlap-add
    epilogue) measured ~30% SLOWER with the 192 full-span tile
    (suite r3: 0.76 vs 1.09 Gvox/s) — the wider tile box inflates the
    sequential in-box accumulation, and the padding margin it avoids
    is epilogue-side (cheap) rather than DMA-side."""
    if ishape is not None and len(ishape) != 3:
        return None
    tz = 128
    if (not push and ishape is not None and ishape[2] % 128 != 0
            and ishape[2] <= 384):
        tz = int(ishape[2])
    return (8, 8, tz)


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
                 grad=False, hess=False, base=None, d0_range=None):
    """In-kernel per-axis coefficient planes.

    Returns (weight_planes, grad_planes, hess_planes): lists of S arrays
    where plane k is the weight (resp. 1st/2nd spline derivative) this
    voxel applies to relative shift smin+k.  ``grad_planes`` /
    ``hess_planes`` are None unless requested; when requested they share
    the tap recursion and the one-hot selects with the weight planes.
    ``base`` (dynamic scalar) re-centers the shift window on the tile's
    base displacement (adaptive mode).
    """
    n0f = jnp.floor(g - (order - 1) / 2) if order > 0 else jnp.round(g)
    t = g - n0f
    w, gr, he = bspline_taps(t, order, grad=grad, hess=hess)
    # delta0 = n0 - p, p = global voxel index along `axis` for this tile
    p = origin + jax.lax.broadcasted_iota(jnp.int32, tile_shape, axis)
    d0 = n0f.astype(jnp.int32) - p
    if base is not None:
        d0 = d0 - base
    # attainable node-origin offsets; chunked sub-windows must pass the
    # FULL window's bounds or taps at chunk edges are dropped
    d0min, d0max = d0_range if d0_range is not None \
        else (smin, smax - order)
    planes_w = []
    planes_g = [] if grad else None
    planes_h = [] if hess else None
    zero = jnp.zeros_like(g)
    for s in range(smin, smax + 1):
        acc_w = acc_g = acc_h = None
        for j in range(order + 1):
            if d0min <= s - j <= d0max:
                m = d0 == s - j
                tw = jnp.where(m, w[j], 0)
                acc_w = tw if acc_w is None else acc_w + tw
                if grad:
                    tg = jnp.where(m, gr[j], 0)
                    acc_g = tg if acc_g is None else acc_g + tg
                if hess:
                    th = jnp.where(m, he[j], 0)
                    acc_h = th if acc_h is None else acc_h + th
        planes_w.append(acc_w if acc_w is not None else zero)
        if grad:
            planes_g.append(acc_g if acc_g is not None else zero)
        if hess:
            planes_h.append(acc_h if acc_h is not None else zero)
    return planes_w, planes_g, planes_h


def _warp_kernel(gx_ref, gy_ref, gz_ref, vpad_hbm, *out_refs,
                 orders, ranges, tile, box_shape, value, grad,
                 hess=False, base_margin=None, active=None,
                 d0_ranges=None):
    """Fused windowed pull: up to 10 outputs (value, d/dx, d/dy, d/dz,
    and the six unique Hessian components xx, yy, zz, xy, xz, yz) from
    one pass over the shift window.  The Hessian components reuse the
    value path's weight z-sums and the gradient path's derivative
    z-sums; only one extra z-sum (second-derivative z planes) and six
    accumulators are added — serving grad_window's grid-VJP at native
    speed (reference contract interpol/pushpull.py:206-233).

    Adaptive mode (``base_margin`` = static per-axis pad margins): three
    extra SMEM inputs hold the per-tile integer base displacements; the
    box DMA origin shifts by the base (leading dim exact; sublane/lane
    dims aligned down with the residue removed by a dynamic roll), and
    the coefficient planes select over the *residual* window.
    """
    adaptive = base_margin is not None
    if adaptive:
        bx_ref, by_ref, bz_ref = out_refs[:3]
        out_refs = out_refs[3:]
    box0, box1, sem0, sem1 = out_refs[-4:]
    out_refs = out_refs[:-4]
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    # active shift sub-ranges (wide-window chunking): loop indices
    # relative to the geometry range; taps outside are another chunk's
    (ax0, ax1), (ay0, ay1), (az0, az1) = active or ranges
    kxs = range(ax0 - sx0, ax1 - sx0 + 1)
    kys = range(ay0 - sy0, ay1 - sy0 + 1)
    kzs = range(az0 - sz0, az1 - sz0 + 1)
    BXa, BYa, BZa = box_shape
    c = pl.program_id(0)
    ix, iy, iz = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    ntx, nty, ntz = (pl.num_programs(1), pl.num_programs(2),
                     pl.num_programs(3))
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    def src_rolls(cc, jx, jy, jz):
        """HBM box slice + de-alignment residues for tile (cc,jx,jy,jz).

        Single-tile axes (full-span tiles) use a literal 0 offset:
        their tile extent is generally not 128-divisible, and a traced
        ``program_id * T`` would fail Mosaic's alignment proof even
        though it is constant."""
        tx0 = 0 if ntx == 1 else jx * TX
        ty0 = 0 if nty == 1 else jy * TY
        tz0 = 0 if ntz == 1 else jz * TZ
        if adaptive:
            flat = (jx * nty + jy) * ntz + jz
            bxs, bys, bzs = bx_ref[flat], by_ref[flat], bz_ref[flat]
            # fetch origins in padded coords (pad lo = margin - smin, so
            # the window origin is tile0 + margin + b); y/z align down,
            # the residue is rolled off after the DMA
            ox = tx0 + base_margin[0] + bxs
            oyr = ty0 + base_margin[1] + bys
            ozr = tz0 + base_margin[2] + bzs
            oy = (oyr // 8) * 8
            oz = (ozr // 128) * 128
            src = vpad_hbm.at[cc, pl.ds(ox, BXa),
                              pl.ds(pl.multiple_of(oy, 8), BYa),
                              pl.ds(pl.multiple_of(oz, 128), BZa)]
            return src, oyr - oy, ozr - oz
        # divisibility hints: the NEXT-step indices flow through
        # jnp.where carries, so Mosaic cannot prove tile alignment on
        # its own (observed compile failure without these)
        ty0 = pl.multiple_of(ty0, 8) if TY % 8 == 0 else ty0
        tz0 = pl.multiple_of(tz0, 128) if TZ % 128 == 0 else tz0
        src = vpad_hbm.at[cc, pl.ds(tx0, BXa), pl.ds(ty0, BYa),
                          pl.ds(tz0, BZa)]
        return src, None, None

    if adaptive:
        flat = (ix * nty + iy) * ntz + iz
        bx, by, bz = bx_ref[flat], by_ref[flat], bz_ref[flat]
    else:
        bx = by = bz = None

    # Double-buffered box pipeline: the current tile's box was DMA'd by
    # the PREVIOUS grid step (the first step self-starts), and this
    # step kicks off the next tile's DMA before its own accumulation —
    # so the HBM fetch overlaps the whole S^3 compute, not just the
    # coefficient-plane build.  Requires "arbitrary" grid semantics
    # (sequential iteration order).
    step = ((c * ntx + ix) * nty + iy) * ntz + iz
    last = pl.num_programs(0) * ntx * nty * ntz - 1
    parity = jax.lax.rem(step, jnp.asarray(2, step.dtype))
    src_cur, ry, rz = src_rolls(c, ix, iy, iz)

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(src_cur, box0, sem0).start()

    # next tile's grid indices (row-major increment, iz fastest)
    izn = iz + 1
    cz_ = izn == ntz
    izn = jnp.where(cz_, 0, izn)
    iyn = jnp.where(cz_, iy + 1, iy)
    cy_ = iyn == nty
    iyn = jnp.where(cy_, 0, iyn)
    ixn = jnp.where(cy_, ix + 1, ix)
    cx_ = ixn == ntx
    ixn = jnp.where(cx_, 0, ixn)
    cn = jnp.where(cx_, c + 1, c)
    cn = jnp.minimum(cn, pl.num_programs(0) - 1)
    src_nxt, _, _ = src_rolls(cn, ixn, iyn, izn)

    @pl.when(parity == 0)
    def _():
        pltpu.make_async_copy(src_cur, box0, sem0).wait()

    @pl.when(parity == 1)
    def _():
        pltpu.make_async_copy(src_cur, box1, sem1).wait()

    @pl.when((step < last) & (parity == 0))
    def _():
        pltpu.make_async_copy(src_nxt, box1, sem1).start()

    @pl.when((step < last) & (parity == 1))
    def _():
        pltpu.make_async_copy(src_nxt, box0, sem0).start()

    # coefficient (and derivative) planes overlap the DMA; built only
    # for the ACTIVE shifts, stored at their geometry-range index
    shape = (TX, TY, TZ)

    d0r = d0_ranges or (None, None, None)
    need_g = grad or hess

    def _planes(g_ref, order, a0, a1, s0, org, axis, base, dr):
        w, gr, he = _coef_planes(g_ref[0], order, a0, a1, org, axis,
                                 shape, grad=need_g, hess=hess,
                                 base=base, d0_range=dr)
        ks = range(a0 - s0, a1 - s0 + 1)
        wd = dict(zip(ks, w))
        gd = dict(zip(ks, gr)) if need_g else None
        hd = dict(zip(ks, he)) if hess else None
        return wd, gd, hd

    cxs, gxs, hxs = _planes(gx_ref, orders[0], ax0, ax1, sx0, x0, 0, bx,
                            d0r[0])
    cys, gys, hys = _planes(gy_ref, orders[1], ay0, ay1, sy0, y0, 1, by,
                            d0r[1])
    czs, gzs, hzs = _planes(gz_ref, orders[2], az0, az1, sz0, z0, 2, bz,
                            d0r[2])

    bval = jnp.where(parity == 0, box0[...], box1[...])
    if adaptive:
        # remove the alignment residues: roll rows/lanes so the window
        # origin sits at index 0 (dynamic rotate)
        bval = pltpu.roll(bval, BYa - ry, 1)
        bval = pltpu.roll(bval, BZa - rz, 2)

    dt = out_refs[0].dtype
    acc_v = jnp.zeros(shape, dt) if value else None
    acc_dx = jnp.zeros(shape, dt) if grad else None
    acc_dy = jnp.zeros(shape, dt) if grad else None
    acc_dz = jnp.zeros(shape, dt) if grad else None
    if hess:
        acc_h = {k: jnp.zeros(shape, dt)
                 for k in ("xx", "yy", "zz", "xy", "xz", "yz")}

    for ky in kys:
        ys = bval if ky == 0 else pltpu.roll(bval, BYa - ky, 1)
        ys = ys[:, 0:TY, :]
        zvals = {kz: ys[:, :, kz:kz + TZ] for kz in kzs}
        zc = {kx: None for kx in kxs}   # weight z-sums
        zg = {kx: None for kx in kxs}   # 1st-derivative z-sums
        zh = {kx: None for kx in kxs}   # 2nd-derivative z-sums
        for kz in kzs:
            for kx in kxs:
                seg = zvals[kz][kx:kx + TX]
                t = czs[kz] * seg
                zc[kx] = t if zc[kx] is None else zc[kx] + t
                if need_g:
                    t = gzs[kz] * seg
                    zg[kx] = t if zg[kx] is None else zg[kx] + t
                if hess:
                    t = hzs[kz] * seg
                    zh[kx] = t if zh[kx] is None else zh[kx] + t
        for kx in kxs:
            cc = cxs[kx] * cys[ky]
            if value:
                acc_v = acc_v + cc * zc[kx]
            if grad:
                acc_dz = acc_dz + cc * zg[kx]
                acc_dx = acc_dx + (gxs[kx] * cys[ky]) * zc[kx]
                acc_dy = acc_dy + (cxs[kx] * gys[ky]) * zc[kx]
            if hess:
                acc_h["xx"] = acc_h["xx"] + (hxs[kx] * cys[ky]) * zc[kx]
                acc_h["yy"] = acc_h["yy"] + (cxs[kx] * hys[ky]) * zc[kx]
                acc_h["zz"] = acc_h["zz"] + cc * zh[kx]
                acc_h["xy"] = acc_h["xy"] + (gxs[kx] * gys[ky]) * zc[kx]
                acc_h["xz"] = acc_h["xz"] + (gxs[kx] * cys[ky]) * zg[kx]
                acc_h["yz"] = acc_h["yz"] + (cxs[kx] * gys[ky]) * zg[kx]

    outs = []
    if value:
        outs.append(acc_v)
    if grad:
        outs.extend([acc_dx, acc_dy, acc_dz])
    if hess:
        outs.extend(acc_h[k] for k in ("xx", "yy", "zz", "xy", "xz",
                                       "yz"))
    for ref, acc in zip(out_refs, outs):
        ref[0] = acc


def _geometry(ishape, orders, max_disp, tile, ranges_override=None):
    """Shared box/pad geometry for the warp kernels.

    ``ranges_override``: explicit per-axis (smin, smax) shift ranges,
    each REQUIRED to contain 0 (the box-origin/pad convention) — used
    by the wide-window chunking, whose active sub-ranges are narrower
    than the geometry ranges."""
    D = 3
    from .window import _md_tuple
    if ranges_override is not None:
        ranges = tuple(ranges_override)
        assert all(r[0] <= 0 <= r[1] for r in ranges), ranges
        lo = [-r[0] for r in ranges]
        hi = [r[1] for r in ranges]
    else:
        md = _md_tuple(max_disp, D)
        ranges = tuple(window_range(orders[d], md[d]) for d in range(D))
        lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    # extend the right-hand pad so edge-tile DMAs stay in range
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]
    return ranges, lo, hi, S, box_shape


def _geometry_adaptive(ishape, orders, max_disp, spread, tile,
                       ranges_override=None):
    """Box/pad geometry for the adaptive (per-tile base) kernel.

    The shift window is the *residual* window from ``spread``; the pad
    absorbs the worst-case base (B = ceil(max_disp) per axis) plus the
    DMA alignment slop on the sublane/lane axes.  ``ranges_override``:
    explicit residual sub-ranges (each containing 0) for wide-residual
    chunked launches — same convention as :func:`_geometry`."""
    D = 3
    from .window import _md_tuple
    md = _md_tuple(max_disp, D)
    sp = _md_tuple(spread, D)
    if ranges_override is not None:
        ranges = tuple(ranges_override)
        assert all(r[0] <= 0 <= r[1] for r in ranges), ranges
    else:
        ranges = tuple(window_range(orders[d], sp[d]) for d in range(D))
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    B = tuple(int(math.ceil(m)) for m in md)
    # margin: window origin for base b sits at tile0 + (B - smin) + b + smin
    #       = tile0 + B + b  >= tile0 (b >= -B)
    margin = tuple(B[d] - ranges[d][0] for d in range(D))
    lo = list(margin)
    need = (tile[0] + S[0] - 1,
            -(-(tile[1] + S[1] - 1 + 7) // 8) * 8,
            -(-(tile[2] + S[2] - 1 + 127) // 128) * 128)
    hi = [B[d] + ranges[d][1] + (need[d] - (tile[d] + S[d] - 1))
          for d in range(D)]
    base_margin = tuple(B)
    return ranges, lo, hi, S, tuple(need), base_margin


def _tile_bases(disp, md, ntiles, tile):
    """Per-tile integer base displacements (adaptive mode): the rounded
    tile-mean of each displacement component, clipped to the declared
    bound.  ``disp`` must already be padded to tile alignment."""
    D = 3
    bs = []
    for d in range(D):
        m = disp[..., d].reshape(
            ntiles[0], tile[0], ntiles[1], tile[1],
            ntiles[2], tile[2]).mean(axis=(1, 3, 5))
        B = int(math.ceil(md[d]))
        bs.append(jnp.clip(jnp.round(m), -B, B)
                  .astype(jnp.int32).reshape(-1))
    return bs


def _adaptive_disp(grid, ishape, ishape_a, wdtype):
    """Displacement field of a dense grid, edge-replicated into the
    tile-alignment margin; returns (disp, grid_extended)."""
    D = 3
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    iota = jnp.stack(
        [jax.lax.broadcasted_iota(wdtype, tuple(ishape), d)
         for d in range(D)], -1)
    disp = grid.astype(wdtype) - iota
    if any(extra):
        disp = jnp.pad(disp, [(0, e) for e in extra] + [(0, 0)],
                       mode="edge")
        iota_a = jnp.stack(
            [jax.lax.broadcasted_iota(wdtype, tuple(ishape_a), d)
             for d in range(D)], -1)
        grid = iota_a + disp
    return disp, grid


def warp_pallas(inp: jnp.ndarray, grid: jnp.ndarray,
                orders: Tuple[int, ...], bounds: Tuple[int, ...],
                extrapolate: int, max_disp: float, *,
                value: bool = True, grad: bool = False,
                hess: bool = False,
                spread=None, ranges_override=None, active=None,
                d0_ranges=None,
                tile: Tuple[int, int, int] = None,
                interpret: bool = False):
    """Fused dense-grid 3D pull / spatial gradient / Hessian on the
    native tier.

    inp: (C, *ishape); grid: (*ishape, 3).  Returns ``(val, g)`` where
    ``val`` is (C, *ishape) or None and ``g`` is (C, *ishape, 3) or
    None, per the ``value`` / ``grad`` flags; with ``hess=True`` the
    return is ``(val, g, h)`` with ``h`` the symmetric (C, *ishape, 3,
    3) spatial Hessian (the six unique components come from the same
    single pass over the shift window).  Channels ride a kernel grid
    dimension (single launch); batching above this is vmap.  Same
    semantics/contract as ops/window.pull_window / grad_window /
    hess_window.

    ``spread``: opt-in adaptive per-tile windows.  A per-axis bound on
    the *residual* displacement |d_a(p) - round(mean_tile(d_a))| over
    each (TX, TY, TZ) tile — note the tile spans TZ=128 voxels along
    the last axis, so the bound is over that whole extent.  The shift
    window is then sized by ``spread`` instead of ``max_disp``: compute
    cost becomes independent of the displacement magnitude for
    tile-smooth fields.  Samples violating the residual bound lose
    taps (graceful degradation, same failure mode as the max_disp
    contract).
    """
    C = inp.shape[0]
    ishape = tuple(inp.shape[1:])
    tile = tile or default_tile(ishape)
    D = 3
    if tile is None:
        raise ValueError("warp_pallas is 3-D only")
    if grid.shape != ishape + (D,):
        raise ValueError("warp_pallas needs a dense (X,Y,Z,3) grid")
    if not (value or grad or hess):
        raise ValueError("nothing to compute")
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    # compute in at least f32: bf16 accumulation over S^3 taps is lossy
    # and bf16 VMEM tiling differs (16-sublane)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

    adaptive = spread is not None
    if adaptive:
        (ranges, lo, hi, S, box_shape,
         base_margin) = _geometry_adaptive(ishape, orders, max_disp,
                                           spread, tile,
                                           ranges_override=ranges_override)
    else:
        ranges, lo, hi, S, box_shape = _geometry(
            ishape, orders, max_disp, tile,
            ranges_override=ranges_override)
        base_margin = None

    # boundary-folded window pad for the real volume, then zero-extend to
    # tile alignment (margin tiles compute garbage that is sliced off)
    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if adaptive:
        # per-tile base displacements from the *displacement* field,
        # edge-replicated into the alignment margin (replicating raw
        # grid coords would skew the means by the margin distance)
        from .window import _md_tuple
        md = _md_tuple(max_disp, D)
        disp, grid = _adaptive_disp(grid, ishape, ishape_a, wdtype)
    elif any(extra):
        grid = _pad_grid_edge(grid, ishape_a)
    if any(extra):
        vpad = jnp.pad(vpad, [(0, 0)] + [(0, e) for e in extra])
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    bs = _tile_bases(disp, md, ntiles, tile) if adaptive else []

    kernel = partial(_warp_kernel, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape,
                     value=value, grad=grad, hess=hess,
                     base_margin=base_margin,
                     active=active, d0_ranges=d0_ranges)
    gspec = pl.BlockSpec((1,) + tuple(tile),
                         lambda c, i, j, k: (0, i, j, k),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1,) + tuple(tile),
                         lambda c, i, j, k: (c, i, j, k),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_out = (1 if value else 0) + (3 if grad else 0) + (6 if hess else 0)
    g = grid.astype(wdtype)[None]
    outs = pl.pallas_call(
        kernel,
        grid=(C,) + ntiles,
        in_specs=[gspec, gspec, gspec,
                  # the padded volume stays in HBM: the kernel DMAs one
                  # aligned box per tile
                  pl.BlockSpec(memory_space=pltpu.HBM)]
        + [sspec] * (3 if adaptive else 0),
        out_specs=[ospec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((C,) + ishape_a, wdtype)] * n_out,
        scratch_shapes=[
            pltpu.VMEM(box_shape, wdtype),
            pltpu.VMEM(box_shape, wdtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # "arbitrary": the cross-step double-buffered box DMA needs the
        # sequential row-major iteration order
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4),
        interpret=interpret,
    )(g[..., 0], g[..., 1], g[..., 2], vpad, *bs)

    crop = (slice(None),) + tuple(slice(0, n) for n in ishape)
    outs = [o[crop] for o in outs]
    gridr = grid[tuple(slice(0, n) for n in ishape)]
    mask = inbounds_mask(gridr.reshape(-1, D), ishape, extrapolate,
                         wdtype)
    if mask is not None:
        mask = mask.reshape((1,) + ishape)
        outs = [o * mask for o in outs]
    outs = [o.astype(out_dtype) for o in outs]
    val = outs[0] if value else None
    i = (1 if value else 0)
    gout = jnp.stack(outs[i:i + 3], axis=-1) if grad else None
    if not hess:
        return val, gout
    xx, yy, zz, xy, xz, yz = outs[-6:]
    hout = jnp.stack([jnp.stack([xx, xy, xz], axis=-1),
                      jnp.stack([xy, yy, yz], axis=-1),
                      jnp.stack([xz, yz, zz], axis=-1)], axis=-2)
    return val, gout, hout


def pull_window_pallas(inp, grid, orders, bounds, extrapolate, max_disp,
                       tile=None, interpret=False, deriv_axis=None):
    """Back-compat single-channel entry (kernel-lab baseline v0).

    inp: (*ishape,); prefer :func:`warp_pallas`."""
    val, g = warp_pallas(
        inp[None], grid, orders, bounds, extrapolate, max_disp,
        value=deriv_axis is None, grad=deriv_axis is not None,
        tile=tile, interpret=interpret)
    if deriv_axis is None:
        return val[0]
    return g[0, ..., deriv_axis]


# ---------------------------------------------------------------- push

def _push_kernel(gx_ref, gy_ref, gz_ref, *refs,
                 orders, ranges, tile, box_shape, active=None,
                 d0_ranges=None, base_margin=None, deriv=False):
    """Exact adjoint of the pull kernel's data movement: splat one
    tile's values into its private halo-extended box.

    ``deriv`` (pushgrad mode): three value inputs — the per-axis
    cotangents of the spatial gradient — are splatted through the
    derivative coefficient planes (d/dx, d/dy, d/dz respectively) into
    ONE shared box: the adjoint of grad_window (reference contract
    interpol/pushpull.py:176-203, grid_pushgrad).  Same data movement
    as the plain splat — only the per-(kx,ky,kz) weighting changes
    (three FMAs instead of one).

    Transposed v3 structure — per (ky, kz): accumulate the x-placed
    rows (leading-dim list, free placement), then one lane-roll to
    z-place; per ky: one sublane-roll to y-place.  Shuffle count
    matches the pull kernel (Sy*Sz lane-rolls + Sy sublane-rolls of
    box-sized arrays) instead of round 1's per-(ky,kz) scratch
    read-modify-write over a (Sy, Sz, BXa, TY, TZ) slab buffer — which
    is what capped the compilable window span at 12.

    Adaptive mode (``base_margin``): coefficient planes select over the
    *residual* window re-centered on the per-tile base (SMEM tables);
    y/z placement gets the base applied with ONE final dynamic roll of
    the accumulated box (margins 2*B wide), while the x base is applied
    by the caller's overlap-add epilogue (dynamic leading-dim offsets
    are free there; in-kernel dynamic rolls only exist for the
    sublane/lane axes).
    """
    val_refs = refs[:1]
    refs = refs[1:]
    adaptive = base_margin is not None
    if adaptive:
        bx_ref, by_ref, bz_ref = refs[:3]
        box_out = refs[3]
    else:
        box_out = refs[0]
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    (ax0, ax1), (ay0, ay1), (az0, az1) = active or ranges
    kxs = range(ax0 - sx0, ax1 - sx0 + 1)
    kys = range(ay0 - sy0, ay1 - sy0 + 1)
    kzs = range(az0 - sz0, az1 - sz0 + 1)
    d0r = d0_ranges or (None, None, None)
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    if adaptive:
        nty, ntz = pl.num_programs(2), pl.num_programs(3)
        flat = (ix * nty + iy) * ntz + iz
        bx, by, bz = bx_ref[flat], by_ref[flat], bz_ref[flat]
    else:
        bx = by = bz = None

    shape = (TX, TY, TZ)
    cxs, gxs, _ = _coef_planes(gx_ref[0], orders[0], ax0, ax1, x0, 0,
                               shape, grad=deriv, d0_range=d0r[0],
                               base=bx)
    cys, gys, _ = _coef_planes(gy_ref[0], orders[1], ay0, ay1, y0, 1,
                               shape, grad=deriv, d0_range=d0r[1],
                               base=by)
    czs, gzs, _ = _coef_planes(gz_ref[0], orders[2], az0, az1, z0, 2,
                               shape, grad=deriv, d0_range=d0r[2],
                               base=bz)
    cxs = dict(zip(kxs, cxs))
    cys = dict(zip(kys, cys))
    czs = dict(zip(kzs, czs))
    if deriv:
        gxs = dict(zip(kxs, gxs))
        gys = dict(zip(kys, gys))
        gzs = dict(zip(kzs, gzs))
        # the three cotangent streams ride ONE ref on a free leading
        # component dim — three separate same-shaped VMEM inputs
        # MISCOMPILE on-chip (observed r5: correct in interpret mode,
        # ~O(1) relative error compiled, even with the derivative
        # planes swapped out; restacking onto a leading dim of a
        # single ref fixes it)
        vv = val_refs[0]
        vx, vy, vz = vv[0, 0], vv[0, 1], vv[0, 2]
        # z-weighted values, shared across (kx, ky): the d/dz channel
        # takes the derivative z planes, the others the weight planes
        vzs = {kz: (czs[kz] * vx, czs[kz] * vy, gzs[kz] * vz)
               for kz in kzs}
    else:
        val = val_refs[0][0]
        # z-weighted values, shared across (kx, ky)
        vzs = {kz: czs[kz] * val for kz in kzs}

    zpad = BZa - TZ
    ypad = BYa - TY
    acc = None                              # (BXa, BYa, BZa) value
    for ky in kys:
        if deriv:
            cxys = {kx: (gxs[kx] * cys[ky], cxs[kx] * gys[ky],
                         cxs[kx] * cys[ky]) for kx in kxs}
        else:
            cxys = {kx: cxs[kx] * cys[ky] for kx in kxs}
        wk = None                           # (BXa, TY, BZa) value
        for kz in kzs:
            # x-placed rows: rows[u] = sum_{kx: u-kx in tile} cxy*vz
            rows = [None] * BXa
            for kx in kxs:
                if deriv:
                    a0, a1, a2 = cxys[kx]
                    v0, v1, v2 = vzs[kz]
                    wxy = a0 * v0 + a1 * v1 + a2 * v2  # (TX, TY, TZ)
                else:
                    wxy = cxys[kx] * vzs[kz]           # (TX, TY, TZ)
                for x in range(TX):
                    u = x + kx
                    r = wxy[x]
                    rows[u] = r if rows[u] is None else rows[u] + r
            zero = jnp.zeros((TY, TZ), val_refs[0].dtype)
            R = jnp.stack([r if r is not None else zero for r in rows])
            R = jnp.pad(R, ((0, 0), (0, 0), (0, zpad)))
            R = R if kz == 0 else pltpu.roll(R, kz, 2)   # z-place
            wk = R if wk is None else wk + R
        wk = jnp.pad(wk, ((0, 0), (0, ypad), (0, 0)))
        wk = wk if ky == 0 else pltpu.roll(wk, ky, 1)    # y-place
        acc = wk if acc is None else acc + wk
    if acc is None:
        acc = jnp.zeros((BXa, BYa, BZa), val_refs[0].dtype)
    if adaptive:
        # apply the per-tile base on the sublane/lane axes with one
        # dynamic roll each (the 2*B margins absorb any base)
        acc = pltpu.roll(acc, base_margin[1] + by, 1)
        acc = pltpu.roll(acc, base_margin[2] + bz, 2)
    box_out[0, 0, 0, 0] = acc


def _geometry_adaptive_push(orders, max_disp, spread, tile,
                            ranges_override=None):
    """Box/pad geometry for the adaptive push kernel: residual window
    placement is static; the y/z per-tile base is absorbed by 2*B-wide
    in-box margins (applied with one dynamic roll), the x base by
    dynamic overlap-add offsets in the epilogue."""
    D = 3
    from .window import _md_tuple
    md = _md_tuple(max_disp, D)
    sp = _md_tuple(spread, D)
    if ranges_override is not None:
        ranges = tuple(ranges_override)
        assert all(r[0] <= 0 <= r[1] for r in ranges), ranges
    else:
        ranges = tuple(window_range(orders[d], sp[d]) for d in range(D))
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    B = tuple(int(math.ceil(m)) for m in md)
    box_shape = (tile[0] + S[0] - 1,
                 -(-(tile[1] + S[1] - 1 + 2 * B[1]) // 8) * 8,
                 -(-(tile[2] + S[2] - 1 + 2 * B[2]) // 128) * 128)
    # acc coords: axis 0: index = x + B0 + bx + u; axes 1/2: margins
    # live inside the box (placement origin = tile origin)
    lo = [B[0] - ranges[0][0],
          B[1] - ranges[1][0],
          B[2] - ranges[2][0]]
    hi = [B[0] + ranges[0][1],
          box_shape[1] - tile[1] - lo[1],
          box_shape[2] - tile[2] - lo[2]]
    return ranges, lo, hi, S, box_shape, B


def push_window_pallas(inp: jnp.ndarray, grid: jnp.ndarray,
                       orders: Tuple[int, ...], bounds: Tuple[int, ...],
                       extrapolate: int, max_disp: float,
                       tile: Tuple[int, int, int] = None,
                       interpret: bool = False, ranges_override=None,
                       active=None, d0_ranges=None,
                       spread=None, deriv: bool = False) -> jnp.ndarray:
    """Dense-grid 3D push (exact adjoint of the pull kernel).

    inp: (C, *ishape) values at grid sites; grid: (*ishape, 3).
    Returns the splatted (C, *ishape) volume.  The kernel splats
    per-tile private boxes (race-free by construction); the
    overlap-add and boundary fold-back run in XLA with static indices
    (adjoint contract: reference interpol/pushpull.py:262-282).

    ``spread``: adaptive per-tile bases (see warp_pallas) — the splat
    window is sized by the residual spread instead of ``max_disp``;
    the overlap-add epilogue then applies per-tile dynamic x-offsets
    sequentially (lax.fori_loop), y/z bases having been rolled into
    the in-box margins by the kernel.

    ``deriv`` (pushgrad): inp is (C, *ishape, 3) per-axis cotangents of
    the spatial gradient, splatted through the derivative coefficient
    planes into one shared box per tile — the native adjoint of
    grad_window (reference interpol/pushpull.py:176-203).
    """
    C = inp.shape[0]
    ishape = tuple(inp.shape[1:-1] if deriv else inp.shape[1:])
    tile = tile or default_tile(ishape, push=True)
    D = 3
    if tile is None:
        raise ValueError("push_window_pallas is 3-D only")
    if grid.shape != ishape + (D,):
        raise ValueError("push_window_pallas needs a dense (X,Y,Z,3) grid")
    if deriv and inp.shape[-1] != D:
        raise ValueError("pushgrad values must be (C, X, Y, Z, 3)")
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

    adaptive = spread is not None
    if adaptive:
        (ranges, lo, hi, S, box_shape,
         Bm) = _geometry_adaptive_push(orders, max_disp, spread, tile,
                                       ranges_override=ranges_override)
    else:
        ranges, lo, hi, S, box_shape = _geometry(
            ishape, orders, max_disp, tile,
            ranges_override=ranges_override)
        Bm = None

    # extrapolation mask applies to the *values* before splatting
    vals = inp.astype(wdtype)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        mshape = (1,) + ishape + ((1,) if deriv else ())
        vals = vals * mask.reshape(mshape)

    # tile-alignment padding: zero values in the margin contribute
    # nothing; edge-replicated grid coords keep the kernel well-defined
    ishape_a = _aligned(ishape, tile)
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vals = jnp.pad(vals, [(0, 0)] + [(0, e) for e in extra]
                       + ([(0, 0)] if deriv else []))
        if adaptive:
            _, grid = _adaptive_disp(grid, ishape, ishape_a, wdtype)
        else:
            grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))
    pshape = tuple(a + l + h for a, l, h in zip(ishape_a, lo, hi))

    bs = []
    if adaptive:
        from .window import _md_tuple
        md = _md_tuple(max_disp, D)
        iota = jnp.stack(
            [jax.lax.broadcasted_iota(wdtype, tuple(ishape_a), d)
             for d in range(D)], -1)
        disp = grid.astype(wdtype) - iota
        bs = _tile_bases(disp, md, ntiles, tile)

    kernel = partial(_push_kernel, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape,
                     active=active, d0_ranges=d0_ranges,
                     base_margin=Bm, deriv=deriv)
    gspec = pl.BlockSpec((1,) + tuple(tile),
                         lambda c, i, j, k: (0, i, j, k),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1,) + tuple(tile),
                         lambda c, i, j, k: (c, i, j, k),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    g = grid.astype(wdtype)[None]
    if deriv:
        # single stacked (C, 3, X, Y, Z) stream: the component dim is a
        # free leading block dim (three separate value inputs
        # miscompile on-chip — see the kernel comment)
        vins = [jnp.moveaxis(vals, -1, 1)]
        vspec_in = pl.BlockSpec((1, D) + tuple(tile),
                                lambda c, i, j, k: (c, 0, i, j, k),
                                memory_space=pltpu.VMEM)
    else:
        vins = [vals]
        vspec_in = vspec
    boxes = pl.pallas_call(
        kernel,
        grid=(C,) + ntiles,
        in_specs=[gspec, gspec, gspec, vspec_in]
        + [sspec] * (3 if adaptive else 0),
        out_specs=pl.BlockSpec((1, 1, 1, 1) + box_shape,
                               lambda c, i, j, k: (c, i, j, k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C,) + ntiles + box_shape, wdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 4),
        interpret=interpret,
    )(g[..., 0], g[..., 1], g[..., 2], *vins, *bs)

    if adaptive:
        # sequential overlap-add with per-tile dynamic x origins (the
        # x base cannot be applied in-kernel: dynamic rolls only exist
        # for the sublane/lane axes)
        NT = math.prod(ntiles)
        bxs = bs[0]
        boxes_f = boxes.reshape((C, NT) + box_shape)
        acc = jnp.zeros((C,) + pshape, wdtype)

        def body(t, a):
            iy_z = t % (ntiles[1] * ntiles[2])
            ix = t // (ntiles[1] * ntiles[2])
            iy = iy_z // ntiles[2]
            iz = iy_z % ntiles[2]
            sx = (ix * tile[0] + Bm[0] + bxs[t]).astype(jnp.int32)
            sy = (iy * tile[1]).astype(jnp.int32)
            sz = (iz * tile[2]).astype(jnp.int32)
            z0 = jnp.asarray(0, jnp.int32)
            box_t = jax.lax.dynamic_slice(
                boxes_f, (z0, t.astype(jnp.int32), z0, z0, z0),
                (C, 1) + box_shape)[:, 0]
            blk = jax.lax.dynamic_slice(
                a, (z0, sx, sy, sz), (C,) + box_shape)
            return jax.lax.dynamic_update_slice(a, blk + box_t,
                                                (z0, sx, sy, sz))

        acc = jax.lax.fori_loop(0, NT, body, acc)
        from .window import _fold_pad_margins
        hi_tot = [h + e for h, e in zip(hi, extra)]
        out = _fold_pad_margins(acc, ishape, bounds, lo, hi_tot, wdtype)
        return out.astype(out_dtype)

    # XLA epilogue 1: overlap-add the private boxes into the padded
    # volume — scatter-free: boxes are regularly strided (origin = tile
    # origin in padded coords), so padding each box to a whole number
    # of tile-sized chunks turns the overlap-add into a few static
    # dense block adds (a scatter formulation of this step was measured
    # to dominate the whole op).
    nch = tuple(-(-b // t) for b, t in zip(box_shape, tile))
    BP = tuple(c * t for c, t in zip(nch, tile))
    boxes = jnp.pad(boxes, [(0, 0)] * 4
                    + [(0, p - b) for p, b in zip(BP, box_shape)])
    accw = tuple(max(p, n - t + bp) for p, n, t, bp
                 in zip(pshape, ishape_a, tile, BP))
    acc = jnp.zeros((C,) + accw, wdtype)
    for cx in range(nch[0]):
        for cy in range(nch[1]):
            for cz in range(nch[2]):
                blk = boxes[:, :, :, :,
                            cx * tile[0]:(cx + 1) * tile[0],
                            cy * tile[1]:(cy + 1) * tile[1],
                            cz * tile[2]:(cz + 1) * tile[2]]
                blk = blk.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
                    (C,) + ishape_a)
                acc = acc.at[:,
                             cx * tile[0]:cx * tile[0] + ishape_a[0],
                             cy * tile[1]:cy * tile[1] + ishape_a[1],
                             cz * tile[2]:cz * tile[2] + ishape_a[2]
                             ].add(blk)
    acc = acc[:, :pshape[0], :pshape[1], :pshape[2]]

    # XLA epilogue 2: fold the pad margins back through the boundary
    # (adjoint of the pull path's _pad_folded; the alignment margin
    # folds too — it only ever holds zeros)
    from .window import _fold_pad_margins
    hi_tot = [h + e for h, e in zip(hi, extra)]
    out = _fold_pad_margins(acc, ishape, bounds, lo, hi_tot, wdtype)
    return out.astype(out_dtype)
