"""Scattered-grid native tier: Pallas TPU sampling for arbitrary
(non-dense) point clouds — the last jitfields-parity hole.

The reference accelerates ``grid_pull/push/count/grad`` for *arbitrary*
grids through the external jitfields CUDA tier
(/root/reference/interpol/jitfields.py:47-114); the dense-warp window
kernels (ops/window.py, ops/pallas_warp.py) only cover grids with one
sample per voxel and a bounded displacement.  This module covers the
scattered case with a TPU-shaped scheme (ROUND_NOTES round-2
feasibility work, scripts/tpu_kernel_lab5.py):

  1. **Box decomposition** (XLA, trace-time shapes): the volume is
     padded with boundary-folded content (all seven bounds exact, same
     pad as the window tier) and cut into overlapping *boxes*: core
     ``box`` voxels plus the spline support margin, flattened to rows
     of a ``(NB, TAB)`` table array.  Every tap of every point whose
     position lies in a box core is inside that box.
  2. **Schedule** (XLA): points are bucketed by box id with ONE
     ``lax.sort`` (coords ride as payload — no P-sized gather), per-box
     segments located with a vectorized ``searchsorted``, and each box
     is given ``cap`` = 128 slots = one 128-lane row.
  3. **Kernel** (Pallas): one program per (channel, 8-box block);
     the block's 8 table rows arrive as a VMEM ``(8, TAB)`` operand and
     each slot's taps are fetched with per-sublane-row
     ``jnp.take_along_axis`` — the only dynamic-gather shape Mosaic
     lowers (lab-5: a K-entry shared table costs a K/128-chunk
     shuffle+select cascade per gathered element).  Cox-de Boor tap
     weights are evaluated in-kernel; value and the three spatial
     derivatives share every gather (fused, like the dense warp
     kernel).
  4. **Exactness**: points outside the eligible region (outside the
     closed volume bounds) or overflowing a box's 128 slots fall back
     to the generic XLA gather core under a single ``lax.cond`` —
     never silently dropped; the fallback costs nothing when no such
     point exists.

Semantics match ops/ndkernels.pull_core / grad_core exactly (reference
interpol/nd.py:80-143, 216-288).  The push/count family stays on the
XLA scatter core: Mosaic has no scatter primitive, and a segment-sum
formulation was not competitive in the round-2 lab probes.
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

from .bounds import fold_index, fold_sign
from .ndkernels import inbounds_mask
from .splines import bspline_taps, node_origin
from .window import _pad_folded

__all__ = ["pull_scattered", "grad_scattered", "box_geometry",
           "DEFAULT_BOX", "MIN_POINTS"]

# Default box core: TAB = 11*11*19 = 2299 -> 2304 lanes at cubic order,
# the shape the lab-5 cascade probe measured.  Larger cores raise slot
# occupancy but the gather cascade cost is linear in TAB.
DEFAULT_BOX = (8, 8, 16)

# Candidate box cores for auto_box, sparse -> dense (core voxels
# 8192 .. 64): the gather-cascade cost per slot is linear in TAB, so
# denser clouds want smaller boxes; sparser clouds want larger cores so
# per-box fixed costs (table DMA, empty slots) amortize.
_BOX_LADDER = [(16, 16, 32), (16, 16, 16), (8, 16, 16), (8, 8, 16),
               (8, 8, 8), (4, 8, 8), (4, 4, 8), (4, 4, 4)]
# Target expected points per box: comfortably under CAP=128 so random
# (Poisson) fluctuations rarely overflow into the fallback.
_TARGET_PER_BOX = 80.0


def auto_box(ishape: Tuple[int, ...], P: int) -> Tuple[int, int, int]:
    """Pick a box core so the expected per-box point count stays under
    ~_TARGET_PER_BOX at this cloud's density (dense grids land on tiny
    cores where TAB — and with it the per-tap gather-cascade cost — is
    smallest)."""
    rho = P / max(1, math.prod(ishape))
    for b in _BOX_LADDER:
        if rho * math.prod(b) <= _TARGET_PER_BOX:
            return b
    return _BOX_LADDER[-1]
# Below this many points the XLA gather core wins (the scattered tier
# pays ~fixed sort + table-build cost); documented density threshold
# for the auto backend dispatch.
MIN_POINTS = 32768
CAP = 128   # slots per box = one 128-lane row


def box_geometry(orders: Tuple[int, ...], box: Tuple[int, ...]):
    """Per-axis (margin_lo, extent) of the padded box and the padded
    flat table length TAB.

    A point g in the core ``[c*B, (c+1)*B)`` has node origin
    ``n0 = floor(g - (order-1)/2)`` (order 0: round) with taps
    ``n0..n0+order``; over the core the taps span exactly
    ``[c*B - order//2, c*B + B - 1 + order//2 + 1]`` — extent
    ``B + 2*(order//2) + 1`` (= B+order for odd, B+order+1 for even
    orders)."""
    blo = tuple(o // 2 for o in orders)
    ext = tuple(b + 2 * (o // 2) + 1 for b, o in zip(box, orders))
    tab_raw = math.prod(ext)
    tab = -(-tab_raw // 128) * 128
    return blo, ext, tab


def _build_tables(inp: jnp.ndarray, ishape, orders, bounds, box, wdtype):
    """(C, *ishape) -> (C, NB8, TAB) boundary-folded overlapping boxes.

    Built with static strided slices + stacks (no gather): for each
    in-box offset j the strided view ``vpad[j::B]`` lists that offset's
    value in every box."""
    D = len(ishape)
    blo, ext, tab = box_geometry(orders, box)
    nb = tuple(-(-n // b) for n, b in zip(ishape, box))
    lo = list(blo)
    hi = [nbd * bd - n + e - bd - bl
          for nbd, bd, n, e, bl in zip(nb, box, ishape, ext, blo)]
    v = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)
    # axis d padded length = blo + NB*B + (hi) = NB*B + E - B
    for d in range(D):
        axis = v.ndim - D + d      # current position of spatial axis d
        segs = []
        for j in range(ext[d]):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(j, j + nb[d] * box[d], box[d])
            segs.append(v[tuple(sl)])
        # (..., NB_d, ...) stacked offset axis right after the box axis
        v = jnp.stack(segs, axis=axis + 1)
    # v: (C, NBx, Ex, NBy, Ey, NBz, Ez) -> (C, NB, TABraw)
    perm = [0] + [1 + 2 * d for d in range(D)] + [2 + 2 * d
                                                 for d in range(D)]
    v = v.transpose(perm).reshape(inp.shape[0], math.prod(nb),
                                  math.prod(ext))
    NB8 = -(-math.prod(nb) // 8) * 8
    v = jnp.pad(v, ((0, 0), (0, NB8 - math.prod(nb)),
                    (0, tab - math.prod(ext))))
    return v, nb, blo, ext, tab


def _schedule(grid: jnp.ndarray, ishape, box, nb, wdtype):
    """Sort points by box id; return per-sorted-point and per-box data.

    Returns dict with: keys_sorted (P,), coords_sorted (P, D),
    idx_sorted (P,), seg_start (NBtot+1,), rank (P,), eligible (P,).
    """
    D = grid.shape[-1]
    P = grid.shape[0]
    NBtot = math.prod(nb)
    g = grid.astype(wdtype)
    elig = None
    for d in range(D):
        m = (g[..., d] >= 0) & (g[..., d] <= ishape[d] - 1)
        elig = m if elig is None else (elig & m)
    cid = None
    for d in range(D):
        c = jnp.clip((g[..., d] // box[d]).astype(jnp.int32),
                     0, nb[d] - 1)
        cid = c if cid is None else cid * nb[d] + c
    keys = jnp.where(elig, cid, NBtot).astype(jnp.int32)
    iota = jnp.arange(P, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (keys,) + tuple(g[..., d] for d in range(D)) + (iota,),
        num_keys=1)
    keys_s = sorted_ops[0]
    coords_s = jnp.stack(sorted_ops[1:1 + D], axis=-1)
    idx_s = sorted_ops[1 + D]
    seg_start = jnp.searchsorted(keys_s, jnp.arange(NBtot + 1,
                                                    dtype=jnp.int32))
    # rank within segment without a per-point gather: cummax of segment
    # openings
    first = jnp.concatenate([jnp.ones((1,), bool),
                             keys_s[1:] != keys_s[:-1]])
    seg_of_i = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota, 0))
    rank = iota - seg_of_i
    return dict(keys=keys_s, coords=coords_s, idx=idx_s,
                seg_start=seg_start, rank=rank)


def _gather_rows(tab, idx):
    """Per-sublane-row dynamic gather: out[s, l] = tab[s, idx[s, l]].

    Mosaic only lowers dynamic gathers with ``indices.shape ==
    value.shape`` (within one 128-lane row), so a TAB-entry table is
    fetched with a TAB/128-chunk shuffle+select cascade (lab-5: ~3 VPU
    ops per chunk per gathered element)."""
    nch = tab.shape[-1] // 128
    if nch == 1:
        return jnp.take_along_axis(tab, idx, axis=-1)
    c128 = jnp.asarray(128, idx.dtype)
    sub = jax.lax.rem(idx, c128)
    hi = jax.lax.div(idx, c128)
    out = None
    for c in range(nch):
        part = jnp.take_along_axis(tab[:, c * 128:(c + 1) * 128], sub,
                                   axis=-1)
        out = jnp.where(hi == c, part, 0 if out is None else out)
    return out


def _gather_kernel(tab_ref, gx_ref, gy_ref, gz_ref, valid_ref, *out_refs,
                   orders, blo, ext, box, nb, value, grad):
    """One (channel, 8-box block) program: fused value + 3 spatial
    derivatives for 8 rows x 128 slots, all taps fetched from the
    block's (8, TAB) table rows."""
    k = pl.program_id(1)
    tab = tab_ref[0]                      # (8, TAB)
    shape = (8, 128)
    # box ids of the 8 rows -> per-axis core origins (sublane column)
    b = k * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cz = b % nb[2]
    cy = (b // nb[2]) % nb[1]
    cx = b // (nb[1] * nb[2])
    base0 = [cx * box[0], cy * box[1], cz * box[2]]

    gs = [gx_ref[0], gy_ref[0], gz_ref[0]]
    wdtype = gs[0].dtype
    taps_w, taps_g, locs = [], [], []
    for d in range(3):
        n0, t = node_origin(gs[d], orders[d])
        w, gr, _ = bspline_taps(t, orders[d], grad=grad)
        taps_w.append(w)
        taps_g.append(gr)
        # local tap-0 coordinate inside the padded box
        locs.append(n0 - (base0[d] - blo[d]))

    base = (locs[0] * ext[1] + locs[1]) * ext[2] + locs[2]
    # invalid slots carry garbage coords: clamp the gather index into
    # range (their contribution is zeroed by the valid mask)
    span = (orders[0] * ext[1] + orders[1]) * ext[2] + orders[2]
    base = jnp.clip(base, 0, tab.shape[-1] - 1 - span)

    valid = valid_ref[0].astype(wdtype)
    acc_v = jnp.zeros(shape, wdtype) if value else None
    acc_d = [jnp.zeros(shape, wdtype) for _ in range(3)] if grad else None
    for jx in range(orders[0] + 1):
        for jy in range(orders[1] + 1):
            wxy = taps_w[0][jx] * taps_w[1][jy]
            if grad:
                gxy = taps_g[0][jx] * taps_w[1][jy]
                hxy = taps_w[0][jx] * taps_g[1][jy]
            off = (jx * ext[1] + jy) * ext[2]
            for jz in range(orders[2] + 1):
                idx = base + (off + jz)
                val = _gather_rows(tab, idx)
                if value:
                    acc_v = acc_v + (wxy * taps_w[2][jz]) * val
                if grad:
                    acc_d[0] = acc_d[0] + (gxy * taps_w[2][jz]) * val
                    acc_d[1] = acc_d[1] + (hxy * taps_w[2][jz]) * val
                    acc_d[2] = acc_d[2] + (wxy * taps_g[2][jz]) * val
    outs = []
    if value:
        outs.append(acc_v * valid)
    if grad:
        outs.extend(a * valid for a in acc_d)
    for ref, acc in zip(out_refs, outs):
        ref[0, 0] = acc


def _scatter_impl(inp, grid, orders, bounds, extrapolate, *,
                  value=True, grad=False, box=None, interpret=False):
    """Unbatched scattered pull / fused gradient.

    inp: (C, *ishape); grid: (P, 3).  Returns (val, g):
    (C, P) / (C, P, 3) per the flags (None when not requested)."""
    from . import ndkernels as nd

    D = grid.shape[-1]
    assert D == 3, "scattered native tier is 3-D"
    box = tuple(box or auto_box(inp.shape[1:], grid.shape[0]))
    C = inp.shape[0]
    P = grid.shape[0]
    ishape = tuple(inp.shape[1:])
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

    tables, nb, blo, ext, tab = _build_tables(inp, ishape, orders,
                                              bounds, box, wdtype)
    sch = _schedule(grid, ishape, box, nb, wdtype)
    NBtot = math.prod(nb)
    NB8 = tables.shape[1]
    NBLK = NB8 // 8

    # slot layout (NB8, CAP): row b serves sorted points
    # seg_start[b] .. seg_start[b]+CAP-1
    seg = jnp.pad(sch["seg_start"][:NBtot], (0, NB8 - NBtot),
                  constant_values=P)
    counts = jnp.pad(sch["seg_start"][1:NBtot + 1] - sch["seg_start"][:NBtot],
                     (0, NB8 - NBtot))
    i_slot = seg[:, None] + jnp.arange(CAP, dtype=jnp.int32)[None]
    valid = jnp.arange(CAP, dtype=jnp.int32)[None] < \
        jnp.minimum(counts, CAP)[:, None]
    i_slot = jnp.clip(i_slot, 0, max(P - 1, 0))
    coords_slot = jnp.take(sch["coords"], i_slot.reshape(-1), axis=0)
    coords_slot = coords_slot.reshape(NB8, CAP, D)

    def blk(x):
        return x.reshape(NBLK, 8, CAP)

    gxs = blk(coords_slot[..., 0])
    gys = blk(coords_slot[..., 1])
    gzs = blk(coords_slot[..., 2])
    vals = blk(valid.astype(wdtype))

    n_out = (1 if value else 0) + (3 if grad else 0)
    kernel = partial(_gather_kernel, orders=tuple(orders), blo=blo,
                     ext=ext, box=box, nb=nb, value=value, grad=grad)
    tspec = pl.BlockSpec((1, 8, tab), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 8, CAP), lambda c, k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, 8, CAP), lambda c, k: (c, k, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(C, NBLK),
        in_specs=[tspec, sspec, sspec, sspec, sspec],
        out_specs=[ospec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((C, NBLK, 8, CAP), wdtype)] * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 2),
        interpret=interpret,
    )(tables, gxs.astype(wdtype), gys.astype(wdtype), gzs.astype(wdtype),
      vals)

    # slot results -> sorted order -> original order
    keys = sch["keys"]
    rank = sch["rank"]
    elig_s = keys < NBtot
    fb_s = (~elig_s) | (rank >= CAP)
    slot_of_s = jnp.clip(keys, 0, NB8 - 1) * CAP + jnp.minimum(rank,
                                                               CAP - 1)
    idx_s = sch["idx"]

    def unsort(o_slot):
        flat = o_slot.reshape(C, NB8 * CAP)
        v_sorted = flat[:, slot_of_s] * (~fb_s).astype(wdtype)[None]
        out = jnp.zeros((C, P), wdtype)
        return out.at[:, idx_s].set(v_sorted)

    val_out = unsort(outs[0]) if value else None
    g_out = jnp.stack([unsort(outs[(1 if value else 0) + d])
                       for d in range(3)], axis=-1) if grad else None

    # exact fallback for ineligible / overflow points (rare): the
    # generic gather core, masked, under one cond so the common case
    # pays nothing
    fb_orig = jnp.zeros((P,), bool).at[idx_s].set(fb_s)
    any_fb = fb_orig.any()

    if value:
        def fb_run(_):
            v = nd.pull_core(inp, grid, tuple(orders), tuple(bounds),
                             extrapolate)
            return v.astype(wdtype) * fb_orig[None].astype(wdtype)

        val_out = val_out + jax.lax.cond(
            any_fb, fb_run, lambda _: jnp.zeros((C, P), wdtype), 0)
    if grad:
        def fb_rung(_):
            gv = nd.grad_core(inp, grid, tuple(orders), tuple(bounds),
                              extrapolate)
            return gv.astype(wdtype) * fb_orig[None, :, None].astype(wdtype)

        g_out = g_out + jax.lax.cond(
            any_fb, fb_rung, lambda _: jnp.zeros((C, P, 3), wdtype), 0)

    # extrapolation mask (the kernel computed eligible points
    # unconditionally; the fallback core already masks its own output)
    mask = inbounds_mask(grid, ishape, extrapolate, wdtype)
    if mask is not None:
        if value:
            val_out = val_out * mask[None]
        if grad:
            g_out = g_out * mask[None, :, None]
    if value:
        val_out = val_out.astype(out_dtype)
    if grad:
        g_out = g_out.astype(out_dtype)
    return val_out, g_out


def pull_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False):
    """(C, *ishape), (P, 3) -> (C, P).  Semantics: ndkernels.pull_core
    (reference interpol/nd.py:80-143)."""
    val, _ = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                           value=True, grad=False, box=box,
                           interpret=interpret)
    return val


def grad_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False):
    """(C, *ishape), (P, 3) -> (C, P, 3).  Semantics:
    ndkernels.grad_core (reference interpol/nd.py:216-288)."""
    _, g = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                         value=False, grad=True, box=box,
                         interpret=interpret)
    return g
