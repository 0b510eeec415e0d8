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
     is given ``CAP`` = 128 slots = one 128-lane row.  No slot
     expansion happens in XLA: the kernel fetches its own points.
  3. **Kernel** (Pallas): one program per (channel, 8-box block); the
     block's 8 table rows arrive as a VMEM ``(8, TAB)`` operand; the
     block's sorted coordinates arrive via one dynamic 128-aligned DMA
     per axis (the 8 boxes' segments are consecutive in sorted order)
     and are placed per row with a dynamic lane roll.  Taps are
     fetched with the per-sublane-row gather cascade — Mosaic only
     lowers dynamic gathers within one 128-lane row, so a TAB-entry
     table costs a TAB/128-chunk shuffle+select cascade per gathered
     element (lab-5 measurement).  Cox-de Boor tap weights are
     evaluated in-kernel; value and the three spatial derivatives
     share every gather (fused, like the dense warp kernel).
  4. **Exactness**: points outside the eligible region (outside the
     closed volume bounds), beyond a box's 128 slots, or in a block
     whose slot window exceeds the coordinate-DMA slack are reported
     unserved by the kernel's mask output and fall back to the generic
     XLA gather core under a single ``lax.cond`` — never silently
     dropped; the fallback costs nothing when no such point exists.
     The slot results return to user order with one shared gather plus
     one ``lax.sort`` (cheaper than a P-sized scatter on this part).

Semantics match ops/ndkernels.pull_core / grad_core exactly (reference
interpol/nd.py:80-143, 216-288).

**Push / count** (the splat adjoints) use the same box decomposition
with a *densifying* kernel: Mosaic has no scatter primitive, so each
box's splats are accumulated as a dense ``(Ex, Ey*Ez)`` patch built by
ONE MXU matmul per box — ``A (Ex, 128 slots)`` carries per-slot x-axis
weights times values (placed with static-iota one-hot compares) and
``B (128 slots, Ey*Ez)`` the per-slot separable y/z weight outer
products; ``A @ B`` sums over slots on the MXU, race-free by
construction.  The patches are folded back into the volume by the
exact transpose of the box relayout (static strided overlap-adds) and
:func:`window._fold_pad_margins` (boundary adjoint).  Per-slot taps
arrive pre-evaluated from XLA in both lane-major (for ``A``) and
sublane-major (for ``B``) layouts, so the kernel needs no in-kernel
transposes or dynamic DMA.  Overflow / ineligible points take the
exact XLA scatter-core fallback, like the pull family.
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
from .window import _pad_folded, _fold_pad_margins

__all__ = ["pull_scattered", "grad_scattered", "push_scattered",
           "count_scattered", "box_geometry", "precompute_tables",
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


# 2-D clouds ride the 3-D kernels via a degenerate trailing axis (see
# _lift_2d); their box cores are picked from a 2-D ladder.
_BOX_LADDER_2D = [(64, 128), (64, 64), (32, 64), (32, 32), (16, 32),
                  (16, 16), (8, 16), (8, 8)]


def auto_box(ishape: Tuple[int, ...], P: int) -> Tuple[int, ...]:
    """Pick a box core so the expected per-box point count stays under
    ~_TARGET_PER_BOX at this cloud's density (dense grids land on tiny
    cores where TAB — and with it the per-tap gather-cascade cost — is
    smallest)."""
    if len(ishape) >= 3 and ishape[-1] == 1:
        # degenerate trailing axis (the 2-D lift): box it with core 1
        return auto_box(ishape[:-1], P) + (1,)
    rho = P / max(1, math.prod(ishape))
    ladder = _BOX_LADDER if len(ishape) >= 3 else _BOX_LADDER_2D
    for b in ladder:
        if rho * math.prod(b) <= _TARGET_PER_BOX:
            return b
    return ladder[-1]
# Below this many points the XLA gather core wins (the scattered tier
# pays ~fixed sort + table-build cost); documented density threshold
# for the auto backend dispatch.
MIN_POINTS = 32768
CAP = 128   # slots per box = one 128-lane row


def box_geometry(orders: Tuple[int, ...], box: Tuple[int, ...],
                 ishape: Optional[Tuple[int, ...]] = None):
    """Per-axis (margin_lo, extent) of the padded box and the padded
    flat table length TAB.

    A point g in the core ``[c*B, (c+1)*B)`` has node origin
    ``n0 = floor(g - (order-1)/2)`` (order 0: round) with taps
    ``n0..n0+order``; over the core the taps span exactly
    ``[c*B - order//2, c*B + B - 1 + order//2 + 1]`` — extent
    ``B + 2*(order//2) + 1`` (= B+order for odd, B+order+1 for even
    orders).

    Degenerate axes (``ishape[d] == 1`` with order 0 and box 1 — the
    2-D lift's dummy axis) get extent 1, not 2: an ELIGIBLE point has
    coordinate exactly 0 there (the eligibility band is ``[0, n-1] =
    [0, 0]``), so the order-0 round can never land on 1, and the axis
    must not double TAB (the gather-cascade cost is linear in TAB).
    Pass ``ishape`` to enable this rule; without it the general
    (conservative) extent is used and tables/kernel would disagree —
    all in-module callers pass it."""
    blo = tuple(o // 2 for o in orders)
    ns = ishape or (None,) * len(box)
    ext = tuple(1 if (n == 1 and o == 0 and b == 1)
                else b + 2 * (o // 2) + 1
                for b, o, n in zip(box, orders, ns))
    tab_raw = math.prod(ext)
    tab = -(-tab_raw // 128) * 128
    return blo, ext, tab


def _build_tables(inp: jnp.ndarray, ishape, orders, bounds, box, wdtype):
    """(C, *ishape) -> (C, NB8, TAB) boundary-folded overlapping boxes.

    Built with static strided slices + stacks (no gather): for each
    in-box offset j the strided view ``vpad[j::B]`` lists that offset's
    value in every box."""
    D = len(ishape)
    blo, ext, tab = box_geometry(orders, box, ishape)
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


def _schedule(grid: jnp.ndarray, ishape, box, nb, wdtype, extra=()):
    """Sort points by box id; return per-sorted-point and per-box data.

    Returns dict with: keys_sorted (P,), coords_sorted (P, D),
    idx_sorted (P,), seg_start (NBtot+1,), rank (P,), eligible (P,).
    ``extra``: additional (P,)-shaped payload arrays to carry through
    the sort (push values); returned under ``extra`` in sorted order.
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
        (keys,) + tuple(g[..., d] for d in range(D)) + (iota,)
        + tuple(extra), num_keys=1)
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
                seg_start=seg_start, rank=rank,
                extra=tuple(sorted_ops[2 + D:]))


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


# Lanes of sorted-point data DMA'd per 8-box block: the block's valid
# slots live at sorted positions seg[8k] .. seg[8k+7]+CAP-1; a block
# whose span exceeds this window (requires ~2.9k overflow points in 7
# boxes) is routed to the exact fallback wholesale.
_SLK = 24   # window rows of 128 lanes -> 3072 lanes, 12 KB per coord


def _gather_kernel(tab_ref, cx_hbm, cy_hbm, cz_hbm, seg_ref, ok_ref,
                   *refs, orders, blo, ext, box, nb, value, grad):
    """One (channel, 8-box block) program: fused value + 3 spatial
    derivatives for 8 rows x 128 slots.

    The block's sorted point coordinates are fetched with ONE dynamic
    128-aligned DMA per axis (the 8 boxes' segments are consecutive in
    sorted order); each row's 128 slots are extracted with a dynamic
    lane roll.  Taps are fetched from the block's (8, TAB) table rows
    via the per-sublane-row gather cascade.  An extra `served` output
    records which slots this kernel actually computed (0 for
    capacity/window overflow -> exact XLA fallback)."""
    n_out = (1 if value else 0) + (3 if grad else 0)
    out_refs = refs[:n_out + 1]           # + served mask
    bufs = refs[n_out + 1:]               # 3 scratch windows + 3 sems
    scr, sems = bufs[:3], bufs[3:6]
    k = pl.program_id(1)
    tab = tab_ref[0]                      # (8, TAB)
    shape = (8, 128)
    TOT = _SLK * 128

    s0 = seg_ref[8 * k]
    a0 = (s0 // 128) * 128
    cps = []
    for i, (hbm, s) in enumerate(zip((cx_hbm, cy_hbm, cz_hbm), scr)):
        cp = pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(a0, 128), TOT)], s, sems[i])
        cps.append(cp)
        cp.start()

    # box ids of the 8 rows -> per-axis core origins (sublane column)
    b = k * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cz = b % nb[2]
    cy = (b // nb[2]) % nb[1]
    cx = b // (nb[1] * nb[2])
    base0 = [cx * box[0], cy * box[1], cz * box[2]]

    for cp in cps:
        cp.wait()
    ok = ok_ref[k]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rows = [[], [], []]
    cnts = []
    for r in range(8):
        sr = seg_ref[8 * k + r]
        cnt = jnp.minimum(seg_ref[8 * k + r + 1] - sr, CAP) * ok
        cnts.append(cnt)
        off = sr - a0
        for d in range(3):
            flat = scr[d][...]
            rows[d].append(pltpu.roll(flat, TOT - off, 1)[:, :128])
    gs = [jnp.concatenate(rows[d], axis=0) for d in range(3)]
    valid_b = lane < jnp.concatenate(
        [jnp.full((1, 1), c, jnp.int32) for c in cnts], axis=0)
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

    valid = valid_b.astype(wdtype)
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
    outs.append(valid)                    # served mask
    for ref, acc in zip(out_refs, outs):
        ref[0, 0] = acc


def precompute_tables(inp, orders, bounds, box):
    """Build the (C, NB8, TAB) box-table array once for a volume that
    will be sampled repeatedly (iterative registration, landmark
    tracking): the build is an XLA relayout measured at ~12 ms for
    256^3 / box (8,8,16) — about half the one-shot op (and shown by
    scripts/tpu_kernel_lab6.py to be transpose-bound, not improvable in
    XLA).  Pass the result as ``pre=`` to pull_scattered /
    grad_scattered together with the SAME box/orders/bounds.  The
    build is differentiable (pure slicing), so gradients w.r.t. the
    volume flow through a cached table like through the volume.

    2-D volumes (C, H, W) are lifted to the degenerate-axis 3-D layout
    (pass the 2-D ``box``); the resulting tables match 2-D
    pull/grad_scattered calls with the same box."""
    if inp.ndim == 3:            # (C, H, W): lift like the public ops
        inp = inp[..., None]
        orders = tuple(orders) + (0,)
        bounds = tuple(bounds) + (3,)
        box = tuple(box) + (1,)
    wdtype = jnp.promote_types(
        jnp.result_type(inp.dtype, jnp.float32), jnp.float32)
    tables, *_ = _build_tables(inp, tuple(inp.shape[1:]), orders,
                               bounds, tuple(box), wdtype)
    return tables


def _scatter_impl(inp, grid, orders, bounds, extrapolate, *,
                  value=True, grad=False, box=None, interpret=False,
                  pre=None):
    """Unbatched scattered pull / fused gradient.

    inp: (C, *ishape); grid: (P, 3).  Returns (val, g):
    (C, P) / (C, P, 3) per the flags (None when not requested).
    ``pre``: tables from :func:`precompute_tables` (requires ``box``)."""
    from . import ndkernels as nd

    D = grid.shape[-1]
    assert D == 3, "scattered native tier is 3-D"
    if pre is not None and box is None:
        raise ValueError("pre= (precomputed tables) requires the box "
                         "they were built with")
    box = tuple(box or auto_box(inp.shape[1:], grid.shape[0]))
    C = inp.shape[0]
    P = grid.shape[0]
    ishape = tuple(inp.shape[1:])
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)

    if pre is None:
        tables, nb, blo, ext, tab = _build_tables(inp, ishape, orders,
                                                  bounds, box, wdtype)
    else:
        blo, ext, tab = box_geometry(orders, box, ishape)
        nb = tuple(-(-n // b) for n, b in zip(ishape, box))
        NB8 = -(-math.prod(nb) // 8) * 8
        if tuple(pre.shape) != (C, NB8, tab):
            raise ValueError(
                f"precomputed tables shape {tuple(pre.shape)} does not "
                f"match (C, NB8, TAB)=({C}, {NB8}, {tab}) for this "
                f"volume/box/orders")
        tables = pre.astype(wdtype)
    sch = _schedule(grid, ishape, box, nb, wdtype)
    NBtot = math.prod(nb)
    NB8 = tables.shape[1]
    NBLK = NB8 // 8

    # per-box sorted-segment boundaries (SMEM): row b serves sorted
    # points seg[b] .. seg[b]+CAP-1
    seg = jnp.concatenate([
        sch["seg_start"][:NBtot],
        jnp.full((NB8 + 1 - NBtot,), P, jnp.int32)]).astype(jnp.int32)
    # a block is kernel-served only if all its rows' slot windows fit
    # the _SLK-row DMA window (fails only under extreme clustering)
    s0 = seg[0:NB8:8]
    s7 = seg[7:NB8:8]
    blk_ok = ((s7 + CAP) <= ((s0 // 128) * 128 + _SLK * 128)) \
        .astype(jnp.int32)

    # sorted coords as (1, R*128) lane-major rows; pad so the last
    # block's DMA window stays in bounds
    R = -(-P // 128) + _SLK
    def lanes(x):
        return jnp.pad(x, (0, R * 128 - P)).reshape(1, R * 128) \
            .astype(wdtype)
    cxs = lanes(sch["coords"][:, 0])
    cys = lanes(sch["coords"][:, 1])
    czs = lanes(sch["coords"][:, 2])

    n_out = (1 if value else 0) + (3 if grad else 0)
    kernel = partial(_gather_kernel, orders=tuple(orders), blo=blo,
                     ext=ext, box=box, nb=nb, value=value, grad=grad)
    tspec = pl.BlockSpec((1, 8, tab), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pl.ANY)
    mspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((1, 1, 8, CAP), lambda c, k: (c, k, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(C, NBLK),
        in_specs=[tspec, hspec, hspec, hspec, mspec, mspec],
        out_specs=[ospec] * (n_out + 1),
        out_shape=[jax.ShapeDtypeStruct((C, NBLK, 8, CAP), wdtype)]
        * (n_out + 1),
        scratch_shapes=[pltpu.VMEM((1, _SLK * 128), wdtype)] * 3
        + [pltpu.SemaphoreType.DMA] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 2),
        interpret=interpret,
    )(tables, cxs, cys, czs, seg, blk_ok)

    # slot results -> sorted order (one shared gather incl. the served
    # mask) -> original order (one lax.sort; cheaper than a P-scatter)
    keys = sch["keys"]
    rank = sch["rank"]
    elig_s = keys < NBtot
    slot_of_s = jnp.clip(keys, 0, NB8 - 1) * CAP + jnp.minimum(rank,
                                                               CAP - 1)
    idx_s = sch["idx"]

    flat = jnp.concatenate(
        [o.reshape(C, NB8 * CAP) for o in outs[:n_out]]
        + [outs[n_out].reshape(C, NB8 * CAP)[:1]], axis=0)
    picked = flat[:, slot_of_s]             # (C*n_out + 1, P)
    served = picked[-1] > 0.5
    fb_s = (~elig_s) | (rank >= CAP) | (~served)
    picked = picked[:-1] * (~fb_s).astype(wdtype)[None]

    unsorted = jax.lax.sort(
        (idx_s,) + tuple(picked[i] for i in range(C * n_out))
        + (fb_s.astype(jnp.int32),), num_keys=1)
    cols = unsorted[1:1 + C * n_out]
    fb_orig = unsorted[-1] > 0

    def pick(j):
        # output j (over value/grad planes), channels stacked; flat row
        # layout is [out0_c0..out0_cLast, out1_c0, ...]
        return jnp.stack([cols[j * C + c] for c in range(C)], 0)

    val_out = pick(0) if value else None
    g_out = jnp.stack([pick((1 if value else 0) + d)
                       for d in range(3)], axis=-1) if grad else None

    # exact fallback for ineligible / overflow / unserved points
    # (rare): the generic gather core, masked, under one cond so the
    # common case pays nothing
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


# ------------------------------------------------------------ AD rules
# The public ops carry custom VJPs mirroring ops/pushpull.py's
# composition (pull: d_inp = push, d_grid = grad . ct; grad: d_inp =
# pushgrad, d_grid = hess . ct) so jax.grad never differentiates
# through the pallas_call.  ``pre`` rides as a stop_gradient'd operand:
# tables are a deterministic linear function of ``inp``, so routing the
# WHOLE input-gradient through d_inp is exact and the d_pre path is
# dead by construction.

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pull_sc(inp, grid, pre, orders, bounds, extrapolate, box,
             interpret):
    val, _ = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                           value=True, grad=False, box=box,
                           interpret=interpret, pre=pre)
    return val


def _pull_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    return _pull_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                    interpret), (inp, grid, pre)


def _pull_sc_bwd(orders, bounds, extrapolate, box, interpret, res, ct):
    inp, grid, pre = res
    ishape = tuple(inp.shape[1:])
    # d_inp on the NATIVE splat tier (the XLA scatter core is ~7x
    # slower at 1M points); _push_sc evaluates the primal only here —
    # no AD re-entry (and its own custom_vjp covers higher orders)
    d_inp = _push_sc(ct, grid, ishape, orders, bounds, extrapolate,
                     box, interpret)
    g = _grad_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret)
    d_grid = (g * ct[..., None]).sum(axis=0)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_pull_sc.defvjp(_pull_sc_fwd, _pull_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _grad_sc(inp, grid, pre, orders, bounds, extrapolate, box,
             interpret):
    _, g = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                         value=False, grad=True, box=box,
                         interpret=interpret, pre=pre)
    return g


def _grad_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    return _grad_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                    interpret), (inp, grid, pre)


def _grad_sc_bwd(orders, bounds, extrapolate, box, interpret, res, ct):
    from . import ndkernels as nd
    inp, grid, pre = res
    ishape = tuple(inp.shape[1:])
    d_inp = nd.pushgrad_core(ct, grid, ishape, orders, bounds,
                             extrapolate)
    h = nd.hess_core(inp, grid, orders, bounds, extrapolate)
    d_grid = (h * ct[..., None]).sum(axis=(0, -2))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_grad_sc.defvjp(_grad_sc_fwd, _grad_sc_bwd)


def _resolve(inp, grid, orders, bounds, box, pre):
    if pre is not None and box is None:
        raise ValueError("pre= (precomputed tables) requires the box "
                         "they were built with")
    box = tuple(box or auto_box(inp.shape[1:], grid.shape[0]))
    if pre is None:
        pre = precompute_tables(inp, tuple(orders), tuple(bounds), box)
    return box, jax.lax.stop_gradient(pre)


def _lift_2d(inp, grid, orders, bounds, box):
    """2-D cloud -> 3-D with a degenerate trailing axis.

    The dummy axis carries order 0, box 1, coordinate exactly 0 and a
    size-1 volume axis, so :func:`box_geometry` gives it extent 1 — the
    lift adds ZERO table size or gather-cascade cost (cf. the window
    tier's 2-D lift, ops/window.py).  Applied OUTSIDE the custom-vjp
    ops: the lift is plain reshape/concat, so JAX transposes it
    automatically and every AD order keeps working."""
    inp3 = inp[..., None] if inp is not None else None
    g3 = jnp.concatenate([grid, jnp.zeros_like(grid[..., :1])], -1)
    orders3 = tuple(orders) + (0,)
    bounds3 = tuple(bounds) + (3,)          # dct2: identity fold at n=1
    box3 = None if box is None else tuple(box) + (1,)
    return inp3, g3, orders3, bounds3, box3


def pull_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False, pre=None):
    """(C, *ishape), (P, D) -> (C, P), D in (2, 3).  Semantics:
    ndkernels.pull_core (reference interpol/nd.py:80-143).  ``pre``:
    precomputed tables (see :func:`precompute_tables`)."""
    if grid.shape[-1] == 2:
        inp, grid, orders, bounds, box = _lift_2d(inp, grid, orders,
                                                  bounds, box)
    box, pre = _resolve(inp, grid, orders, bounds, box, pre)
    return _pull_sc(inp, grid, pre, tuple(orders), tuple(bounds),
                    extrapolate, box, interpret)


def grad_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False, pre=None):
    """(C, *ishape), (P, D) -> (C, P, D), D in (2, 3).  Semantics:
    ndkernels.grad_core (reference interpol/nd.py:216-288)."""
    D = grid.shape[-1]
    if D == 2:
        inp, grid, orders, bounds, box = _lift_2d(inp, grid, orders,
                                                  bounds, box)
    box, pre = _resolve(inp, grid, orders, bounds, box, pre)
    g = _grad_sc(inp, grid, pre, tuple(orders), tuple(bounds),
                 extrapolate, box, interpret)
    return g[..., :2] if D == 2 else g


# ----------------------------------------------------------- push/count
# Splat adjoints on the native tier: box-densifying MXU kernel (module
# docstring).  Semantics: ndkernels.push_core / count_core (reference
# interpol/nd.py:146-213, pushpull.py:106-142).

def _push_kernel(lm_ref, sm_ref, vv_ref, out_ref, *, orders, ext,
                 expad, eyzpad):
    """One (channel, 8-box block) program: densify 8 boxes' splats.

    lm (8, 1+ox+1, 128): lane-major per-slot x data [loc_x, wx taps];
    sm (8, 128, NCOL): sublane-major per-slot y/z data
        [loc_y, loc_z, wy taps, wz taps];
    vv (1, 8, 1, 128): per-slot values (pre-masked by slot validity;
        the extra unit dim keeps the row index off the tiled dims so
        the loop's dynamic load is a free leading-dim offset);
    out (1, 8, expad, eyzpad): dense per-box patches, layout
        [X, Y*Ez + Z].

    Per box: A[X, s] = sum_j wx[j,s]·[X == lx[s]+j]·v[s]  (one-hot
    placement against a static iota),  B[s, YZ] = sum_{jy,jz}
    wy[jy,s]·wz[jz,s]·[YZ == (ly[s]+jy)·Ez + lz[s]+jz],  and the slot
    sum is ONE MXU matmul A @ B.  Invalid slots carry v = 0, zeroing
    their A column and with it any garbage in their B row.  All
    integer-valued floats involved are exact in f32 (< 2^24).

    The 8 rows run in a ``fori_loop`` (dynamic indices land only on
    non-tiled leading dims; value-level lane slices are static): a
    Python unroll left ~300 independent (128, eyzpad) intermediates
    live and Mosaic stack-allocated them all — 17.6 MB of scoped VMEM,
    over the 16 MB limit (observed r3).  The sequential loop bounds the
    live set to one row's accumulation chain."""
    o0, o1, o2 = orders
    Ex, Ey, Ez = ext
    wdtype = out_ref.dtype
    # Mosaic lowers integer iota only; the compares run in float
    # (all index values are exact small ints)
    Xi = jax.lax.broadcasted_iota(jnp.int32, (expad, 128), 0
                                  ).astype(wdtype)
    YZi = jax.lax.broadcasted_iota(jnp.int32, (128, eyzpad), 1
                                   ).astype(wdtype)

    def row(r, carry):
        lmr = lm_ref[r]                            # (NPX, 128)
        smr = sm_ref[r]                            # (128, NCOL)
        vr = vv_ref[0, r]                          # (1, 128)
        lx = lmr[0:1]                              # (1, 128)
        A = jnp.zeros((expad, 128), wdtype)
        for j in range(o0 + 1):
            A = A + jnp.where(Xi == lx + j, lmr[1 + j:2 + j] * vr,
                              jnp.zeros((), wdtype))
        ly = smr[:, 0:1]                           # (128, 1)
        lz = smr[:, 1:2]
        B = jnp.zeros((128, eyzpad), wdtype)
        for jy in range(o1 + 1):
            wy = smr[:, 2 + jy:3 + jy]
            iy = (ly + jy) * Ez
            for jz in range(o2 + 1):
                wz = smr[:, 3 + o1 + jz:4 + o1 + jz]
                B = B + jnp.where(YZi == iy + (lz + jz), wy * wz,
                                  jnp.zeros((), wdtype))
        # HIGHEST: the MXU's default f32 precision is a single bf16
        # pass (~3e-3 relative error, observed on-chip r3); the splat
        # contract is <= 1e-5 vs the scatter core
        out_ref[0, r] = jnp.dot(A, B, preferred_element_type=wdtype,
                                precision=jax.lax.Precision.HIGHEST)
        return carry

    jax.lax.fori_loop(0, 8, row, 0)


def _combine_axis(x, nb_d, b_d, e_d):
    """Adjoint of the box build's strided-slice stacking along the last
    two axes: (..., NB, E) -> (..., NB*b + e - b) overlap-add."""
    Pd = nb_d * b_d + e_d - b_d
    out = jnp.zeros(x.shape[:-2] + (Pd,), x.dtype)
    for j in range(e_d):
        out = out.at[..., j:j + nb_d * b_d:b_d].add(x[..., j])
    return out


def _push_sc_impl(vals, grid, oshape, orders, bounds, extrapolate,
                  box, interpret):
    """Unbatched scattered splat: (C, P), (P, 3) -> (C, *oshape)."""
    from . import ndkernels as nd

    D = grid.shape[-1]
    assert D == 3, "scattered native tier is 3-D"
    C, P = vals.shape
    oshape = tuple(oshape)
    out_dtype = jnp.result_type(vals.dtype, grid.dtype)
    wdtype = jnp.promote_types(out_dtype, jnp.float32)
    blo, ext, _ = box_geometry(orders, box, oshape)
    nb = tuple(-(-n // b) for n, b in zip(oshape, box))
    NBtot = math.prod(nb)
    NB8 = -(-NBtot // 8) * 8
    NBLK = NB8 // 8
    Ex, Ey, Ez = ext
    expad = -(-Ex // 8) * 8
    eyz = Ey * Ez
    eyzpad = -(-eyz // 128) * 128

    sch = _schedule(grid, oshape, box, nb, wdtype,
                    extra=tuple(vals[c].astype(wdtype)
                                for c in range(C)))

    # slot expansion in XLA (the kernel is pure compute): slot (b, l)
    # holds sorted point seg[b] + l
    sl = sch["seg_start"].astype(jnp.int32)
    s0 = jnp.pad(sl[:NBtot], (0, NB8 - NBtot), constant_values=P)
    s1 = jnp.pad(sl[1:NBtot + 1], (0, NB8 - NBtot), constant_values=P)
    lane = jnp.arange(CAP, dtype=jnp.int32)
    pos_raw = s0[:, None] + lane[None]
    pos = jnp.clip(pos_raw, 0, max(P - 1, 0))            # (NB8, CAP)
    valid = pos_raw < s1[:, None]                        # (NB8, CAP)
    coords_slot = sch["coords"][pos]                     # (NB8, CAP, 3)
    vmask = valid.astype(wdtype)
    vv = jnp.stack([e[pos] for e in sch["extra"]]) * vmask[None]
    vv = vv[:, :, None, :]                 # (C, NB8, 1, CAP): see kernel

    bidx = jnp.arange(NB8, dtype=jnp.int32)
    corig = [(bidx // (nb[1] * nb[2])) * box[0],
             ((bidx // nb[2]) % nb[1]) * box[1],
             (bidx % nb[2]) * box[2]]
    locs, taps = [], []
    for d in range(3):
        n0, t = node_origin(coords_slot[..., d], orders[d])
        w, _, _ = bspline_taps(t, orders[d])
        loc = n0 - (corig[d][:, None] - blo[d])
        # clamp garbage (invalid-slot) locs so the one-hot index stays
        # finite/exact in f32; their value is already zeroed
        locs.append(jnp.clip(loc, 0, ext[d] - 1).astype(wdtype))
        taps.append([wj.astype(wdtype) for wj in w])

    lm = jnp.stack([locs[0]] + taps[0], axis=1)          # (NB8, 2+o0, CAP)
    sm = jnp.stack([locs[1], locs[2]] + taps[1] + taps[2],
                   axis=-1)                              # (NB8, CAP, NCOL)

    npx = lm.shape[1]
    ncol = sm.shape[-1]
    kernel = partial(_push_kernel, orders=tuple(orders), ext=ext,
                     expad=expad, eyzpad=eyzpad)
    out_k = pl.pallas_call(
        kernel,
        grid=(C, NBLK),
        in_specs=[
            pl.BlockSpec((8, npx, CAP), lambda c, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CAP, ncol), lambda c, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 1, CAP), lambda c, k: (c, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, expad, eyzpad),
                               lambda c, k: (c, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, NB8, expad, eyzpad), wdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 2),
        interpret=interpret,
    )(lm, sm, vv)

    # inverse box relayout: patches -> padded volume (overlap-add), then
    # fold the pad margins back through the boundaries
    patches = out_k[:, :NBtot, :Ex, :eyz].reshape(
        (C,) + nb + (Ex, Ey, Ez))
    patches = patches.transpose(0, 1, 4, 2, 5, 3, 6)
    x = _combine_axis(patches, nb[2], box[2], ext[2])
    x = jnp.moveaxis(x, 5, 3)              # (C, NBx, Ex, Pz, NBy, Ey)
    x = _combine_axis(x, nb[1], box[1], ext[1])
    x = x.transpose(0, 3, 4, 1, 2)         # (C, Pz, Py, NBx, Ex)
    x = _combine_axis(x, nb[0], box[0], ext[0])
    x = x.transpose(0, 3, 2, 1)            # (C, Px, Py, Pz)
    lo = list(blo)
    hi = [nbd * bd - n + e - bd - bl
          for nbd, bd, n, e, bl in zip(nb, box, oshape, ext, blo)]
    vol = _fold_pad_margins(x, oshape, bounds, lo, hi, wdtype)

    # exact fallback for ineligible / capacity-overflow points: the XLA
    # scatter core, under one cond so the common case pays nothing
    served_s = (sch["keys"] < NBtot) & (sch["rank"] < CAP)
    unsorted = jax.lax.sort(
        (sch["idx"], (~served_s).astype(jnp.int32)), num_keys=1)
    fb_orig = unsorted[1] > 0
    any_fb = fb_orig.any()

    def fb_run(_):
        return nd.push_core(
            vals.astype(wdtype) * fb_orig[None].astype(wdtype),
            grid, oshape, tuple(orders), tuple(bounds),
            extrapolate).astype(wdtype)

    vol = vol + jax.lax.cond(
        any_fb, fb_run, lambda _: jnp.zeros((C,) + oshape, wdtype), 0)
    return vol.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _push_sc(vals, grid, oshape, orders, bounds, extrapolate, box,
             interpret):
    return _push_sc_impl(vals, grid, oshape, orders, bounds,
                         extrapolate, box, interpret)


def _push_sc_fwd(vals, grid, oshape, orders, bounds, extrapolate, box,
                 interpret):
    return _push_sc(vals, grid, oshape, orders, bounds, extrapolate,
                    box, interpret), (vals, grid)


def _push_sc_bwd(oshape, orders, bounds, extrapolate, box, interpret,
                 res, ct):
    vals, grid = res
    # ct is resampled twice (pull for d_vals, grad for d_grid): build
    # its box tables ONCE and share (saves a full 12 ms relayout at
    # the 1M/256^3 operating point)
    pre = precompute_tables(ct, tuple(orders), tuple(bounds), box)
    d_vals = pull_scattered(ct, grid, orders, bounds, extrapolate,
                            box=box, interpret=interpret, pre=pre)
    g = grad_scattered(ct, grid, orders, bounds, extrapolate, box=box,
                       interpret=interpret, pre=pre)   # (C, P, 3)
    d_grid = (g * vals[..., None]).sum(axis=0)
    return (d_vals.astype(vals.dtype), d_grid.astype(grid.dtype))


_push_sc.defvjp(_push_sc_fwd, _push_sc_bwd)


def push_scattered(vals, grid, oshape, orders, bounds, extrapolate, *,
                   box=None, interpret=False):
    """(C, P), (P, D) -> (C, *oshape), D in (2, 3).  Semantics:
    ndkernels.push_core (reference interpol/nd.py:146-213)."""
    D = grid.shape[-1]
    if D == 2:
        _, grid, orders, bounds, box = _lift_2d(None, grid, orders,
                                                bounds, box)
        oshape = tuple(oshape) + (1,)
    box = tuple(box or auto_box(tuple(oshape), grid.shape[0]))
    out = _push_sc(vals, grid, tuple(oshape), tuple(orders),
                   tuple(bounds), extrapolate, box, interpret)
    return out[..., 0] if D == 2 else out


def count_scattered(grid, oshape, orders, bounds, extrapolate, *,
                    box=None, interpret=False):
    """(P, D) -> (1, *oshape): splatted unit weights (reference
    interpol/pushpull.py:106-142)."""
    ones = jnp.ones((1, grid.shape[0]), dtype=grid.dtype)
    return push_scattered(ones, grid, oshape, orders, bounds,
                          extrapolate, box=box, interpret=interpret)
