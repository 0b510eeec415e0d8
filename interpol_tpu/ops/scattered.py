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
  4. **Overflow round**: boxes holding more than the 128-slot capacity
     get ranks 128..255 served by ONE extra kernel pass with a static
     rank offset, launched under a ``lax.cond`` (the common case pays
     only the reduction) — clustered clouds degrade to a second ~10 ms
     pass, not a fallback storm.
  5. **Sorted-stream return** (round 4): the kernel writes every value
     plane directly at its points' *sorted-stream* positions — each
     box-row's 128 results are lane-rolled to offset ``seg[box] - a0``
     inside a 128-aligned window of a (C, n_out, ~P) stream that the
     sequential (``dimension_semantics="arbitrary"``) program chain
     read-modify-writes (zero-initialized via input/output aliasing;
     rows of one block cover disjoint segment ranges, so the adds
     never collide).  The stream then returns to user order with ONE
     ``lax.sort`` carrying all planes as payload.  This replaces the
     r3d epilogue (slot-code sort + per-point plane gather): lab-8
     measured the XLA gather at ~7 ms per 1M indices *regardless of
     index order* (the per-index cost is irreducible), while payload
     sorts are ~1.5 ms nearly independent of width — so the only way
     to win was to never gather at all.
  6. **Exactness**: points outside the eligible region (outside the
     closed volume bounds), beyond both rounds' 256 slots, or in a
     row whose slot window exceeds the coordinate-DMA slack are
     unserved and fall back to the generic XLA gather core under a
     single ``lax.cond`` — never silently dropped; the fallback costs
     nothing when no such point exists.  The per-point served mask is
     derived host-side with one associative scan (mirroring the
     kernel's per-row predicates exactly, as the splat family already
     does) — no gather, and uninitialized stream positions are
     excluded with ``where`` before the unsort.

Semantics match ops/ndkernels.pull_core / grad_core exactly (reference
interpol/nd.py:80-143, 216-288).

**Push / count / pushgrad / pushhess** (the splat adjoints) use the
same box decomposition with a *densifying* kernel: Mosaic has no
scatter primitive, so each box's splats are accumulated as a dense
``(Ex, Ey*Ez)`` patch built by ONE MXU matmul per box — ``A (Ex, 128
slots)`` carries per-slot x-axis weights times values (placed with
static-iota one-hot compares) and ``BT (Ey*Ez, 128 slots)`` the
per-slot separable y/z weight outer products (also one-hot built,
slots staying on LANES); the slot sum is ``dot_general(A, BT)``
contracting both lane axes on the MXU, race-free by construction.
Like the pull kernel, the splat kernel fetches its own sorted
coordinates and value rows (dynamic 128-aligned DMAs) and evaluates
taps in-register — no XLA-side slot expansion.  A static ``spec`` of
per-axis derivative multi-indices generalizes the same kernel to
pushgrad (3 value rows, first-derivative taps) and pushhess (9 rows),
all sharing the DMA/taps/patch.  The patches are folded back into the
volume by the exact transpose of the box relayout (static strided
overlap-adds) and :func:`window._fold_pad_margins` (boundary
adjoint).  Overflow / ineligible points take the exact XLA
scatter-core fallback, like the pull family.  ``hess_scattered``
(6 unique second-derivative planes, one fused gather pass) completes
the family: every scattered autodiff path of every order runs native
kernels, with custom VJPs terminating in XLA traces of the generic
core only at third order and beyond.
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
           "count_scattered", "pushgrad_scattered", "hess_scattered",
           "box_geometry", "precompute_tables", "auto_box",
           "auto_box_splat", "DEFAULT_BOX", "MIN_POINTS"]

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


# 1-D / 2-D clouds ride the 3-D kernels via degenerate trailing axes
# (see _lift_2d, applied once or twice); their box cores are picked
# from lower-dimensional ladders.
_BOX_LADDER_2D = [(64, 128), (64, 64), (32, 64), (32, 32), (16, 32),
                  (16, 16), (8, 16), (8, 8)]
_BOX_LADDER_1D = [(8192,), (4096,), (2048,), (1024,), (512,), (256,),
                  (128,), (64,)]


def auto_box(ishape: Tuple[int, ...], P: int) -> Tuple[int, ...]:
    """Pick a box core so the expected per-box point count stays under
    ~_TARGET_PER_BOX at this cloud's density (dense grids land on tiny
    cores where TAB — and with it the per-tap gather-cascade cost — is
    smallest)."""
    if len(ishape) >= 2 and ishape[-1] == 1:
        # degenerate trailing axis (the 1-D/2-D lift): core 1
        return auto_box(ishape[:-1], P) + (1,)
    rho = P / max(1, math.prod(ishape))
    ladder = {1: _BOX_LADDER_1D, 2: _BOX_LADDER_2D}.get(
        len(ishape), _BOX_LADDER)
    for b in ladder:
        if rho * math.prod(b) <= _TARGET_PER_BOX:
            return b
    return ladder[-1]
def auto_box_splat(oshape: Tuple[int, ...], P: int) -> Tuple[int, ...]:
    """Box core for the densifying splat kernel: same target density as
    :func:`auto_box`, but shaped x-heavy so the patch's padded y*z
    extent stays at one 128-lane row — the kernel's dominant cost (the
    BT one-hot build) is linear in that extent, while the x extent only
    widens the cheap A build and the MXU matmul's sublane count."""
    if len(oshape) >= 2 and oshape[-1] == 1:
        # degenerate trailing axis (the 1-D/2-D lift)
        return auto_box_splat(oshape[:-1], P) + (1,)
    vol = math.prod(auto_box(oshape, P))
    if len(oshape) == 1:
        return (min(max(1, vol), int(oshape[0])),)
    if len(oshape) == 2:
        by = min(8, vol)
        return (min(max(1, vol // by), int(oshape[0])), by)
    bz = min(8, vol)
    by = min(8, max(1, vol // bz))
    bx = max(1, vol // (by * bz))
    return (min(bx, int(oshape[0])), by, bz)


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
# slots live at sorted positions seg[8k] .. seg[8k+7]+CAP-1; a row
# whose slot window exceeds this window (requires ~2.9k overflow
# points in the rows before it) is routed to the exact fallback.
_SLK = 24   # window rows of 128 lanes -> 3072 lanes, 12 KB per coord


def _rows_pad(n_out):
    """Sublane padding for the (n_out, stream) output window: DMA slice
    extents on the sublane dim must be tile-aligned (the NV lesson in
    _splat_impl — observed on-chip r3)."""
    return n_out if n_out == 1 else (4 if n_out <= 4
                                     else -(-n_out // 8) * 8)


def _gather_kernel(tab_ref, cx_hbm, cy_hbm, cz_hbm, seg_ref, zin_ref,
                   out_hbm, *bufs, orders, blo, ext, box, nb, value,
                   grad, hess=False, roff=0):
    """One (channel, 8-box block) program: fused value + 3 spatial
    derivatives (+ optionally the 6 unique second-derivative planes,
    order xx,yy,zz,xy,xz,yz) for 8 rows x 128 slots.

    The block's sorted point coordinates are fetched with ONE dynamic
    128-aligned DMA per axis (the 8 boxes' segments are consecutive in
    sorted order); each row's 128 slots are extracted with a dynamic
    lane roll.  Taps are fetched from the block's (8, TAB) table rows
    via the per-sublane-row gather cascade.

    Results leave in SORTED-STREAM layout (module docstring #5): row
    r's 128 masked values are lane-rolled to offset ``seg[8k+r] - a0``
    and accumulated into the block's 128-aligned (rows_pad, _SLK*128)
    window of ``out_hbm`` (C, rows_pad, ~P) by read-modify-write.
    The grid MUST run with sequential (``arbitrary``) semantics:
    consecutive blocks' windows overlap, and block k+1's window fetch
    must observe block k's write-back.  ``zin_ref`` is the
    zero-initialized aliased input buffer (never read by the kernel;
    aliasing it to the output is what guarantees the stream starts at
    zero, since gaps between block windows are never written).  Rows
    of one block cover disjoint sorted-position ranges, so the rolled
    adds never collide; a row whose slot window exceeds the DMA
    window (``seg[8k+r] - a0 + CAP > _SLK*128``) contributes zero and
    its points are marked unserved by the host-side scan (exact XLA
    fallback).

    ``roff`` (static): within-box rank offset — the overflow round
    re-launches the same kernel with roff=CAP to serve ranks
    CAP..2*CAP-1 of boxes that overflowed their 128 slots, so clustered
    clouds degrade to ONE extra kernel pass (under a host-side cond)
    instead of an XLA gather-core fallback storm.  Within that round,
    a PER-BLOCK predicate (round 5) skips every block whose 8 boxes all
    fit their slots, so the second pass costs only the overflowing
    blocks — which is what lets the box ladder target a higher
    occupancy than the global-cond regime allowed."""
    n_out = (1 if value else 0) + (3 if grad else 0) \
        + (6 if hess else 0)
    rpad = _rows_pad(n_out)
    scr, sout = bufs[:3], bufs[3]
    sems, semo = bufs[4:7], bufs[7]
    c = pl.program_id(0)
    k = pl.program_id(1)

    def body():
        tab = tab_ref[0]                      # (8, TAB)
        shape = (8, 128)
        TOT = _SLK * 128

        s0 = seg_ref[8 * k] + roff
        a0 = (s0 // 128) * 128
        cps = []
        for i, (hbm, s) in enumerate(zip((cx_hbm, cy_hbm, cz_hbm), scr)):
            cp = pltpu.make_async_copy(
                hbm.at[:, pl.ds(pl.multiple_of(a0, 128), TOT)], s, sems[i])
            cps.append(cp)
            cp.start()
        # RMW fetch of this block's output window (previous blocks' writes
        # to the overlap are complete: sequential grid + in-body waits)
        cpo = pltpu.make_async_copy(
            out_hbm.at[pl.ds(c, 1), :, pl.ds(pl.multiple_of(a0, 128), TOT)],
            sout, semo)
        cpo.start()

        # box ids of the 8 rows -> per-axis core origins (sublane column)
        b = k * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        cz = b % nb[2]
        cy = (b // nb[2]) % nb[1]
        cx = b // (nb[1] * nb[2])
        base0 = [cx * box[0], cy * box[1], cz * box[2]]

        for cp in cps:
            cp.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rows = [[], [], []]
        cnts = []
        offs = []
        for r in range(8):
            sr = seg_ref[8 * k + r] + roff
            # per-ROW window check (round 4; was per-block): row r is
            # served only when its slot window fits the DMA window — the
            # host-side scan reproduces this predicate point-wise.
            ok = ((sr - a0) + CAP <= TOT).astype(jnp.int32)
            # negative counts (round-2 rows of non-overflowing boxes) give
            # an all-false valid mask via lane < cnt; no clamp needed
            cnt = jnp.minimum(seg_ref[8 * k + r + 1] - sr, CAP) * ok
            cnts.append(cnt)
            off = jnp.clip(sr - a0, 0, TOT - 128)
            offs.append(off)
            for d in range(3):
                flat = scr[d][...]
                rows[d].append(pltpu.roll(flat, TOT - off, 1)[:, :128])
        gs = [jnp.concatenate(rows[d], axis=0) for d in range(3)]
        valid_b = lane < jnp.concatenate(
            [jnp.full((1, 1), c, jnp.int32) for c in cnts], axis=0)
        wdtype = gs[0].dtype
        taps_w, taps_g, taps_h, locs = [], [], [], []
        for d in range(3):
            n0, t = node_origin(gs[d], orders[d])
            w, gr, hs = bspline_taps(t, orders[d], grad=grad or hess,
                                     hess=hess)
            taps_w.append(w)
            taps_g.append(gr)
            taps_h.append(hs)
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
        acc_h = [jnp.zeros(shape, wdtype) for _ in range(6)] if hess else None
        for jx in range(orders[0] + 1):
            for jy in range(orders[1] + 1):
                wxy = taps_w[0][jx] * taps_w[1][jy]
                if grad or hess:
                    gxy = taps_g[0][jx] * taps_w[1][jy]      # gx*wy
                    hxy = taps_w[0][jx] * taps_g[1][jy]      # wx*gy
                if hess:
                    a_xx = taps_h[0][jx] * taps_w[1][jy]     # hx*wy
                    a_yy = taps_w[0][jx] * taps_h[1][jy]     # wx*hy
                    a_xy = taps_g[0][jx] * taps_g[1][jy]     # gx*gy
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
                    if hess:
                        acc_h[0] = acc_h[0] + (a_xx * taps_w[2][jz]) * val
                        acc_h[1] = acc_h[1] + (a_yy * taps_w[2][jz]) * val
                        acc_h[2] = acc_h[2] + (wxy * taps_h[2][jz]) * val
                        acc_h[3] = acc_h[3] + (a_xy * taps_w[2][jz]) * val
                        acc_h[4] = acc_h[4] + (gxy * taps_g[2][jz]) * val
                        acc_h[5] = acc_h[5] + (hxy * taps_g[2][jz]) * val
        outs = []
        if value:
            outs.append(acc_v * valid)
        if grad:
            outs.extend(a * valid for a in acc_d)
        if hess:
            outs.extend(a * valid for a in acc_h)
        # merge into the sorted stream: row r's planes, stacked on
        # sublanes, rolled to lane offset seg[8k+r] - a0 and accumulated
        # into the RMW'd window (disjoint segment ranges per row; lanes
        # beyond cnt are zero, so overlapping 128-windows add zeros)
        cpo.wait()
        sv = sout[0]                          # (rows_pad, TOT)
        zlane = jnp.zeros((rpad, TOT - 128), wdtype)
        zrow = jnp.zeros((1, 128), wdtype)
        for r in range(8):
            # Mosaic rejects a lane-dim concat whose operands carry
            # different SUBLANE offsets ("result/input offset mismatch on
            # non-concat dimension", observed on-chip r4) — a bare
            # ``o[r:r+1]`` slice keeps implicit sublane offset r.  A STATIC
            # sublane roll (the cheap shuffle, ROUND_NOTES) re-bases row r
            # to offset 0 before stacking.
            rows_n = [pltpu.roll(o, (8 - r) % 8, 0)[:1] for o in outs]
            rows_n += [zrow] * (rpad - n_out)
            stk = rows_n[0] if len(rows_n) == 1 \
                else jnp.concatenate(rows_n, axis=0)     # (rpad, 128)
            w = jnp.concatenate([stk, zlane], axis=1)    # (rpad, TOT)
            sv = sv + pltpu.roll(w, offs[r], 1)
        sout[0] = sv
        cpw = pltpu.make_async_copy(
            sout,
            out_hbm.at[pl.ds(c, 1), :, pl.ds(pl.multiple_of(a0, 128), TOT)],
            semo)
        cpw.start()
        cpw.wait()

    if roff:
        # per-block skip (round 5): only a block holding an overflowing
        # box (count > CAP) does round-2 work, so one hot box no longer
        # costs a full second kernel pass over every block (the global
        # host-side cond still skips the launch when NOTHING overflows)
        over = seg_ref[8 * k + 1] - seg_ref[8 * k]
        for r in range(1, 8):
            over = jnp.maximum(over, seg_ref[8 * k + r + 1]
                               - seg_ref[8 * k + r])
        pl.when(over > CAP)(body)
    else:
        body()


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
                  value=True, grad=False, hess=False, box=None,
                  interpret=False, pre=None):
    """Unbatched scattered pull / fused gradient / fused Hessian.

    inp: (C, *ishape); grid: (P, 3).  Returns (val, g, h):
    (C, P) / (C, P, 3) / (C, P, 3, 3) per the flags (None when not
    requested; h is the symmetric spatial Hessian assembled from the
    kernel's 6 unique planes).
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
    # points seg[b] .. seg[b]+CAP-1.  seg[NBtot] is the
    # first-ineligible position (NOT P) so the last box's count never
    # swallows the trailing ineligible points; for the pull family the
    # phantom slots were merely unread, but the splat family would
    # accumulate them (see _splat_impl), and the smaller counts also
    # skip dead gather work here.
    seg = jnp.concatenate([
        sch["seg_start"][:NBtot + 1],
        jnp.broadcast_to(sch["seg_start"][NBtot],
                         (NB8 - NBtot,))]).astype(jnp.int32)
    # sorted coords as (1, R*128) lane-major rows; pad so the last
    # block's DMA window stays in bounds (one extra chunk for the
    # overflow round, whose DMA base sits up to CAP lanes later)
    R = -(-P // 128) + _SLK + 1
    def lanes(x):
        return jnp.pad(x, (0, R * 128 - P)).reshape(1, R * 128) \
            .astype(wdtype)
    cxs = lanes(sch["coords"][:, 0])
    cys = lanes(sch["coords"][:, 1])
    czs = lanes(sch["coords"][:, 2])

    n_out = (1 if value else 0) + (3 if grad else 0) \
        + (6 if hess else 0)
    rpad = _rows_pad(n_out)
    PW = R * 128
    tspec = pl.BlockSpec((1, 8, tab), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pl.ANY)
    mspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def run_round(roff):
        kernel = partial(_gather_kernel, orders=tuple(orders), blo=blo,
                         ext=ext, box=box, nb=nb, value=value,
                         grad=grad, hess=hess, roff=roff)
        # the zeroed aliased input initializes the sorted stream (gaps
        # between block windows are never written); the grid MUST be
        # sequential ("arbitrary"): consecutive blocks RMW overlapping
        # stream windows
        return pl.pallas_call(
            kernel,
            grid=(C, NBLK),
            in_specs=[tspec, hspec, hspec, hspec, mspec, hspec],
            out_specs=hspec,
            out_shape=jax.ShapeDtypeStruct((C, rpad, PW), wdtype),
            input_output_aliases={5: 0},
            scratch_shapes=[pltpu.VMEM((1, _SLK * 128), wdtype)] * 3
            + [pltpu.VMEM((1, rpad, _SLK * 128), wdtype)]
            + [pltpu.SemaphoreType.DMA] * 4,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 2),
            interpret=interpret,
        )(tables, cxs, cys, czs, seg,
          jnp.zeros((C, rpad, PW), wdtype))

    keys = sch["keys"]
    rank = sch["rank"]
    idx_s = sch["idx"]
    elig_s = keys < NBtot
    iota = jnp.arange(P, dtype=jnp.int32)

    outs = run_round(0)
    # overflow round: boxes with more than CAP points get ranks
    # CAP..2*CAP-1 served by ONE extra kernel pass under a cond (the
    # common case pays only the reduction); only ranks >= 2*CAP and
    # DMA-window failures remain for the exact XLA fallback
    over2 = (elig_s & (rank >= CAP)).any()
    outs2 = jax.lax.cond(
        over2, lambda _: run_round(CAP),
        lambda _: jnp.zeros((C, rpad, PW), wdtype), 0)

    # per-point served mask, derived with one associative scan — the
    # exact point-wise mirror of the kernel's per-row predicates (same
    # construction as _splat_impl's round_served; no gather)
    blkid = keys // 8
    first_blk = jnp.concatenate([jnp.ones((1,), bool),
                                 blkid[1:] != blkid[:-1]])
    blkstart = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first_blk, iota, 0))

    def round_served(roff):
        a0 = ((blkstart + roff) // 128) * 128
        window_ok = (iota - rank + roff - a0) + CAP <= _SLK * 128
        return (elig_s & (rank >= roff) & (rank < roff + CAP)
                & window_ok)

    r1 = round_served(0)
    r2 = round_served(CAP)
    served_s = r1 | r2
    fb_s = ~served_s
    # select (never multiply: unwritten stream positions are
    # uninitialized under aliasing and may hold NaN) each point's value
    # from the round that served it, then unsort EVERYTHING with one
    # payload sort (lab-8: sorts are ~1.5 ms nearly independent of
    # payload width; gathers cost ~7 ms per 1M indices)
    vals_s = (jnp.where(r1[None, None], outs[:, :n_out, :P], 0)
              + jnp.where(r2[None, None], outs2[:, :n_out, :P], 0))
    sorted_back = jax.lax.sort(
        (idx_s, fb_s.astype(jnp.int32))
        + tuple(vals_s[c, j] for c in range(C) for j in range(n_out)),
        num_keys=1)
    fb_orig = sorted_back[1] > 0
    planes = sorted_back[2:]

    def pick(j):
        # output j (over value/grad planes), channels stacked
        return jnp.stack([planes[c * n_out + j] for c in range(C)], 0)

    val_out = pick(0) if value else None
    gbase = 1 if value else 0
    g_out = jnp.stack([pick(gbase + d) for d in range(3)],
                      axis=-1) if grad else None
    h_out = None
    if hess:
        hbase = gbase + (3 if grad else 0)
        xx, yy, zz, xy, xz, yz = (pick(hbase + t) for t in range(6))
        h_out = jnp.stack([jnp.stack([xx, xy, xz], -1),
                           jnp.stack([xy, yy, yz], -1),
                           jnp.stack([xz, yz, zz], -1)], axis=-2)

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
    if hess:
        def fb_runh(_):
            hv = nd.hess_core(inp, grid, tuple(orders), tuple(bounds),
                              extrapolate)
            return hv.astype(wdtype) \
                * fb_orig[None, :, None, None].astype(wdtype)

        h_out = h_out + jax.lax.cond(
            any_fb, fb_runh, lambda _: jnp.zeros((C, P, 3, 3), wdtype),
            0)

    # extrapolation mask (the kernel computed eligible points
    # unconditionally; the fallback core already masks its own output)
    mask = inbounds_mask(grid, ishape, extrapolate, wdtype)
    if mask is not None:
        if value:
            val_out = val_out * mask[None]
        if grad:
            g_out = g_out * mask[None, :, None]
        if hess:
            h_out = h_out * mask[None, :, None, None]
    if value:
        val_out = val_out.astype(out_dtype)
    if grad:
        g_out = g_out.astype(out_dtype)
    if hess:
        h_out = h_out.astype(out_dtype)
    return val_out, g_out, h_out


# ------------------------------------------------------------ AD rules
# The public ops carry custom VJPs mirroring ops/pushpull.py's
# composition (pull: d_inp = push, d_grid = grad . ct; grad: d_inp =
# pushgrad, d_grid = hess . ct) so jax.grad never differentiates
# through the pallas_call.  ``pre`` rides as a stop_gradient'd operand:
# tables are a deterministic linear function of ``inp``, so routing the
# WHOLE input-gradient through d_inp is exact and the d_pre path is
# dead by construction.
#
# FUSED vjp forwards (round 5): a custom-vjp fwd only runs when
# differentiating, so it may compute MORE than the primal at marginal
# cost — the gather kernel emits value+grad (or grad+hess) planes from
# the same gathers, schedule, tables and return sort.  The extra
# output rides the residuals and replaces an entire kernel pass in the
# backward (pull's grad leg, grad's hess leg, push's pull+grad pair).
# Each fused op (_pullgrad_sc, _gradhess_sc) is itself a custom-vjp op,
# so no AD order ever meets a raw pallas_call (the round-2 lesson).

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pull_sc(inp, grid, pre, orders, bounds, extrapolate, box,
             interpret):
    val, _, _ = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                              value=True, grad=False, box=box,
                              interpret=interpret, pre=pre)
    return val


def _pull_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    # FUSED forward (round 5): custom-vjp fwd only runs when
    # differentiating, so compute value AND gradient in ONE kernel pass
    # (shared gathers, shared schedule, shared return sort — ~+30% over
    # value-only) and stash g in the residuals: the backward's entire
    # separate grad pass (kernel + return, ~15 ms at 1M/256^3)
    # disappears.  _pullgrad_sc is itself a custom-vjp op, so
    # rev-of-rev never meets a raw pallas_call (the round-2 lesson).
    val, g = _pullgrad_sc(inp, grid, pre, orders, bounds, extrapolate,
                          box, interpret)
    return val, (inp, grid, pre, g)


def _pull_sc_bwd(orders, bounds, extrapolate, box, interpret, res, ct):
    inp, grid, pre, g = res
    ishape = tuple(inp.shape[1:])
    # d_inp on the NATIVE splat tier (the XLA scatter core is ~7x
    # slower at 1M points); _push_sc evaluates the primal only here —
    # no AD re-entry (and its own custom_vjp covers higher orders).
    # The splat prefers its own x-heavy box shape (auto_box_splat).
    d_inp = _push_sc(ct, grid, ishape, orders, bounds, extrapolate,
                     auto_box_splat(ishape, grid.shape[0]), interpret)
    d_grid = (g * ct[..., None]).sum(axis=0)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_pull_sc.defvjp(_pull_sc_fwd, _pull_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pullgrad_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    """Fused value + spatial gradient in one kernel pass (serves
    _pull_sc's vjp forward; both outputs share gathers and the return
    sort)."""
    val, g, _ = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                              value=True, grad=True, box=box,
                              interpret=interpret, pre=pre)
    return val, g


def _pullgrad_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                     interpret):
    val, g = _pullgrad_sc(inp, grid, pre, orders, bounds, extrapolate,
                          box, interpret)
    return (val, g), (inp, grid, pre, g)


def _pullgrad_sc_bwd(orders, bounds, extrapolate, box, interpret, res,
                     cts):
    inp, grid, pre, g = res
    ct_v, ct_g = cts
    ishape = tuple(inp.shape[1:])
    sbox = auto_box_splat(ishape, grid.shape[0])
    d_inp = (_push_sc(ct_v, grid, ishape, orders, bounds, extrapolate,
                      sbox, interpret)
             + _pushgrad_sc(ct_g, grid, ishape, orders, bounds,
                            extrapolate, sbox, interpret))
    h = _hess_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret)
    d_grid = ((g * ct_v[..., None]).sum(axis=0)
              + (h * ct_g[..., None]).sum(axis=(0, -2)))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_pullgrad_sc.defvjp(_pullgrad_sc_fwd, _pullgrad_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _grad_sc(inp, grid, pre, orders, bounds, extrapolate, box,
             interpret):
    _, g, _ = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                            value=False, grad=True, box=box,
                            interpret=interpret, pre=pre)
    return g


def _grad_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    # FUSED forward (round 5, cf. _pull_sc_fwd): gradient AND Hessian
    # from one kernel pass; h rides the residuals so the backward's
    # separate 6-plane hess pass disappears.
    g, h = _gradhess_sc(inp, grid, pre, orders, bounds, extrapolate,
                        box, interpret)
    return g, (inp, grid, pre, h)


def _grad_sc_bwd(orders, bounds, extrapolate, box, interpret, res, ct):
    inp, grid, pre, h = res
    ishape = tuple(inp.shape[1:])
    # fully native (round-3 third session): d_inp via the
    # derivative-spec splat kernel, d_grid via the Hessian planes the
    # fused forward already computed
    d_inp = _pushgrad_sc(ct, grid, ishape, orders, bounds, extrapolate,
                         auto_box_splat(ishape, grid.shape[0]),
                         interpret)
    d_grid = (h * ct[..., None]).sum(axis=(0, -2))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_grad_sc.defvjp(_grad_sc_fwd, _grad_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gradhess_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    """Fused spatial gradient + Hessian in one kernel pass (serves
    _grad_sc's vjp forward)."""
    _, g, h = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                            value=False, grad=True, hess=True,
                            box=box, interpret=interpret, pre=pre)
    return g, h


def _gradhess_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                     interpret):
    g, h = _gradhess_sc(inp, grid, pre, orders, bounds, extrapolate,
                        box, interpret)
    return (g, h), (inp, grid, pre, h)


def _gradhess_sc_bwd(orders, bounds, extrapolate, box, interpret, res,
                     cts):
    from . import ndkernels as nd
    inp, grid, pre, h = res
    ct_g, ct_h = cts
    ishape = tuple(inp.shape[1:])
    sbox = auto_box_splat(ishape, grid.shape[0])
    d_inp = (_pushgrad_sc(ct_g, grid, ishape, orders, bounds,
                          extrapolate, sbox, interpret)
             + _pushhess_sc(ct_h, grid, ishape, orders, bounds,
                            extrapolate, sbox, interpret))
    d_grid = (h * ct_g[..., None]).sum(axis=(0, -2))
    # the ct_h leg of d_grid needs third derivatives: exact XLA trace
    # of the generic core (rare path, same as _hess_sc_bwd)
    prim, vjp_g = jax.vjp(
        lambda gr: nd.hess_core(inp, gr, tuple(orders), tuple(bounds),
                                extrapolate), grid)
    d_grid = d_grid + vjp_g(ct_h.astype(prim.dtype))[0]
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_gradhess_sc.defvjp(_gradhess_sc_fwd, _gradhess_sc_bwd)


def _resolve(inp, grid, orders, bounds, box, pre):
    if pre is not None and box is None:
        raise ValueError("pre= (precomputed tables) requires the box "
                         "they were built with")
    box = tuple(box or auto_box(inp.shape[1:], grid.shape[0]))
    if pre is None:
        pre = precompute_tables(inp, tuple(orders), tuple(bounds), box)
    return box, jax.lax.stop_gradient(pre)


def _lift_2d(inp, grid, orders, bounds, box):
    """Append ONE degenerate trailing axis (2-D -> 3-D; applied twice
    for 1-D clouds — round 5, closing the last dim gap vs jitfields,
    reference interpol/jitfields.py:47-114).

    The dummy axis carries order 0, box 1, coordinate exactly 0 and a
    size-1 volume axis, so :func:`box_geometry` gives it extent 1 — the
    lift adds ZERO table size or gather-cascade cost (cf. the window
    tier's degenerate-axis lift, ops/window.py._lift3).  Applied
    OUTSIDE the custom-vjp ops: the lift is plain reshape/concat, so
    JAX transposes it automatically and every AD order keeps working."""
    inp3 = inp[..., None] if inp is not None else None
    g3 = jnp.concatenate([grid, jnp.zeros_like(grid[..., :1])], -1)
    orders3 = tuple(orders) + (0,)
    bounds3 = tuple(bounds) + (3,)          # dct2: identity fold at n=1
    box3 = None if box is None else tuple(box) + (1,)
    return inp3, g3, orders3, bounds3, box3


def pull_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False, pre=None):
    """(C, *ishape), (P, D) -> (C, P), D in (1, 2, 3).  Semantics:
    ndkernels.pull_core (reference interpol/nd.py:80-143).  ``pre``:
    precomputed tables (see :func:`precompute_tables`)."""
    for _ in range(3 - grid.shape[-1]):
        inp, grid, orders, bounds, box = _lift_2d(inp, grid, orders,
                                                  bounds, box)
    box, pre = _resolve(inp, grid, orders, bounds, box, pre)
    return _pull_sc(inp, grid, pre, tuple(orders), tuple(bounds),
                    extrapolate, box, interpret)


def grad_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False, pre=None):
    """(C, *ishape), (P, D) -> (C, P, D), D in (1, 2, 3).  Semantics:
    ndkernels.grad_core (reference interpol/nd.py:216-288)."""
    D = grid.shape[-1]
    for _ in range(3 - D):
        inp, grid, orders, bounds, box = _lift_2d(inp, grid, orders,
                                                  bounds, box)
    box, pre = _resolve(inp, grid, orders, bounds, box, pre)
    g = _grad_sc(inp, grid, pre, tuple(orders), tuple(bounds),
                 extrapolate, box, interpret)
    return g[..., :D]


# ----------------------------------------------------------- push/count
# Splat adjoints on the native tier: box-densifying MXU kernel (module
# docstring).  Semantics: ndkernels.push_core / count_core (reference
# interpol/nd.py:146-213, pushpull.py:106-142).

def _splat_kernel(cx_hbm, cy_hbm, cz_hbm, vv_hbm, seg_ref, out_ref,
                  *bufs, orders, blo, ext, box, nb, spec, expad,
                  eyzpad, roff=0):
    """One (channel, 8-box block) program: densify 8 boxes' splats.

    Third-generation kernel: fetches its own sorted coordinates AND
    value rows (one dynamic 128-aligned DMA per stream, exactly like
    the pull kernel) and evaluates B-spline taps in-register.  The
    second-generation kernel needed per-slot data pre-evaluated by XLA
    in TWO layouts (lane-major for A, sublane-major for B), which cost
    a 2M-slot gather, XLA tap evaluation, and two big relayout
    operands per call — about half the op's wall time at the 1M/256^3
    operating point.  This kernel keeps EVERYTHING lane-major (slots
    on lanes) by building the TRANSPOSED right operand
    ``BT[yz, s]`` with sublane-iota one-hot compares and contracting
    both matmul operands on their lane (slot) axis:

        patch[X, YZ] = sum_s A[X, s] * BT[YZ, s]
                     = dot_general(A, BT, contracting dims (1, 1))

    ``spec`` is a static tuple of per-axis derivative multi-indices:
    value row i is splatted with ``d^spec[i]`` taps.  Value splat:
    ``((0,0,0),)``; pushgrad (adjoint of grid_grad w.r.t. its input):
    ``((1,0,0),(0,1,0),(0,0,1))``; pushhess: the 9 second-order
    pairs.  All rows share the coordinate DMA, the tap evaluation and
    the output patch (their splats accumulate).

    Per-ROW window check (not per-block): row r is served only when
    its slot window fits the DMA window (``seg[8k+r] - a0 + CAP <=
    TOT``); unserved rows emit a zero patch and their points take the
    exact XLA fallback (the host side reproduces the same predicate
    point-wise with one associative scan — no gather).

    The 8 rows run in a ``fori_loop``: a Python unroll leaves every
    row's (eyzpad, 128) intermediates live and Mosaic stack-allocates
    them all — 17+ MB of scoped VMEM, over the 16 MB limit (observed
    r3).  Invalid slots carry v = 0, which zeroes their A column and
    with it any garbage in their BT column.

    ``roff`` > 0 (the overflow round) adds a PER-BLOCK skip (round 5,
    cf. _gather_kernel): blocks whose 8 boxes all fit their slots
    write zero patches without doing any splat work."""
    NV = len(spec)
    o0, o1, o2 = orders
    Ez = ext[2]
    wdtype = out_ref.dtype
    c = pl.program_id(0)
    k = pl.program_id(1)
    TOT = _SLK * 128

    scr, vscr, sems = bufs[0:3], bufs[3], bufs[4:]

    def body():
        s0 = seg_ref[8 * k] + roff
        a0 = (s0 // 128) * 128
        cps = []
        for i, (hbm, s) in enumerate(zip((cx_hbm, cy_hbm, cz_hbm), scr)):
            cp = pltpu.make_async_copy(
                hbm.at[:, pl.ds(pl.multiple_of(a0, 128), TOT)], s, sems[i])
            cps.append(cp)
            cp.start()
        # values ride as (C, NV, R*128): the channel index lands on a free
        # leading dim (sublane offsets would need 8-alignment, which c*NV
        # cannot guarantee)
        cpv = pltpu.make_async_copy(
            vv_hbm.at[pl.ds(c, 1), :,
                      pl.ds(pl.multiple_of(a0, 128), TOT)], vscr, sems[3])
        cpv.start()
        for cp in cps:
            cp.wait()
        cpv.wait()

        Xi = jax.lax.broadcasted_iota(jnp.int32, (expad, 128), 0)
        YZi = jax.lax.broadcasted_iota(jnp.int32, (eyzpad, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lv = max(max(s) for s in spec)

        def row(r, carry):
            b = k * 8 + r
            base0 = ((b // (nb[1] * nb[2])) * box[0],
                     ((b // nb[2]) % nb[1]) * box[1],
                     (b % nb[2]) * box[2])
            sr = seg_ref[8 * k + r] + roff
            ok = ((sr - a0) + CAP <= TOT).astype(jnp.int32)
            # negative counts (overflow-round rows of non-overflowing
            # boxes) give an all-false valid mask via lane < cnt
            cnt = jnp.minimum(seg_ref[8 * k + r + 1] - sr, CAP) * ok
            off = jnp.clip(sr - a0, 0, TOT - 128)
            g = [pltpu.roll(scr[d][...], TOT - off, 1)[:, :128]
                 for d in range(3)]
            vrows = pltpu.roll(vscr[0], TOT - off, 1)[:, :128]   # (NV, 128)
            valid = (lane < cnt).astype(wdtype)
            taps, locs = [], []
            for d in range(3):
                n0, t = node_origin(g[d], orders[d])
                w, gr, h = bspline_taps(t, orders[d], grad=lv >= 1,
                                        hess=lv >= 2)
                taps.append((w, gr, h))
                locs.append(n0 - (base0[d] - blo[d]))
            patch = jnp.zeros((expad, eyzpad), wdtype)
            for i, (dx, dy, dz) in enumerate(spec):
                vr = vrows[i:i + 1] * valid           # (1, 128)
                wx, wy, wz = taps[0][dx], taps[1][dy], taps[2][dz]
                A = jnp.zeros((expad, 128), wdtype)
                for j in range(o0 + 1):
                    A = A + jnp.where(Xi == locs[0] + j, wx[j] * vr,
                                      jnp.zeros((), wdtype))
                BT = jnp.zeros((eyzpad, 128), wdtype)
                for jy in range(o1 + 1):
                    iy = (locs[1] + jy) * Ez + locs[2]
                    for jz in range(o2 + 1):
                        BT = BT + jnp.where(YZi == iy + jz,
                                            wy[jy] * wz[jz],
                                            jnp.zeros((), wdtype))
                # HIGHEST: the MXU's default f32 precision is a single
                # bf16 pass (~3e-3 relative error, observed on-chip r3);
                # the splat contract is <= 1e-5 vs the scatter core
                patch = patch + jax.lax.dot_general(
                    A, BT, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=wdtype,
                    precision=jax.lax.Precision.HIGHEST)
            out_ref[0, r] = patch
            return carry

        jax.lax.fori_loop(0, 8, row, 0)

    if roff:
        # per-block skip (round 5, cf. _gather_kernel): a block with no
        # overflowing box writes zero patches and does no splat work —
        # the overflow round costs only the overflowing blocks (plus
        # the epilogue relayout, which is outside the kernel)
        over = seg_ref[8 * k + 1] - seg_ref[8 * k]
        for r in range(1, 8):
            over = jnp.maximum(over, seg_ref[8 * k + r + 1]
                               - seg_ref[8 * k + r])
        pl.when(over > CAP)(body)

        @pl.when(over <= CAP)
        def _zero():
            out_ref[...] = jnp.zeros(out_ref.shape, wdtype)
    else:
        body()


def _combine_axis(x, nb_d, b_d, e_d):
    """Adjoint of the box build's strided-slice stacking along the last
    two axes: (..., NB, E) -> (..., NB*b + e - b) overlap-add."""
    Pd = nb_d * b_d + e_d - b_d
    out = jnp.zeros(x.shape[:-2] + (Pd,), x.dtype)
    for j in range(e_d):
        out = out.at[..., j:j + nb_d * b_d:b_d].add(x[..., j])
    return out


def _splat_impl(rows, grid, oshape, orders, bounds, extrapolate,
                box, interpret, spec, fb_core):
    """Unbatched generalized scattered splat.

    rows: (C, NV, P) value rows, one per derivative multi-index in
    ``spec`` (see :func:`_splat_kernel`); grid: (P, 3).  Returns
    ``sum_i splat(rows[:, i], d^spec[i] taps)`` as (C, *oshape).
    ``fb_core(rows_masked)`` must return the exact XLA-core splat of
    the masked rows (same reduction) for fallback points."""
    D = grid.shape[-1]
    assert D == 3, "scattered native tier is 3-D"
    C, NV, P = rows.shape
    oshape = tuple(oshape)
    out_dtype = jnp.result_type(rows.dtype, grid.dtype)
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
                    extra=tuple(rows[c, i].astype(wdtype)
                                for c in range(C) for i in range(NV)))

    # seg[NBtot] must be the FIRST-INELIGIBLE position, not P: the
    # ineligible points (keys == NBtot) sort directly after the last
    # box's segment, and a P end would make the last box's slot count
    # swallow them — the kernel would splat out-of-volume points into
    # the last box (caught by test_scattered_push_fallbacks)
    seg = jnp.concatenate([
        sch["seg_start"][:NBtot + 1],
        jnp.broadcast_to(sch["seg_start"][NBtot],
                         (NB8 - NBtot,))]).astype(jnp.int32)

    # sorted coords / value rows as (*, R*128) lane-major streams; pad
    # so the last block's DMA window stays in bounds (one extra chunk
    # for the overflow round, whose DMA base sits up to CAP lanes later)
    R = -(-P // 128) + _SLK + 1

    def lanes(x):
        return jnp.pad(x, (0, R * 128 - P)).astype(wdtype)

    cxs = lanes(sch["coords"][:, 0]).reshape(1, R * 128)
    cys = lanes(sch["coords"][:, 1]).reshape(1, R * 128)
    czs = lanes(sch["coords"][:, 2]).reshape(1, R * 128)
    # NV rides the SUBLANE dim of the value stream; Mosaic requires DMA
    # slice extents on that dim aligned to the memref tiling (observed
    # on-chip r3: NV=3 -> "must be aligned to tiling (4)").  Pad the
    # rows dim to the tile (4 for small dims, else 8-multiples) and DMA
    # the full span; the kernel reads only the first NV rows.
    nvpad = NV if NV == 1 else (4 if NV <= 4 else -(-NV // 8) * 8)
    vvs = jnp.stack([lanes(e) for e in sch["extra"]]
                    ).reshape(C, NV, R * 128)
    if nvpad != NV:
        vvs = jnp.pad(vvs, ((0, 0), (0, nvpad - NV), (0, 0)))

    hspec = pl.BlockSpec(memory_space=pl.ANY)
    mspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def run_round(roff):
        kernel = partial(_splat_kernel, orders=tuple(orders), blo=blo,
                         ext=ext, box=box, nb=nb, spec=tuple(spec),
                         expad=expad, eyzpad=eyzpad, roff=roff)
        out_k = pl.pallas_call(
            kernel,
            grid=(C, NBLK),
            in_specs=[hspec, hspec, hspec, hspec, mspec],
            out_specs=pl.BlockSpec((1, 8, expad, eyzpad),
                                   lambda c, k: (c, k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, NB8, expad, eyzpad),
                                           wdtype),
            scratch_shapes=[pltpu.VMEM((1, _SLK * 128), wdtype)] * 3
            + [pltpu.VMEM((1, nvpad, _SLK * 128), wdtype)]
            + [pltpu.SemaphoreType.DMA] * 4,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 2),
            interpret=interpret,
        )(cxs, cys, czs, vvs, seg)

        # inverse box relayout: patches -> padded volume (overlap-add),
        # then fold the pad margins back through the boundaries
        patches = out_k[:, :NBtot, :Ex, :eyz].reshape(
            (C,) + nb + (Ex, Ey, Ez))
        patches = patches.transpose(0, 1, 4, 2, 5, 3, 6)
        x = _combine_axis(patches, nb[2], box[2], ext[2])
        x = jnp.moveaxis(x, 5, 3)          # (C, NBx, Ex, Pz, NBy, Ey)
        x = _combine_axis(x, nb[1], box[1], ext[1])
        x = x.transpose(0, 3, 4, 1, 2)     # (C, Pz, Py, NBx, Ex)
        x = _combine_axis(x, nb[0], box[0], ext[0])
        x = x.transpose(0, 3, 2, 1)        # (C, Px, Py, Pz)
        lo = list(blo)
        hi = [nbd * bd - n + e - bd - bl
              for nbd, bd, n, e, bl in zip(nb, box, oshape, ext, blo)]
        return _fold_pad_margins(x, oshape, bounds, lo, hi, wdtype)

    vol = run_round(0)

    # served predicates mirror the kernel's per-row checks point-wise:
    # a point at sorted position i with within-box rank r sits in a box
    # whose segment starts at i-r; its block's round-``roff`` DMA base
    # is ((blockstart + roff) // 128) * 128 with blockstart spread from
    # the block-first markers by one associative scan (no gather).
    keys, rank = sch["keys"], sch["rank"]
    iota = jnp.arange(P, dtype=jnp.int32)
    blkid = keys // 8
    first_blk = jnp.concatenate([jnp.ones((1,), bool),
                                 blkid[1:] != blkid[:-1]])
    blkstart = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first_blk, iota, 0))
    elig = keys < NBtot

    def round_served(roff):
        a0 = ((blkstart + roff) // 128) * 128
        window_ok = (iota - rank + roff - a0) + CAP <= _SLK * 128
        return (elig & (rank >= roff) & (rank < roff + CAP)
                & window_ok)

    # overflow round: boxes with more than CAP points get ranks
    # CAP..2*CAP-1 splatted by ONE extra kernel pass under a cond (the
    # common case pays only the reduction); only ranks >= 2*CAP and
    # DMA-window failures remain for the exact XLA fallback
    over2 = (elig & (rank >= CAP)).any()
    vol = vol + jax.lax.cond(
        over2, lambda _: run_round(CAP),
        lambda _: jnp.zeros((C,) + oshape, wdtype), 0)

    served_s = round_served(0) | round_served(CAP)
    unsorted = jax.lax.sort(
        (sch["idx"], (~served_s).astype(jnp.int32)), num_keys=1)
    fb_orig = unsorted[1] > 0
    any_fb = fb_orig.any()

    def fb_run(_):
        masked = rows.astype(wdtype) * fb_orig[None, None].astype(wdtype)
        return fb_core(masked).astype(wdtype)

    vol = vol + jax.lax.cond(
        any_fb, fb_run, lambda _: jnp.zeros((C,) + oshape, wdtype), 0)
    return vol.astype(out_dtype)


def _push_sc_impl(vals, grid, oshape, orders, bounds, extrapolate,
                  box, interpret):
    """Unbatched scattered splat: (C, P), (P, 3) -> (C, *oshape)."""
    from . import ndkernels as nd

    def fb_core(masked):                    # (C, 1, P) -> (C, *oshape)
        return nd.push_core(masked[:, 0], grid, tuple(oshape),
                            tuple(orders), tuple(bounds), extrapolate)

    return _splat_impl(vals[:, None], grid, oshape, orders, bounds,
                       extrapolate, box, interpret, ((0, 0, 0),),
                       fb_core)


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
    # ct is resampled for both d_vals (pull) and d_grid (grad): ONE
    # fused kernel pass computes both (round 5 — shared gathers,
    # schedule, tables AND return sort; previously only the tables were
    # shared between two separate passes).  Re-derive a GATHER box: the
    # forward's splat box is x-heavy, which can blow up TAB (and with
    # it the gather-cascade cost) for sparse clouds.
    gbox = auto_box(tuple(ct.shape[1:]), grid.shape[0])
    pre = jax.lax.stop_gradient(
        precompute_tables(ct, tuple(orders), tuple(bounds), gbox))
    d_vals, g = _pullgrad_sc(ct, grid, pre, tuple(orders),
                             tuple(bounds), extrapolate, gbox,
                             interpret)
    d_grid = (g * vals[..., None]).sum(axis=0)
    return (d_vals.astype(vals.dtype), d_grid.astype(grid.dtype))


_push_sc.defvjp(_push_sc_fwd, _push_sc_bwd)


# -------------------------------------------------- derivative adjoints
# pushgrad (adjoint of grad w.r.t. its input) and hess (the grad
# family's second-order gather) on the native tier, with mutually
# recursive custom VJPs so EVERY autodiff order keeps working without
# ever exposing a raw pallas_call to the tracer (the round-2 lesson):
#   grad  --bwd-->  pushgrad (splat kernel) + hess (gather kernel)
#   pushgrad --bwd--> grad + hess           (native)
#   hess  --bwd-->  pushhess (splat kernel) + XLA third-order trace
#   pushhess --bwd--> hess + XLA fourth-order trace
# The XLA d_grid legs trace the generic hess_core, which is plain jnp
# and differentiable to any order (rare paths; documented).

_SPEC_GRAD = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
_SPEC_HESS = tuple(tuple((1 if a == d else 0) + (1 if a == e else 0)
                         for a in range(3))
                   for d in range(3) for e in range(3))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _pushgrad_sc(ct, grid, oshape, orders, bounds, extrapolate, box,
                 interpret):
    from . import ndkernels as nd

    def fb_core(masked):                   # (C, 3, P)
        return nd.pushgrad_core(jnp.moveaxis(masked, 1, -1), grid,
                                tuple(oshape), tuple(orders),
                                tuple(bounds), extrapolate)

    rows = jnp.moveaxis(ct, -1, 1)         # (C, 3, P)
    return _splat_impl(rows, grid, oshape, orders, bounds, extrapolate,
                       box, interpret, _SPEC_GRAD, fb_core)


def _pushgrad_sc_fwd(ct, grid, oshape, orders, bounds, extrapolate,
                     box, interpret):
    return _pushgrad_sc(ct, grid, oshape, orders, bounds, extrapolate,
                        box, interpret), (ct, grid)


def _pushgrad_sc_bwd(oshape, orders, bounds, extrapolate, box,
                     interpret, res, u):
    ct, grid = res
    gbox = auto_box(tuple(u.shape[1:]), grid.shape[0])
    pre = jax.lax.stop_gradient(
        precompute_tables(u, tuple(orders), tuple(bounds), gbox))
    # ONE fused grad+hess pass on u (round 5; was two separate passes
    # sharing only the tables)
    d_ct, h = _gradhess_sc(u, grid, pre, tuple(orders), tuple(bounds),
                           extrapolate, gbox, interpret)
    d_grid = (h * ct[..., None]).sum(axis=(0, -2))
    return (d_ct.astype(ct.dtype), d_grid.astype(grid.dtype))


_pushgrad_sc.defvjp(_pushgrad_sc_fwd, _pushgrad_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _hess_sc(inp, grid, pre, orders, bounds, extrapolate, box,
             interpret):
    _, _, h = _scatter_impl(inp, grid, orders, bounds, extrapolate,
                            value=False, grad=False, hess=True,
                            box=box, interpret=interpret, pre=pre)
    return h


def _hess_sc_fwd(inp, grid, pre, orders, bounds, extrapolate, box,
                 interpret):
    return _hess_sc(inp, grid, pre, orders, bounds, extrapolate, box,
                    interpret), (inp, grid, pre)


def _hess_sc_bwd(orders, bounds, extrapolate, box, interpret, res, ct):
    from . import ndkernels as nd
    inp, grid, pre = res
    ishape = tuple(inp.shape[1:])
    d_inp = _pushhess_sc(ct, grid, ishape, orders, bounds, extrapolate,
                         auto_box_splat(ishape, grid.shape[0]),
                         interpret)
    # d_grid needs third derivatives: exact XLA trace of the generic
    # core (rare path; plain jnp, differentiable to any order)
    prim, vjp_g = jax.vjp(
        lambda gr: nd.hess_core(inp, gr, tuple(orders), tuple(bounds),
                                extrapolate), grid)
    d_grid = vjp_g(ct.astype(prim.dtype))[0]
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype),
            jnp.zeros_like(pre))


_hess_sc.defvjp(_hess_sc_fwd, _hess_sc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _pushhess_sc(ct, grid, oshape, orders, bounds, extrapolate, box,
                 interpret):
    from . import ndkernels as nd
    C = ct.shape[0]

    def fb_core(masked):                   # (C, 9, P)
        ctm = jnp.moveaxis(masked, 1, -1).reshape(ct.shape)
        zero = jnp.zeros((C,) + tuple(oshape), masked.dtype)
        prim, vjp = jax.vjp(
            lambda v: nd.hess_core(v, grid, tuple(orders),
                                   tuple(bounds), extrapolate), zero)
        return vjp(ctm.astype(prim.dtype))[0]

    rows = jnp.moveaxis(ct.reshape(C, -1, 9), -1, 1)   # (C, 9, P)
    return _splat_impl(rows, grid, oshape, orders, bounds, extrapolate,
                       box, interpret, _SPEC_HESS, fb_core)


def _pushhess_sc_fwd(ct, grid, oshape, orders, bounds, extrapolate,
                     box, interpret):
    return _pushhess_sc(ct, grid, oshape, orders, bounds, extrapolate,
                        box, interpret), (ct, grid)


def _pushhess_sc_bwd(oshape, orders, bounds, extrapolate, box,
                     interpret, res, u):
    from . import ndkernels as nd
    ct, grid = res
    gbox = auto_box(tuple(u.shape[1:]), grid.shape[0])
    pre = jax.lax.stop_gradient(
        precompute_tables(u, tuple(orders), tuple(bounds), gbox))
    d_ct = _hess_sc(u, grid, pre, tuple(orders), tuple(bounds),
                    extrapolate, gbox, interpret)
    # d_grid needs fourth derivatives: exact XLA trace (rare path)

    def ph(gr):
        zero = jnp.zeros(u.shape, u.dtype)
        prim, vjp = jax.vjp(
            lambda v: nd.hess_core(v, gr, tuple(orders), tuple(bounds),
                                   extrapolate), zero)
        return vjp(ct.astype(prim.dtype))[0]

    prim2, vjp_g = jax.vjp(ph, grid)
    d_grid = vjp_g(u.astype(prim2.dtype))[0]
    return (d_ct.astype(ct.dtype), d_grid.astype(grid.dtype))


_pushhess_sc.defvjp(_pushhess_sc_fwd, _pushhess_sc_bwd)


def pushgrad_scattered(ct, grid, oshape, orders, bounds, extrapolate,
                       *, box=None, interpret=False):
    """Adjoint of :func:`grad_scattered` w.r.t. its input: splat the
    per-point gradient cotangents (C, P, D) into a (C, *oshape) volume
    with first-derivative taps, D in (1, 2, 3).  Semantics:
    ndkernels.pushgrad_core (reference interpol/pushpull.py:176-233)."""
    D = grid.shape[-1]
    for _ in range(3 - D):
        _, grid, orders, bounds, box = _lift_2d(None, grid, orders,
                                                bounds, box)
        oshape = tuple(oshape) + (1,)
        ct = jnp.concatenate([ct, jnp.zeros_like(ct[..., :1])], -1)
    box = tuple(box or auto_box_splat(tuple(oshape), grid.shape[0]))
    out = _pushgrad_sc(ct, grid, tuple(oshape), tuple(orders),
                       tuple(bounds), extrapolate, box, interpret)
    return out.reshape(out.shape[:1 + D])


def hess_scattered(inp, grid, orders, bounds, extrapolate, *,
                   box=None, interpret=False, pre=None):
    """(C, *ishape), (P, D) -> (C, P, D, D) spatial Hessians, D in
    (1, 2, 3), all D*D planes from one fused kernel pass (6 unique in
    3-D, mirrored symmetric).  Semantics: ndkernels.hess_core
    (reference interpol/pushpull.py:303-325)."""
    D = grid.shape[-1]
    for _ in range(3 - D):
        inp, grid, orders, bounds, box = _lift_2d(inp, grid, orders,
                                                  bounds, box)
    box, pre = _resolve(inp, grid, orders, bounds, box, pre)
    h = _hess_sc(inp, grid, pre, tuple(orders), tuple(bounds),
                 extrapolate, box, interpret)
    return h[..., :D, :D]


def push_scattered(vals, grid, oshape, orders, bounds, extrapolate, *,
                   box=None, interpret=False):
    """(C, P), (P, D) -> (C, *oshape), D in (1, 2, 3).  Semantics:
    ndkernels.push_core (reference interpol/nd.py:146-213)."""
    D = grid.shape[-1]
    for _ in range(3 - D):
        _, grid, orders, bounds, box = _lift_2d(None, grid, orders,
                                                bounds, box)
        oshape = tuple(oshape) + (1,)
    box = tuple(box or auto_box_splat(tuple(oshape), grid.shape[0]))
    out = _push_sc(vals, grid, tuple(oshape), tuple(orders),
                   tuple(bounds), extrapolate, box, interpret)
    return out.reshape(out.shape[:1 + D])


def count_scattered(grid, oshape, orders, bounds, extrapolate, *,
                    box=None, interpret=False):
    """(P, D) -> (1, *oshape): splatted unit weights (reference
    interpol/pushpull.py:106-142)."""
    ones = jnp.ones((1, grid.shape[0]), dtype=grid.dtype)
    return push_scattered(ones, grid, oshape, orders, bounds,
                          extrapolate, box=box, interpret=interpret)
