"""Windowed shift-FMA warp sampling: gather-free dense-grid pull/push/grad
for bounded displacements — the TPU-native warp fast path.

For the dominant production workload — dense warps ``grid = identity +
displacement`` with ``|disp| <= max_disp`` per axis — every tap of every
sample lies within a fixed relative window of its own voxel.  The op then
factors into *statically shifted views*:

    out[p] = sum_{s in window^D} ( prod_d coef_d[s_d](p) ) * Vpad[p + s]

where ``Vpad`` is the volume padded by the window radius with
boundary-folded content (fold index + sign baked into the pad, so all
seven bounds — including dft wrap — are exact), and the per-axis
coefficient fields

    coef_d[s](p) = weight_j(p)   if the tap j = s - delta0_d(p) exists
    delta0_d(p)  = node_origin(g_d(p)) - p_d     (bounded integer)

select which tap, if any, lands on shift ``s``.  Everything is elementwise
VPU work over statically-sliced views — no gathers, no scatters, no
matmuls — exactly the access pattern XLA and the TPU memory system love.
Work: ~(2*max_disp + order + 2)^D fused multiply-adds per voxel.

Semantics are identical to the generic kernels (interpol/nd.py algorithm)
under the displacement contract; samples violating it silently lose the
taps that fall outside their window (graceful degradation, documented).

The family's hand-wired adjoints mirror ops/pushpull.py: pull <-> push are
mutual adjoints, grad uses derivative coefficient fields; wired with
``jax.custom_vjp`` so warp training steps never differentiate through the
coefficient construction.
"""
from __future__ import annotations

import itertools
import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .bounds import fold_index, fold_sign
from .ndkernels import inbounds_mask
from .splines import bspline_taps, node_origin

__all__ = ["window_range", "pull_window", "push_window", "grad_window",
           "pushgrad_window", "hess_window"]


def window_range(order: int, max_disp: float) -> Tuple[int, int]:
    """Inclusive shift range [smin, smax] that covers every tap of a
    sample within ``max_disp`` of its voxel.

    Order 0 is special-cased: its node is ``round(g)`` with
    half-to-even ties (splines.node_origin), so the farthest reachable
    node is ``floor(max_disp + 1/2)`` on either side (a displacement of
    exactly ``k + 1/2`` may round away from the voxel) — the floor-based
    formula below would clip the window asymmetrically and silently
    drop the nearest-neighbor tap for ``|disp| > 1/2``.
    """
    if order == 0:
        r = math.floor(max_disp + 0.5)
        return -r, r
    # node origin is floor(g - (order-1)/2) (splines.node_origin), so for
    # g = p + d with |d| <= max_disp the reachable origins are exactly
    #   delta0 = floor(d - (order-1)/2)
    #          in [floor(-max_disp - a), floor(max_disp - a)],  a=(order-1)/2
    # and the taps extend ``order`` past the top origin.  (A symmetric
    # ±(max_disp + a) bound is ~(order-1) shifts too wide at the top —
    # 2x the 3-D FLOPs at order 3.)
    a = (order - 1) / 2
    d0min = math.floor(-max_disp - a)
    d0max = math.floor(max_disp - a)
    return d0min, d0max + order


def _md_tuple(max_disp, D):
    """Normalize max_disp to a per-axis tuple (anisotropic displacement
    bounds; also used internally to lift 2-D warps into the 3-D Pallas
    kernel with a zero-displacement dummy axis)."""
    if isinstance(max_disp, (tuple, list)):
        assert len(max_disp) == D
        return tuple(float(m) for m in max_disp)
    return (float(max_disp),) * D


def _pad_folded(inp: jnp.ndarray, ishape, bounds, lo: Sequence[int],
                hi: Sequence[int], wdtype) -> jnp.ndarray:
    """Pad the last D axes with boundary-folded (index + sign) content."""
    D = len(ishape)
    out = inp
    for d in range(D):
        n = ishape[d]
        idx = np.arange(-lo[d], n + hi[d])
        folded = fold_index(idx, n, bounds[d], xp=np)   # static table
        axis = out.ndim - D + d
        out = jnp.take(out, jnp.asarray(folded), axis=axis)
        sign = fold_sign(idx, n, bounds[d], wdtype, xp=np)
        if sign is not None:
            shape = [1] * out.ndim
            shape[axis] = idx.size
            out = out * jnp.asarray(sign).reshape(shape)
    return out


def _coef_fields(grid, ishape, orders, max_disp, wdtype, deriv_axis=None,
                 deriv_axes=None, deriv2_axis=None):
    """Per-axis coefficient fields.

    Returns (ranges, coefs): ranges[d] = (smin, smax); coefs[d] is a list
    of len (smax-smin+1) arrays shaped like the volume, where coefs[d][k]
    is the weight this sample contributes at relative shift smin+k along
    axis d.  ``deriv_axis`` selects first-derivative factors on one axis;
    ``deriv_axes`` (tuple) on several; ``deriv2_axis`` selects the
    second-derivative factor (mixed second derivatives use ``deriv_axes``
    with two entries — the separable product of two first derivatives).
    """
    D = grid.shape[-1]
    md = _md_tuple(max_disp, D)
    dax = set(deriv_axes or ())
    if deriv_axis is not None:
        dax.add(deriv_axis)
    ranges, coefs = [], []
    for d in range(D):
        g = grid[..., d].astype(wdtype)
        order = orders[d]
        smin, smax = window_range(order, md[d])
        n0, t = node_origin(g, order)
        need_grad = d in dax
        need_hess = (deriv2_axis == d)
        w, gr, he = bspline_taps(t, order, grad=need_grad, hess=need_hess)
        taps = he if need_hess else (gr if need_grad else w)
        # delta0 = n0 - p  (p = own voxel index along axis d)
        p = jax.lax.broadcasted_iota(jnp.int32, g.shape, d)
        d0 = n0 - p
        d0min, d0max = smin, smax - order   # attainable delta0 values
        cs = []
        for s in range(smin, smax + 1):
            acc = None
            for j in range(order + 1):
                if d0min <= s - j <= d0max:
                    term = jnp.where(d0 == s - j, taps[j], 0)
                    acc = term if acc is None else acc + term
            cs.append(acc if acc is not None else jnp.zeros_like(g))
        ranges.append((smin, smax))
        coefs.append(cs)
    return ranges, coefs


def _slice_pad(vpad, offs, lo, ishape):
    """Static window slice of the padded volume: Vpad[p + s]."""
    D = len(ishape)
    idx = [slice(None)] * vpad.ndim
    for d in range(D):
        start = lo[d] + offs[d]
        idx[vpad.ndim - D + d] = slice(start, start + ishape[d])
    return vpad[tuple(idx)]


def _accumulate(vpad, ranges, coefs, lo, ishape, combine):
    """Sum over the shift window: combine(view, per-axis coef list)."""
    D = len(ishape)
    out = None
    spans = [range(r[1] - r[0] + 1) for r in ranges]
    for ks in itertools.product(*spans):
        w = None
        for d, k in enumerate(ks):
            cd = coefs[d][k]
            w = cd if w is None else w * cd
        offs = [ranges[d][0] + ks[d] for d in range(D)]
        view = _slice_pad(vpad, offs, lo, ishape)
        term = combine(view, w)
        out = term if out is None else out + term
    return out


# ----------------------------------------------------------------- pull

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pull_window(inp, grid, orders, bounds, extrapolate, max_disp,
                spread=None):
    """Dense-grid pull, gather-free.

    inp: (C, *ishape); grid: (*ishape, D) with samples within
    ``max_disp`` voxels of their own site.  Returns (C, *ishape).

    ``spread``: opt-in adaptive per-tile windows on the Pallas tier
    (see pallas_warp.warp_pallas); the XLA formulation ignores it
    (full window — a superset, identical for contract-honoring grids).
    """
    return _pull_impl(inp, grid, orders, bounds, extrapolate, max_disp,
                      spread)


def _window_geom(orders, max_disp, D):
    md = _md_tuple(max_disp, D)
    los, his = [], []
    for d in range(D):
        smin, smax = window_range(orders[d], md[d])
        los.append(max(0, -smin))
        his.append(max(0, smax))
    return los, his


def _should_pallas(ishape) -> bool:
    """Use the Pallas native kernel for the forward when the backend and
    shape allow (3-D, tile-divisible, running on TPU).  The backward
    always runs the XLA formulation (push/grad below) via the custom
    VJP, so autodiff never differentiates through the kernel."""
    from .. import backend as _backend

    be = _backend.get_backend()
    if be == "xla":
        return False
    from .pallas_warp import default_tile
    eligible = (default_tile(ishape) is not None
                or len(ishape) in (1, 2))
    if be == "pallas":
        return eligible
    return eligible and jax.default_backend() == "tpu"





# Widest shift span the fused kernel unrolls in one launch: the S^3
# accumulation spills ~S^3/250 MB of VMEM stack; span 20 (max_disp=8
# cubic) exceeded the 16 MB scoped limit on v5e, span 14 (order-5 x
# max_disp-4) compiles.  Wider windows are CHUNKED: exact sub-range
# launches that sum (same total tap count; each launch's geometry
# range is its active range widened to contain 0, preserving the
# box-origin/pad/DMA-alignment convention).
_SPAN_CAP = 14
_PUSH_SPAN_CAP = 19   # transposed-placement push compiles to span 19
# The adaptive kernel carries extra VMEM (alignment-slop box margins,
# dynamic de-residue rolls): spans (13,13,14) measured 17.98M scoped
# VMEM on v5e (limit 16M), so its chunking cap sits lower.
_ADAPTIVE_SPAN_CAP = 12
# Second-order kernels: the fused hess pass holds one extra z-sum, a
# third plane family and six accumulators; the pushgrad splat holds
# three value streams and two plane families.  Caps verified compiled
# on v5e (scripts/tpu_prod_check.py second_order).
_HESS_SPAN_CAP = 12
_HESS_ADAPTIVE_SPAN_CAP = 10
_PUSHGRAD_SPAN_CAP = 14
_PUSHGRAD_ADAPTIVE_SPAN_CAP = 12


def _range_chunks(r, cap):
    smin, smax = r
    out = []
    s = smin
    while s <= smax:
        out.append((s, min(s + cap - 1, smax)))
        s += cap
    return out


def _chunk_ranges(full, orders, cap):
    """(geometry_ranges, active_ranges, d0_ranges) per chunked launch
    for explicit full per-axis shift ranges, or None when the full
    window fits one launch.  Used for both the plain window (ranges
    from max_disp) and the adaptive residual window (ranges from
    tile_spread)."""
    import itertools
    if max(r[1] - r[0] + 1 for r in full) <= cap:
        return None
    d0_ranges = tuple((r[0], r[1] - o) for r, o in zip(full, orders))
    calls = []
    for sub in itertools.product(*[_range_chunks(r, cap) for r in full]):
        geo = tuple((min(a0, 0), max(a1, 0)) for a0, a1 in sub)
        calls.append((geo, sub, d0_ranges))
    return calls


def _chunk_calls(orders, md, cap):
    """Chunking triples for the plain (max_disp-sized) window."""
    full = tuple(window_range(o, m) for o, m in zip(orders, md))
    return _chunk_ranges(full, orders, cap)


def _lift3(inp, grid, orders, bounds, max_disp, spread, deriv=False):
    """Lift a D<3 dense warp into the 3-D kernels with ``3-D`` dummy
    leading axes (order 0, zero displacement, replicate bound — window
    span 1, no extra compute).  ``deriv``: the input carries a trailing
    per-axis component dim (pushgrad cotangents); dummy-axis components
    are zero.  Returns the lifted operands plus the tile to use."""
    D = grid.shape[-1]
    nd = 3 - D
    zeros = jnp.zeros(grid.shape[:-1] + (nd,), grid.dtype)
    grid = jnp.concatenate([zeros, grid], axis=-1)
    grid = grid.reshape((1,) * nd + grid.shape)
    if deriv:
        zv = jnp.zeros(inp.shape[:-1] + (nd,), inp.dtype)
        inp = jnp.concatenate([zv, inp], axis=-1)
    inp = inp.reshape((inp.shape[0],) + (1,) * nd + inp.shape[1:])
    orders = (0,) * nd + tuple(orders)
    bounds = (1,) * nd + tuple(bounds)
    md = (0.0,) * nd + _md_tuple(max_disp, D)
    spread = None if spread is None \
        else (0.0,) * nd + _md_tuple(spread, D)
    tile = (1, 8, 128) if nd == 1 else (1, 1, 128)
    return inp, grid, orders, bounds, md, spread, tile, nd


def _warp_chunks(orders, md, spread, cap):
    """Wide-window chunk triples (or None): a residual/plain window
    wider than the single-launch VMEM cap is CHUNKED into exact
    sub-range launches that sum (same per-tile bases in adaptive
    mode)."""
    if spread is not None:
        sp = _md_tuple(spread, len(orders))
        res = tuple(window_range(o, s) for o, s in zip(orders, sp))
        return _chunk_ranges(res, orders, cap)
    return _chunk_calls(orders, md, cap)


def _pallas_warp(inp, grid, orders, bounds, extrapolate, max_disp,
                 value, grad, spread=None, hess=False):
    """Dispatch into the fused 3-D Pallas pull/grad/hess kernel; 1-D and
    2-D warps are lifted with dummy leading axes (see :func:`_lift3`).
    Returns ``(val, g, h)`` (None where not requested)."""
    from .pallas_warp import warp_pallas
    D = grid.shape[-1]
    md = _md_tuple(max_disp, D)
    tile = None
    nd = 0
    if D < 3:
        (inp, grid, orders, bounds, md, spread, tile,
         nd) = _lift3(inp, grid, orders, bounds, max_disp, spread)
    if hess:
        cap = _HESS_ADAPTIVE_SPAN_CAP if spread is not None \
            else _HESS_SPAN_CAP
    else:
        cap = _ADAPTIVE_SPAN_CAP if spread is not None else _SPAN_CAP
    chunks = _warp_chunks(orders, md, spread, cap)

    def launch(**kw):
        outs = warp_pallas(inp, grid, tuple(orders), tuple(bounds),
                           extrapolate, md, value=value, grad=grad,
                           hess=hess, spread=spread, tile=tile, **kw)
        return outs if hess else outs + (None,)

    if chunks is not None:
        acc = None
        for geo, sub, d0r in chunks:
            o = launch(ranges_override=geo, active=sub, d0_ranges=d0r)
            acc = o if acc is None else tuple(
                a if b is None else a + b for a, b in zip(o, acc))
        val, g, h = acc
    else:
        val, g, h = launch()
    if nd:
        if val is not None:
            val = val.reshape((val.shape[0],) + val.shape[1 + nd:])
        if g is not None:
            g = g.reshape((g.shape[0],) + g.shape[1 + nd:])[..., nd:]
        if h is not None:
            h = h.reshape((h.shape[0],) + h.shape[1 + nd:])[..., nd:,
                                                            nd:]
    return val, g, h


def _pallas_push(inp, grid, orders, bounds, extrapolate, max_disp,
                 spread=None, deriv=False):
    """Dispatch into the 3-D Pallas splat kernel (plain push, or the
    pushgrad adjoint when ``deriv``); 1-D/2-D lifted like the pull."""
    from .pallas_warp import push_window_pallas
    D = grid.shape[-1]
    md = _md_tuple(max_disp, D)
    tile = None
    nd = 0
    if D < 3:
        (inp, grid, orders, bounds, md, spread, tile,
         nd) = _lift3(inp, grid, orders, bounds, max_disp, spread,
                      deriv=deriv)
    if deriv:
        cap = _PUSHGRAD_ADAPTIVE_SPAN_CAP if spread is not None \
            else _PUSHGRAD_SPAN_CAP
    else:
        cap = _ADAPTIVE_SPAN_CAP if spread is not None \
            else _PUSH_SPAN_CAP
    chunks = _warp_chunks(orders, md, spread, cap)

    def launch(**kw):
        return push_window_pallas(inp, grid, tuple(orders),
                                  tuple(bounds), extrapolate, md,
                                  spread=spread, deriv=deriv, tile=tile,
                                  **kw)

    if chunks is not None:
        out = None
        for geo, sub, d0r in chunks:
            o3 = launch(ranges_override=geo, active=sub, d0_ranges=d0r)
            out = o3 if out is None else out + o3
    else:
        out = launch()
    if nd:
        out = out.reshape((out.shape[0],) + out.shape[1 + nd:])
    return out


def _pull_impl(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if _should_pallas(ishape):
        val, _, _ = _pallas_warp(inp, grid, orders, bounds, extrapolate,
                                 max_disp, True, False, spread)
        return val
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    vpad = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)
    ranges, coefs = _coef_fields(grid, ishape, orders, max_disp, wdtype)
    out = _accumulate(vpad, ranges, coefs, lo, ishape,
                      lambda view, w: view * w[None])
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape((1,) + ishape)
    return out


def _grad_impl(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    """(C, *ishape, D) spatial gradients of the spline surface."""
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if _should_pallas(ishape):
        # fused kernel: all derivative fields from one pass over the
        # shift window (the boundary-folded pad already carries the
        # signs, so it serves gradients too)
        _, g, _ = _pallas_warp(inp, grid, orders, bounds, extrapolate,
                               max_disp, False, True, spread)
        return g
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    vpad = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)
    outs = []
    for da in range(D):
        ranges, coefs = _coef_fields(grid, ishape, orders, max_disp,
                                     wdtype, deriv_axis=da)
        outs.append(_accumulate(vpad, ranges, coefs, lo, ishape,
                                lambda view, w: view * w[None]))
    out = jnp.stack(outs, axis=-1)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape((1,) + ishape + (1,))
    return out


def _push_impl(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    """Exact adjoint of _pull_impl: splat values on the dense grid.

    inp: (C, *ishape) values at grid sites -> (C, *ishape) volume.
    Transpose of (pad -> shifted-FMA): scatter-free in the interior; the
    pad margins are folded back with static adds.

    ``spread``: adaptive per-tile bases on the Pallas tier (the splat
    window sized by the residual spread — template-learning d_input
    stays window-small); the XLA formulation ignores it (full window, a
    superset, identical for contract-honoring grids).
    """
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if _should_pallas(ishape):
        return _pallas_push(inp, grid, orders, bounds, extrapolate,
                            max_disp, spread)
    C = inp.shape[0]
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    ranges, coefs = _coef_fields(grid, ishape, orders, max_disp, wdtype)

    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    vals = inp.astype(wdtype)
    if mask is not None:
        vals = vals * mask.reshape((1,) + ishape)

    pshape = tuple(n + l + h for n, l, h in zip(ishape, lo, hi))
    acc = jnp.zeros((C,) + pshape, wdtype)
    spans = [range(r[1] - r[0] + 1) for r in ranges]
    for ks in itertools.product(*spans):
        w = None
        for d, k in enumerate(ks):
            cd = coefs[d][k]
            w = cd if w is None else w * cd
        idx = [slice(None)]
        for d in range(D):
            start = lo[d] + ranges[d][0] + ks[d]
            idx.append(slice(start, start + ishape[d]))
        acc = acc.at[tuple(idx)].add(vals * w[None])

    return _fold_pad_margins(acc, ishape, bounds, lo, hi, wdtype)


def _fold_pad_margins(acc, ishape, bounds, lo, hi, wdtype):
    """Adjoint of :func:`_pad_folded`: fold pad margins back into the
    volume through the boundary (index scatter-add + signs; static
    tables).  ``acc``: (..., *padded_shape) -> (..., *ishape)."""
    D = len(ishape)
    out = acc
    for d in range(D):
        n = ishape[d]
        axis = out.ndim - D + d
        idx = np.arange(-lo[d], n + hi[d])
        folded = fold_index(idx, n, bounds[d], xp=np)
        sign = fold_sign(idx, n, bounds[d], wdtype, xp=np)
        if sign is not None:
            shape = [1] * out.ndim
            shape[axis] = idx.size
            out = out * jnp.asarray(sign).reshape(shape)
        seg = jnp.zeros(out.shape[:axis] + (n,) + out.shape[axis + 1:],
                        wdtype)
        out = seg.at[(slice(None),) * axis + (jnp.asarray(folded),)].add(out)
    return out


# --------------------------------------- second-order windowed primitives
# These serve grad_window's backward (mirroring ops/pushpull.py's
# pushgrad/hess, reference interpol/pushpull.py:176-233, 303-325).  Both
# carry custom VJPs and dispatch to native Pallas kernels on the fast
# backend (warp_pallas hess mode / push_window_pallas deriv mode) — the
# production-scale path for Jacobian/bending-energy regularizers, whose
# training backward evaluates these forwards at full volume.  The XLA
# shifted-FMA formulations remain the correctness tier; at large volumes
# they stream x-slabs (rematerialized blocks) so coefficient-field
# memory stays bounded instead of scaling with S * volume.

# x-slab size for the streamed XLA window formulations: each slab's
# coefficient fields are ~(3 axes * S shifts * slab) floats; 2M voxels
# keeps that under ~1 GB for any cap-sized window.
_XLA_SLAB_VOX = 1 << 21


def _x_slabs(ishape):
    """Leading-axis slab spans for the streamed XLA formulation, or
    None when the volume is small enough for one shot."""
    numel = math.prod(ishape)
    if len(ishape) < 2 or numel <= 2 * _XLA_SLAB_VOX:
        return None
    rest = numel // ishape[0]
    bx = max(1, _XLA_SLAB_VOX // max(1, rest))
    if bx >= ishape[0]:
        return None
    return [(x, min(x + bx, ishape[0])) for x in range(0, ishape[0], bx)]


def _shift_grid_x(grid_b, x0):
    """Shift the leading-axis coordinate into slab-local frame (integer
    shift: tap weights are translation-invariant, and _coef_fields'
    voxel iota is slab-local)."""
    if x0 == 0:
        return grid_b
    return jnp.concatenate([grid_b[..., :1] - x0, grid_b[..., 1:]], -1)


def _pushgrad_xla(inp, grid, orders, bounds, extrapolate, max_disp):
    """XLA shifted-FMA pushgrad (adjoint of grad_window): splat per-axis
    cotangents through the derivative coefficient fields.  Reference
    contract: interpol/pushpull.py:176-203 (grid_pushgrad)."""
    D = grid.shape[-1]
    ishape = tuple(grid.shape[:-1])
    C = inp.shape[0]
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    vals = inp.astype(wdtype)
    if mask is not None:
        vals = vals * mask.reshape((1,) + ishape + (1,))

    def slab(vals_b, grid_b):
        bshape = tuple(grid_b.shape[:-1])
        pshape = tuple(n + l + h for n, l, h in zip(bshape, lo, hi))
        acc = jnp.zeros((C,) + pshape, wdtype)
        for da in range(D):
            ranges, coefs = _coef_fields(grid_b, bshape, orders,
                                         max_disp, wdtype,
                                         deriv_axes=(da,))
            spans = [range(r[1] - r[0] + 1) for r in ranges]
            for ks in itertools.product(*spans):
                w = None
                for d, k in enumerate(ks):
                    cd = coefs[d][k]
                    w = cd if w is None else w * cd
                idx = [slice(None)]
                for d in range(D):
                    start = lo[d] + ranges[d][0] + ks[d]
                    idx.append(slice(start, start + bshape[d]))
                acc = acc.at[tuple(idx)].add(vals_b[..., da] * w[None])
        return acc

    slabs = _x_slabs(ishape)
    if slabs is None:
        acc = slab(vals, grid)
    else:
        pshape = tuple(n + l + h for n, l, h in zip(ishape, lo, hi))
        acc = jnp.zeros((C,) + pshape, wdtype)
        for x0, x1 in slabs:
            accb = jax.checkpoint(slab)(vals[:, x0:x1],
                                        _shift_grid_x(grid[x0:x1], x0))
            acc = acc.at[:, x0:x0 + accb.shape[1]].add(accb)
    return _fold_pad_margins(acc, ishape, bounds, lo, hi, wdtype)


def _hess_xla(inp, grid, orders, bounds, extrapolate, max_disp):
    """XLA shifted-FMA spatial Hessian of the spline surface.
    Reference contract: interpol/pushpull.py:206-233 via grid_hess /
    nd.py:367-464."""
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    vpad = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)

    def slab(vpad_b, grid_b):
        bshape = tuple(grid_b.shape[:-1])
        uniq = {}
        for d in range(D):
            for d2 in range(d, D):
                kw = dict(deriv2_axis=d) if d == d2 \
                    else dict(deriv_axes=(d, d2))
                ranges, coefs = _coef_fields(grid_b, bshape, orders,
                                             max_disp, wdtype, **kw)
                uniq[(d, d2)] = _accumulate(
                    vpad_b, ranges, coefs, lo, bshape,
                    lambda view, w: view * w[None])
        rows = [jnp.stack([uniq[(min(d, d2), max(d, d2))]
                           for d2 in range(D)], axis=-1)
                for d in range(D)]
        return jnp.stack(rows, axis=-2)

    slabs = _x_slabs(ishape)
    if slabs is None:
        out = slab(vpad, grid)
    else:
        ax = vpad.ndim - D
        parts = []
        for x0, x1 in slabs:
            sl = [slice(None)] * vpad.ndim
            sl[ax] = slice(x0, x1 + lo[0] + hi[0])
            parts.append(jax.checkpoint(slab)(
                vpad[tuple(sl)], _shift_grid_x(grid[x0:x1], x0)))
        out = jnp.concatenate(parts, axis=ax)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape((1,) + ishape + (1, 1))
    return out


def _pushgrad_impl(inp, grid, orders, bounds, extrapolate, max_disp,
                   spread=None):
    ishape = tuple(grid.shape[:-1])
    if _should_pallas(ishape):
        return _pallas_push(inp, grid, orders, bounds, extrapolate,
                            max_disp, spread, deriv=True)
    return _pushgrad_xla(inp, grid, orders, bounds, extrapolate,
                         max_disp)


def _hess_impl(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if _should_pallas(ishape):
        _, _, h = _pallas_warp(inp, grid, orders, bounds, extrapolate,
                               max_disp, False, False, spread,
                               hess=True)
        return h
    return _hess_xla(inp, grid, orders, bounds, extrapolate, max_disp)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pushgrad_window(inp, grid, orders, bounds, extrapolate, max_disp,
                    spread=None):
    """Adjoint of :func:`grad_window`: splat per-axis cotangents through
    the derivative coefficient fields.

    inp: (C, *ishape, D) cotangents of the spatial gradient at grid
    sites -> (C, *ishape) volume.  Reference contract:
    interpol/pushpull.py:176-203 (grid_pushgrad).  ``spread``: adaptive
    per-tile splat windows on the Pallas tier (same residual-window
    semantics as push_window).
    """
    return _pushgrad_impl(inp, grid, orders, bounds, extrapolate,
                          max_disp, spread)


def _pushgradw_fwd(inp, grid, orders, bounds, extrapolate, max_disp,
                   spread=None):
    return pushgrad_window(inp, grid, orders, bounds, extrapolate,
                           max_disp, spread), (inp, grid)


def _pushgradw_bwd(orders, bounds, extrapolate, max_disp, spread, res,
                   ct):
    inp, grid = res
    # pushgrad <-> grad are mutual adjoints (pull <-> push one
    # derivative up), and the grid cotangent composes the Hessian
    # fields pulled from ct against the splatted values — the same
    # structure as push's backward with every op one order higher.
    d_inp = grad_window(ct, grid, orders, bounds, extrapolate, max_disp,
                        spread)
    h = hess_window(ct, grid, orders, bounds, extrapolate, max_disp,
                    spread)
    d_grid = (h * inp[..., None]).sum(axis=(0, -2))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


pushgrad_window.defvjp(_pushgradw_fwd, _pushgradw_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def hess_window(inp, grid, orders, bounds, extrapolate, max_disp,
                spread=None):
    """Spatial Hessian of the spline surface on the dense grid.

    inp: (C, *ishape) -> (C, *ishape, D, D), symmetric in the last two
    axes (serves grad_window's grid-VJP; reference contract:
    interpol/pushpull.py:206-233 via grid_hess / nd.py:367-464).
    ``spread``: adaptive per-tile windows on the Pallas tier.
    """
    return _hess_impl(inp, grid, orders, bounds, extrapolate, max_disp,
                      spread)


def _hessw_fwd(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    return hess_window(inp, grid, orders, bounds, extrapolate, max_disp,
                       spread), (inp, grid)


def _hessw_bwd(orders, bounds, extrapolate, max_disp, spread, res, ct):
    # Third-order territory (beyond the reference, whose pushgrad/hess
    # have no backward of their own): differentiate the exact XLA
    # formulation.  The slab streaming + per-slab rematerialization in
    # _hess_xla bounds the linearization's memory at large volumes.
    inp, grid = res
    out, vjp = jax.vjp(
        lambda i, g: _hess_xla(i, g, orders, bounds, extrapolate,
                               max_disp), inp, grid)
    d_inp, d_grid = vjp(ct.astype(out.dtype))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


hess_window.defvjp(_hessw_fwd, _hessw_bwd)


# ------------------------------------------------------------ VJP wiring
# (mirrors ops/pushpull.py / reference pushpull.py:237-282)

# NOTE on second-order AD: each fwd below re-calls the custom_vjp'd
# function itself (not the raw impl).  jax.vjp inlines fwd's trace into
# the primal graph, so a fwd that called the raw impl would expose the
# bare pallas_call to any OUTER differentiation (rev-of-rev) — the exact
# round-2 crash.  Re-calling the wrapped op keeps the custom rule in the
# inlined graph at every differentiation order.

def _pull_fwd(inp, grid, orders, bounds, extrapolate, max_disp,
              spread=None):
    return pull_window(inp, grid, orders, bounds, extrapolate, max_disp,
                       spread), (inp, grid)


def _pull_bwd(orders, bounds, extrapolate, max_disp, spread, res, ct):
    inp, grid = res
    # d_inp via the adjoint push — spread-aware on the native tier, so
    # template-learning gradients w.r.t. the moving image stay
    # residual-window-sized (VERDICT r2 #7); exact for
    # contract-honoring grids (the documented adaptive semantics)
    d_inp = push_window(ct, grid, orders, bounds, extrapolate, max_disp,
                        spread)
    g = grad_window(inp, grid, orders, bounds, extrapolate, max_disp,
                    spread)
    d_grid = (g * ct[..., None]).sum(axis=0)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


pull_window.defvjp(_pull_fwd, _pull_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def push_window(inp, grid, orders, bounds, extrapolate, max_disp,
                spread=None):
    """Dense-grid splat (exact adjoint of pull_window).  ``spread``:
    adaptive per-tile splat windows on the Pallas tier."""
    return _push_impl(inp, grid, orders, bounds, extrapolate, max_disp,
                      spread)


def _push_fwd(inp, grid, orders, bounds, extrapolate, max_disp,
              spread=None):
    return push_window(inp, grid, orders, bounds, extrapolate, max_disp,
                       spread), (inp, grid)


def _push_bwd(orders, bounds, extrapolate, max_disp, spread, res, ct):
    inp, grid = res
    d_inp = pull_window(ct, grid, orders, bounds, extrapolate, max_disp,
                        spread)
    g = grad_window(ct, grid, orders, bounds, extrapolate, max_disp,
                    spread)
    d_grid = (g * inp[..., None]).sum(axis=0)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


push_window.defvjp(_push_fwd, _push_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grad_window(inp, grid, orders, bounds, extrapolate, max_disp,
                spread=None):
    """Dense-grid spatial gradients of the spline surface.

    Carries its own ``custom_vjp`` (d_inp via :func:`pushgrad_window`,
    d_grid via :func:`hess_window` — reference pushpull.py:303-325): the
    forward may run the Pallas fused kernel, which has no autodiff rule,
    so ``jax.grad`` through ``grid_grad(max_disp=...)`` and second-order
    derivatives of ``pull_window``/``push_window`` (whose backwards call
    this op) must never differentiate through the kernel launch."""
    return _grad_impl(inp, grid, orders, bounds, extrapolate, max_disp,
                      spread)


def _gradw_fwd(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    return grad_window(inp, grid, orders, bounds, extrapolate, max_disp,
                       spread), (inp, grid)


def _gradw_bwd(orders, bounds, extrapolate, max_disp, spread, res, ct):
    inp, grid = res
    # spread-aware adjoints: adaptive-window training that
    # differentiates through grid_grad pays the residual window in the
    # backward too (exact for contract-honoring grids — the documented
    # adaptive semantics, same policy as _pull_bwd)
    d_inp = pushgrad_window(ct, grid, orders, bounds, extrapolate,
                            max_disp, spread)
    h = hess_window(inp, grid, orders, bounds, extrapolate, max_disp,
                    spread)
    d_grid = (h * ct[..., None]).sum(axis=(0, -2))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


grad_window.defvjp(_gradw_fwd, _gradw_bwd)
