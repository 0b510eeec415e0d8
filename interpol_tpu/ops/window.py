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
    eligible = (default_tile(ishape) is not None or len(ishape) == 2)
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


def _pallas_warp(inp, grid, orders, bounds, extrapolate, max_disp,
                 value, grad, spread=None):
    """Dispatch into the 3-D Pallas kernel; 2-D warps are lifted with a
    dummy leading axis (order 0, zero displacement, window span 1 — no
    extra compute)."""
    from .pallas_warp import warp_pallas
    D = grid.shape[-1]
    md = _md_tuple(max_disp, D)
    if D == 3:
        if spread is not None:
            # a residual window wider than the single-launch VMEM cap is
            # CHUNKED exactly like the plain window: sub-range launches
            # over the residual shifts that sum (same per-tile base)
            sp = _md_tuple(spread, D)
            res = tuple(window_range(o, s) for o, s in zip(orders, sp))
            chunks = _chunk_ranges(res, orders, _ADAPTIVE_SPAN_CAP)
        else:
            chunks = _chunk_calls(orders, md, _SPAN_CAP)
        if chunks is not None:
            val = g = None
            for geo, sub, d0r in chunks:
                v, gg = warp_pallas(inp, grid, tuple(orders),
                                    tuple(bounds), extrapolate, md,
                                    value=value, grad=grad, spread=spread,
                                    ranges_override=geo, active=sub,
                                    d0_ranges=d0r)
                if value:
                    val = v if val is None else val + v
                if grad:
                    g = gg if g is None else g + gg
            return val, g
        return warp_pallas(inp, grid, tuple(orders), tuple(bounds),
                           extrapolate, md, value=value, grad=grad,
                           spread=spread)
    zeros = jnp.zeros(grid.shape[:-1] + (1,), grid.dtype)
    grid3 = jnp.concatenate([zeros, grid], axis=-1)[None]
    sp3 = None if spread is None else (0.0,) + _md_tuple(spread, D)
    val, g = warp_pallas(inp[:, None], grid3, (0,) + tuple(orders),
                         (1,) + tuple(bounds), extrapolate, (0.0,) + md,
                         value=value, grad=grad, spread=sp3,
                         tile=(1, 8, 128))
    if val is not None:
        val = val[:, 0]
    if g is not None:
        g = g[:, 0, ..., 1:]
    return val, g


def _pull_impl(inp, grid, orders, bounds, extrapolate, max_disp,
               spread=None):
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    if _should_pallas(ishape):
        val, _ = _pallas_warp(inp, grid, orders, bounds, extrapolate,
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
        _, g = _pallas_warp(inp, grid, orders, bounds, extrapolate,
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
        from .pallas_warp import push_window_pallas
        md = _md_tuple(max_disp, D)
        if D == 3:
            if spread is not None:
                sp = _md_tuple(spread, D)
                res = tuple(window_range(o, s)
                            for o, s in zip(orders, sp))
                chunks = _chunk_ranges(res, orders, _ADAPTIVE_SPAN_CAP)
            else:
                chunks = _chunk_calls(orders, md, _PUSH_SPAN_CAP)
            if chunks is not None:
                out = None
                for geo, sub, d0r in chunks:
                    o3 = push_window_pallas(
                        inp, grid, tuple(orders), tuple(bounds),
                        extrapolate, md, ranges_override=geo,
                        active=sub, d0_ranges=d0r, spread=spread)
                    out = o3 if out is None else out + o3
                return out
            return push_window_pallas(inp, grid, tuple(orders),
                                      tuple(bounds), extrapolate, md,
                                      spread=spread)
        if D == 2:
            zeros = jnp.zeros(grid.shape[:-1] + (1,), grid.dtype)
            grid3 = jnp.concatenate([zeros, grid], axis=-1)[None]
            out = push_window_pallas(
                inp[:, None], grid3, (0,) + tuple(orders),
                (1,) + tuple(bounds), extrapolate, (0.0,) + md,
                tile=(1, 8, 128))
            return out[:, 0]
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
# pushgrad/hess, reference interpol/pushpull.py:176-233, 303-325) and are
# plain jnp shifted-FMA programs: JAX differentiates their slices and
# static scatter-adds natively, so third- and higher-order derivatives
# through the windowed tier remain exact on every backend.

def pushgrad_window(inp, grid, orders, bounds, extrapolate, max_disp):
    """Adjoint of :func:`grad_window`: splat per-axis cotangents through
    the derivative coefficient fields.

    inp: (C, *ishape, D) cotangents of the spatial gradient at grid
    sites -> (C, *ishape) volume.  Reference contract:
    interpol/pushpull.py:176-203 (grid_pushgrad).
    """
    D = grid.shape[-1]
    ishape = tuple(grid.shape[:-1])
    C = inp.shape[0]
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    vals = inp.astype(wdtype)
    if mask is not None:
        vals = vals * mask.reshape((1,) + ishape + (1,))
    pshape = tuple(n + l + h for n, l, h in zip(ishape, lo, hi))
    acc = jnp.zeros((C,) + pshape, wdtype)
    for da in range(D):
        ranges, coefs = _coef_fields(grid, ishape, orders, max_disp,
                                     wdtype, deriv_axes=(da,))
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
            acc = acc.at[tuple(idx)].add(vals[..., da] * w[None])
    return _fold_pad_margins(acc, ishape, bounds, lo, hi, wdtype)


def hess_window(inp, grid, orders, bounds, extrapolate, max_disp):
    """Spatial Hessian of the spline surface on the dense grid.

    inp: (C, *ishape) -> (C, *ishape, D, D), symmetric in the last two
    axes (serves grad_window's grid-VJP; reference contract:
    interpol/pushpull.py:206-233 via grid_hess / nd.py:367-464).
    """
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    wdtype = jnp.result_type(inp.dtype, grid.dtype)
    lo, hi = _window_geom(orders, max_disp, D)
    vpad = _pad_folded(inp.astype(wdtype), ishape, bounds, lo, hi, wdtype)
    uniq = {}
    for d in range(D):
        for d2 in range(d, D):
            kw = dict(deriv2_axis=d) if d == d2 \
                else dict(deriv_axes=(d, d2))
            ranges, coefs = _coef_fields(grid, ishape, orders, max_disp,
                                         wdtype, **kw)
            uniq[(d, d2)] = _accumulate(vpad, ranges, coefs, lo, ishape,
                                        lambda view, w: view * w[None])
    rows = [jnp.stack([uniq[(min(d, d2), max(d, d2))] for d2 in range(D)],
                      axis=-1) for d in range(D)]
    out = jnp.stack(rows, axis=-2)
    mask = inbounds_mask(grid.reshape(-1, D), ishape, extrapolate, wdtype)
    if mask is not None:
        out = out * mask.reshape((1,) + ishape + (1, 1))
    return out


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
    # full-window adjoints: exact for contract-honoring grids (the
    # documented adaptive semantics, same policy as _pull_bwd)
    d_inp = pushgrad_window(ct, grid, orders, bounds, extrapolate,
                            max_disp)
    h = hess_window(inp, grid, orders, bounds, extrapolate, max_disp)
    d_grid = (h * ct[..., None]).sum(axis=(0, -2))
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


grad_window.defvjp(_gradw_fwd, _gradw_bwd)
