"""Generic N-D separable B-spline sampling kernels (correctness tier).

One implementation covers every dimensionality (1/2/3/...-D) and every
per-dimension order 0..7 / boundary combination — the capability surface of
the reference's three kernel files (interpol/nd.py, iso1.py, iso0.py), which
hand-unrolls 1D/2D/3D specializations the XLA compiler derives automatically
here.

Layout convention (kernel tier):
    input  : (C, *ishape)            channel-first, single batch element
    grid   : (P, D)                  flattened sample positions, voxel units
    output : (C, P) / (C, P, D) / (C, P, D, D)
Batching is added by ``jax.vmap`` in :mod:`interpol_tpu.ops.pushpull`.

Algorithm (mirrors the semantics of interpol/nd.py:80-464):
  1. per axis: node origin ``n0 = floor(g - (order-1)/2)`` and fraction
     ``t`` (interpol/nd.py:45-49); fold each of the ``order+1`` node indices
     through the boundary (index + sign); evaluate all tap weights (and
     optionally d/dx, d2/dx2 factors) with the Cox-de Boor recursion.
  2. iterate the cartesian product of taps: linearize indices, gather
     (pull-family) or scatter-add (push-family), multiply the separable
     weight product, accumulate.
  3. out-of-bounds masking for extrapolate in {0 = no, 2 = hist}
     (interpol/nd.py:10-27: inbounds iff g in (-thr, n-1+thr), with
     thr = 0.05 for "no" and 0.55 for "hist").

The tap-product iteration is a ``lax.scan`` over the (up to 8^D) nodes with
a small unroll factor, *not* a Python-unrolled loop: tracing one program
per node made compile time linear in the node count (the same
compile-explosion trap the reference documents for TorchScript,
pushpull.py:8-10).  With the scan, jaxpr size — and so compile time — is
independent of the spline order, while each step still processes all P
sample points vectorized.

Scatter-adds lower to XLA's deterministic TPU scatter, so the push family
is bit-reproducible (unlike the reference's CUDA ``scatter_add_``, see
interpol/tests/test_gradcheck_pushpull.py:12-18).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .bounds import fold_index, fold_sign
from .splines import bspline_taps, node_origin

__all__ = [
    "pull_core", "push_core", "count_core", "grad_core",
    "pushgrad_core", "hess_core", "inbounds_mask",
]


def _compute_dtypes(inp, grid):
    """(output dtype, internal compute dtype).

    Internal accumulation always runs in at least float32: two bf16
    inputs would otherwise accumulate up to (order+1)^D = 512 taps in
    bf16 — lossy and inconsistent with the window/Pallas tiers and with
    the reference's AMP policy (interpol/autograd.py:12-47 casts kernel
    inputs to fp32 under autocast).  The result is cast back to the
    naturally promoted input dtype.
    """
    out_dtype = jnp.result_type(inp.dtype, grid.dtype)
    return out_dtype, jnp.promote_types(out_dtype, jnp.float32)

# Node-product iteration strategy: fully unroll tiny products (e.g. the
# trilinear 8-corner loop) for the leanest possible program, and use a
# rolled scan (unroll=1) beyond that so jaxpr size — and compile time — is
# independent of the spline order.  (Unrolling the scan body further was
# measured to triple CPU compile time for no runtime benefit; revisit per
# backend in the perf tier.)
_UNROLL_LIMIT = 8
_SCAN_UNROLL = 1


def inbounds_mask(grid: jnp.ndarray, ishape: Sequence[int],
                  extrapolate: int, dtype) -> Optional[jnp.ndarray]:
    """(P,) mask of samples inside the volume, or None when extrapolating."""
    if extrapolate == 1:
        return None
    thr = 0.05 if extrapolate == 0 else 0.55
    mask = None
    for d, n in enumerate(ishape):
        g = grid[..., d]
        m = jnp.logical_and(g > -thr, g < (n - 1) + thr)
        mask = m if mask is None else jnp.logical_and(mask, m)
    return mask.astype(dtype)


class _TapTables:
    """Per-axis tap tables, stacked ``(order+1, P)`` for O(1) dynamic row
    selection inside the node scan.

    ``fold_shapes`` / ``shifts`` support distributed slab sharding
    (:mod:`interpol_tpu.parallel.spatial`): folding is computed against the
    *global* axis length ``fold_shapes[d]``, then mapped into local
    (halo-extended) buffer coordinates as
    ``(folded + shifts[d]) % fold_shapes[d]`` — which lands circular (dft)
    edge folds in the ring-exchanged halos.  ``ishape`` remains the local
    buffer shape used for gather/scatter linearization.
    """

    def __init__(self, grid, ishape, orders, bounds,
                 need_grad, need_hess, wdtype,
                 fold_shapes=None, shifts=None):
        self.D = grid.shape[-1]
        self.taps = tuple(o + 1 for o in orders)
        fold_shapes = tuple(fold_shapes) if fold_shapes is not None \
            else tuple(ishape)
        shifts = shifts if shifts is not None else (None,) * self.D
        self.idx: List[jnp.ndarray] = []
        self.w: List[jnp.ndarray] = []
        self.g: List[Optional[jnp.ndarray]] = []
        self.h: List[Optional[jnp.ndarray]] = []
        self.sign: List[Optional[jnp.ndarray]] = []
        for d, (order, bound) in enumerate(zip(orders, bounds)):
            n = fold_shapes[d]
            gpos = grid[..., d].astype(wdtype)
            n0, t = node_origin(gpos, order)
            w, gr, he = bspline_taps(t, order, grad=need_grad,
                                     hess=need_hess)
            idxs, signs = [], []
            any_sign = False
            for j in range(order + 1):
                node = n0 + j
                s = fold_sign(node, n, bound, wdtype)
                signs.append(s)
                any_sign = any_sign or (s is not None)
                folded = fold_index(node, n, bound)
                if shifts[d] is not None:
                    folded = jnp.remainder(folded + shifts[d], n)
                idxs.append(folded)
            self.idx.append(jnp.stack(idxs))
            self.w.append(jnp.stack(w))
            self.g.append(jnp.stack(gr) if gr is not None else None)
            self.h.append(jnp.stack(he) if he is not None else None)
            self.sign.append(jnp.stack(signs) if any_sign else None)

        # row-major linearization strides (over the local buffer shape)
        self.strides = [1] * self.D
        for d in range(self.D - 2, -1, -1):
            self.strides[d] = self.strides[d + 1] * ishape[d + 1]

    @property
    def num_nodes(self) -> int:
        return math.prod(self.taps)

    def decompose(self, j):
        """Traced flat node id -> per-axis tap ids (static arithmetic)."""
        jds = [None] * self.D
        rem = j
        for d in range(self.D - 1, -1, -1):
            if d > 0:
                jds[d] = rem % self.taps[d]
                rem = rem // self.taps[d]
            else:
                jds[d] = rem
        return jds

    def select(self, j):
        """Linear gather index, sign (or None), and per-axis selected
        weight/grad/hess rows for traced node id ``j``."""
        jds = self.decompose(j)
        lin = None
        sign = None
        rows = []
        for d in range(self.D):
            jd = jds[d]
            idx = jax.lax.dynamic_index_in_dim(self.idx[d], jd, 0, False)
            term = idx * self.strides[d] if self.strides[d] != 1 else idx
            lin = term if lin is None else lin + term
            if self.sign[d] is not None:
                s = jax.lax.dynamic_index_in_dim(self.sign[d], jd, 0, False)
                sign = s if sign is None else sign * s
            row = {"w": jax.lax.dynamic_index_in_dim(self.w[d], jd, 0, False)}
            if self.g[d] is not None:
                row["g"] = jax.lax.dynamic_index_in_dim(self.g[d], jd, 0,
                                                        False)
            if self.h[d] is not None:
                row["h"] = jax.lax.dynamic_index_in_dim(self.h[d], jd, 0,
                                                        False)
            rows.append(row)
        return lin, sign, rows

    def weight(self, rows, deriv=(), deriv2=None):
        """Separable product with derivative factors on selected axes:
        axes in ``deriv`` take the grad row; ``deriv2`` takes the hess
        row."""
        out = None
        for d, row in enumerate(rows):
            if deriv2 is not None and d == deriv2:
                f = row["h"]
            elif d in deriv:
                f = row["g"]
            else:
                f = row["w"]
            out = f if out is None else out * f
        return out


def _scan_nodes(tables: _TapTables, body, init):
    """Run ``body(carry, j)`` over all nodes: fully unrolled when the
    product is tiny, rolled ``lax.scan`` otherwise."""
    N = tables.num_nodes
    if N <= _UNROLL_LIMIT:
        carry = init
        for j in range(N):
            carry = body(carry, j)   # static j: selections become slices
        return carry

    def step(carry, j):
        return body(carry, j), None

    out, _ = jax.lax.scan(step, init, jnp.arange(N), unroll=_SCAN_UNROLL)
    return out


def pull_core(inp: jnp.ndarray, grid: jnp.ndarray,
              orders: Tuple[int, ...], bounds: Tuple[int, ...],
              extrapolate: int,
              fold_shapes=None, shifts=None) -> jnp.ndarray:
    """Sample ``inp`` at ``grid`` positions.  (C, *ishape), (P, D) -> (C, P).

    Reference semantics: interpol/nd.py:80-143.
    """
    D = grid.shape[-1]
    ishape = inp.shape[-D:]
    C = inp.shape[0]
    out_dtype, wdtype = _compute_dtypes(inp, grid)
    inp2 = inp.reshape(C, math.prod(ishape)).astype(wdtype)

    mask = inbounds_mask(grid, fold_shapes or ishape, extrapolate, wdtype)
    tb = _TapTables(grid, ishape, orders, bounds, False, False, wdtype,
                    fold_shapes, shifts)

    def body(out, j):
        lin, sign, rows = tb.select(j)
        w = tb.weight(rows)
        if sign is not None:
            w = w * sign
        return out + inp2[:, lin] * w[None]

    out = _scan_nodes(tb, body, jnp.zeros((C, grid.shape[0]), dtype=wdtype))
    if mask is not None:
        out = out * mask[None]
    return out.astype(out_dtype)


def push_core(inp: jnp.ndarray, grid: jnp.ndarray, oshape: Tuple[int, ...],
              orders: Tuple[int, ...], bounds: Tuple[int, ...],
              extrapolate: int,
              fold_shapes=None, shifts=None) -> jnp.ndarray:
    """Splat values ``inp`` at ``grid`` positions (pull adjoint).

    (C, P), (P, D) -> (C, *oshape).  Reference: interpol/nd.py:146-213.
    """
    C = inp.shape[0]
    V = math.prod(oshape)
    out_dtype, wdtype = _compute_dtypes(inp, grid)

    mask = inbounds_mask(grid, fold_shapes or oshape, extrapolate, wdtype)
    tb = _TapTables(grid, oshape, orders, bounds, False, False, wdtype,
                    fold_shapes, shifts)

    val0 = inp.astype(wdtype)
    if mask is not None:
        val0 = val0 * mask[None]

    def body(out, j):
        lin, sign, rows = tb.select(j)
        w = tb.weight(rows)
        if sign is not None:
            w = w * sign
        return out.at[:, lin].add(val0 * w[None])

    out = _scan_nodes(tb, body, jnp.zeros((C, V), dtype=wdtype))
    return out.reshape((C,) + tuple(oshape)).astype(out_dtype)


def count_core(grid: jnp.ndarray, oshape: Tuple[int, ...],
               orders: Tuple[int, ...], bounds: Tuple[int, ...],
               extrapolate: int) -> jnp.ndarray:
    """Splat unit weights: (P, D) -> (1, *oshape).

    Reference: interpol/pushpull.py:106-142 (push of ones).
    """
    ones = jnp.ones((1, grid.shape[0]), dtype=grid.dtype)
    return push_core(ones, grid, oshape, orders, bounds, extrapolate)


def grad_core(inp: jnp.ndarray, grid: jnp.ndarray,
              orders: Tuple[int, ...], bounds: Tuple[int, ...],
              extrapolate: int,
              fold_shapes=None, shifts=None) -> jnp.ndarray:
    """Spatial gradient of the spline surface sampled at ``grid``.

    (C, *ishape), (P, D) -> (C, P, D).  Reference: interpol/nd.py:216-288.
    """
    D = grid.shape[-1]
    ishape = inp.shape[-D:]
    C = inp.shape[0]
    out_dtype, wdtype = _compute_dtypes(inp, grid)
    inp2 = inp.reshape(C, math.prod(ishape)).astype(wdtype)

    mask = inbounds_mask(grid, fold_shapes or ishape, extrapolate, wdtype)
    tb = _TapTables(grid, ishape, orders, bounds, True, False, wdtype,
                    fold_shapes, shifts)

    def body(out, j):
        lin, sign, rows = tb.select(j)
        val = inp2[:, lin]
        if sign is not None:
            val = val * sign[None]
        terms = [val * tb.weight(rows, deriv=(d,))[None] for d in range(D)]
        return out + jnp.stack(terms, axis=-1)

    out = _scan_nodes(
        tb, body, jnp.zeros((C, grid.shape[0], D), dtype=wdtype))
    if mask is not None:
        out = out * mask[None, :, None]
    return out.astype(out_dtype)


def pushgrad_core(inp: jnp.ndarray, grid: jnp.ndarray,
                  oshape: Tuple[int, ...],
                  orders: Tuple[int, ...], bounds: Tuple[int, ...],
                  extrapolate: int) -> jnp.ndarray:
    """Adjoint of :func:`grad_core` (used by grid_grad's input-VJP).

    (C, P, D), (P, D) -> (C, *oshape).  Reference: interpol/nd.py:291-364.
    """
    D = grid.shape[-1]
    C = inp.shape[0]
    V = math.prod(oshape)
    out_dtype, wdtype = _compute_dtypes(inp, grid)

    mask = inbounds_mask(grid, oshape, extrapolate, wdtype)
    tb = _TapTables(grid, oshape, orders, bounds, True, False, wdtype)

    inp = inp.astype(wdtype)
    if mask is not None:
        inp = inp * mask[None, :, None]

    def body(out, j):
        lin, sign, rows = tb.select(j)
        acc = None
        for d in range(D):
            term = inp[..., d] * tb.weight(rows, deriv=(d,))[None]
            acc = term if acc is None else acc + term
        if sign is not None:
            acc = acc * sign[None]
        return out.at[:, lin].add(acc)

    out = _scan_nodes(tb, body, jnp.zeros((C, V), dtype=wdtype))
    return out.reshape((C,) + tuple(oshape)).astype(out_dtype)


def hess_core(inp: jnp.ndarray, grid: jnp.ndarray,
              orders: Tuple[int, ...], bounds: Tuple[int, ...],
              extrapolate: int) -> jnp.ndarray:
    """Spatial Hessian of the spline surface sampled at ``grid``.

    (C, *ishape), (P, D) -> (C, P, D, D), symmetric in the last two axes
    (used by grid_grad's grid-VJP).  Reference: interpol/nd.py:367-464.
    """
    D = grid.shape[-1]
    ishape = inp.shape[-D:]
    C = inp.shape[0]
    out_dtype, wdtype = _compute_dtypes(inp, grid)
    inp2 = inp.reshape(C, math.prod(ishape)).astype(wdtype)

    mask = inbounds_mask(grid, ishape, extrapolate, wdtype)
    tb = _TapTables(grid, ishape, orders, bounds, True, True, wdtype)
    P = grid.shape[0]

    def body(out, j):
        lin, sign, rows = tb.select(j)
        val = inp2[:, lin]
        if sign is not None:
            val = val * sign[None]
        # upper triangle including the diagonal, mirrored at the end
        cols = []
        for d in range(D):
            row_terms = []
            for d2 in range(D):
                lo, hi = min(d, d2), max(d, d2)
                if lo == hi:
                    w = tb.weight(rows, deriv2=lo)
                else:
                    w = tb.weight(rows, deriv=(lo, hi))
                row_terms.append(val * w[None])
            cols.append(jnp.stack(row_terms, axis=-1))
        return out + jnp.stack(cols, axis=-2)

    out = _scan_nodes(tb, body, jnp.zeros((C, P, D, D), dtype=wdtype))
    if mask is not None:
        out = out * mask[None, :, None, None]
    return out.astype(out_dtype)
