"""Interpolating B-spline coefficients (IIR prefilter), TPU-native.

Computes the exact interpolating coefficients c such that sampling the
spline built on c at integer positions reproduces the input — the classic
Unser/Thevenaz cascade of first-order causal+anticausal recursions per pole
[Unser, Aldroubi & Eden, IEEE TSP 41(2), 1993; Unser, IEEE SPM 16(6), 1999],
with the closed-form initial/final boundary conditions for DCT1 ("mirror"),
DCT2 ("reflect") and DFT ("wrap").  Capability parity with the reference's
interpol/coeff.py (poles: coeff.py:34-65, gain: 68-73, boundary conditions:
82-227, cascade: 257-284, bound aliasing zero->dct1 / replicate->dct2:
237-254); like the reference, other boundaries raise NotImplementedError.

The TPU-native part is *how* the recursion runs.  The reference executes a
Python-level sequential loop per element (coeff.py:275-281) — the single
most accelerator-hostile construct in that codebase.  Two strategies:

1. **Matrix path** (default, axis length n <= _MATRIX_MAX): the whole
   per-axis cascade — gain, every pole's causal+anticausal passes, and
   the boundary initial/final conditions — is one fixed linear operator
   on a line.  Its (n, n) matrix is built once per (n, order, bound) at
   trace time by running the exact scalar recursion on the identity in
   float64 numpy (cached), and the filter becomes a single MXU matmul
   per axis: one pass over the data, zero sequential dependence, exact
   transpose for the VJP.  O(n) FLOPs per voxel, but they ride the MXU
   against an HBM-bandwidth-bound problem.

2. **Blocked-scan path** (n > _MATRIX_MAX): the recurrence

    h[i] = x[i] + p * h[i-1]

is evaluated one *chunk* of K elements at a time with a lower-triangular
Toeplitz matrix of pole powers, T[i,j] = p^(i-j):

    h_chunk = T @ x_chunk + p^(1..K) * carry ,   carry' = h_chunk[-1]

i.e. a (K x K) matmul on the MXU per chunk, vectorized over every other
axis (the "lines", which are independent: coeff.py:344-345), and a
``lax.scan`` of length n/K for the serial dependence.  Because |p| < 1,
p^K underflows long before K = 128, so the matmul is *exact* in floating
point; the op does K x more FLOPs than the scalar recursion but those are
MXU FLOPs against an HBM-bandwidth-bound problem — a single pass over the
data instead of the log(n) passes of ``associative_scan``.

Differentiation: the filter is linear, so its VJP is its exact transpose
(derived by reverse-mode through the linear forward, see ``_coeff_bwd``),
encoded as a ``custom_vjp``.
For dct2/dft boundaries the filter is self-adjoint and this coincides with
the reference's backward ("apply the same filter to the cotangent",
autograd.py:299-305); for dct1 the filter is *not* exactly self-adjoint in
the plain dot product (the mirror extension weights edge samples
differently), so the reference's backward is a close approximation while
this one is exact — verified by the adjoint-identity test.
"""
from __future__ import annotations

import functools
import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..options import BoundType

__all__ = [
    "get_poles", "get_gain", "spline_coeff", "spline_coeff_nd",
]

# Chunk size of the blocked recurrence. 128 matches the MXU/lane width;
# |pole| <= 0.54 for all orders, so pole^128 ~ 1e-35 == 0 in fp32/fp64 and
# the truncated Toeplitz block is exact.
_CHUNK = 128


def get_poles(order: int) -> Tuple[float, ...]:
    """Poles of the direct B-spline filter for each order (Unser 1993 II,
    Table 1; reference coeff.py:34-65)."""
    if order in (0, 1):
        return ()
    if order == 2:
        return (math.sqrt(8.) - 3.,)
    if order == 3:
        return (math.sqrt(3.) - 2.,)
    if order == 4:
        return (
            math.sqrt(664. - math.sqrt(438976.)) + math.sqrt(304.) - 19.,
            math.sqrt(664. + math.sqrt(438976.)) - math.sqrt(304.) - 19.,
        )
    if order == 5:
        return (
            math.sqrt(67.5 - math.sqrt(4436.25)) + math.sqrt(26.25) - 6.5,
            math.sqrt(67.5 + math.sqrt(4436.25)) - math.sqrt(26.25) - 6.5,
        )
    if order == 6:
        return (
            -0.488294589303044755130118038883789062112279161239377608394,
            -0.081679271076237512597937765737059080653379610398148178525368,
            -0.00141415180832581775108724397655859252786416905534669851652709,
        )
    if order == 7:
        return (
            -0.5352804307964381655424037816816460718339231523426924148812,
            -0.122554615192326690515272264359357343605486549427295558490763,
            -0.0091486948096082769285930216516478534156925639545994482648003,
        )
    raise NotImplementedError(f"Unsupported spline order: {order}")


def get_gain(poles: Sequence[float]) -> float:
    """Overall gain of the filter cascade (reference coeff.py:68-73)."""
    lam = 1.
    for p in poles:
        lam *= (1. - p) * (1. - 1. / p)
    return lam


def _horizon(pole: float) -> int:
    """Truncation horizon: number of terms for |pole|^m < 1e-13
    (reference coeff.py:85 et al.: ceil(-30 / log|pole|))."""
    return int(math.ceil(-30. / math.log(abs(pole))))


def _powers(pole: float, start: int, stop: int, dtype) -> jnp.ndarray:
    return jnp.asarray(pole, dtype) ** jnp.arange(start, stop, dtype=dtype)


# ------------------------------------------------- boundary conditions
# All operate along ``axis`` of an arbitrary-rank array and return the
# array with that axis dropped (one initial value per line), in layout —
# no transposes.

def _tk(x: jnp.ndarray, axis: int, start: int, stop: int) -> jnp.ndarray:
    """Static slice [start:stop] along ``axis`` (negatives allowed)."""
    n = x.shape[axis]
    start %= n
    stop = n if stop is None else (stop if stop >= 0 else stop + n)
    return jax.lax.slice_in_dim(x, start, stop, axis=axis)


def _el(x: jnp.ndarray, axis: int, i: int) -> jnp.ndarray:
    """Element ``i`` along ``axis`` (axis dropped)."""
    return jax.lax.index_in_dim(x, i % x.shape[axis], axis=axis,
                                keepdims=False)


# On TPU the default f32 matmul runs in truncated-bf16 passes — far too
# coarse for an *exact* prefilter (the resize-identity contract).  Every
# contraction in this module pins full-f32 accumulation.
_PREC = jax.lax.Precision.HIGHEST


def _dotw(x: jnp.ndarray, w: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Contract ``w`` against ``axis`` of ``x`` (axis dropped)."""
    return jnp.tensordot(x, w, axes=((axis,), (0,)), precision=_PREC)


def _dct1_initial(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Mirror boundary, causal init (reference coeff.py:109-149)."""
    n = x.shape[axis]
    m = _horizon(pole)
    if m < n:
        w = _powers(pole, 0, m, x.dtype)
        return _dotw(_tk(x, axis, 0, m), w, axis)
    polen = pole ** (n - 1)
    out = _el(x, axis, 0) + polen * _el(x, axis, -1)
    if n > 2:
        k = jnp.arange(1, n - 1, dtype=x.dtype)
        pk = jnp.asarray(pole, x.dtype) ** k
        w = pk + (polen * polen) / pk
        out = out + _dotw(_tk(x, axis, 1, -1), w, axis)
    return out / (1. - pole ** (2 * (n - 1)))


def _dct2_initial(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Reflect boundary, causal init (ported math from scipy ni_splines.c
    via reference coeff.py:152-179)."""
    n = x.shape[axis]
    polen = pole ** n
    w = _powers(pole, 0, n, x.dtype)
    w = w + polen * w[::-1]
    out = _dotw(x, w, axis) * (pole / (1. - polen * polen))
    return out + _el(x, axis, 0)


def _dft_initial(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Wrap boundary, causal init (reference coeff.py:82-105)."""
    n = x.shape[axis]
    m = min(_horizon(pole), n)
    # sum_{k=1..m-1} p^k x[n-k]  ==  x[n-m+1 .. n-1] . [p^(m-1) .. p^1]
    w = _powers(pole, 1, m, x.dtype)[::-1]
    out = _dotw(_tk(x, axis, n - m + 1, None), w, axis) + _el(x, axis, 0)
    return out / (1. - pole ** m)


def _dct1_final(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Mirror boundary, anticausal init (reference coeff.py:210-216)."""
    return (pole * _el(x, axis, -2) + _el(x, axis, -1)) * (
        pole / (pole * pole - 1.))


def _dct2_final(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Reflect boundary, anticausal init (reference coeff.py:220-227)."""
    return _el(x, axis, -1) * (pole / (pole - 1.))


def _dft_final(x: jnp.ndarray, pole: float, axis: int) -> jnp.ndarray:
    """Wrap boundary, anticausal init (reference coeff.py:183-206)."""
    n = x.shape[axis]
    m = min(_horizon(pole), n)
    w = _powers(pole, 2, m + 1, x.dtype)
    out = _dotw(_tk(x, axis, 0, m - 1), w[:m - 1], axis) \
        + pole * _el(x, axis, -1)
    return out / (pole ** m - 1.)


def _coeff_bound(bound: int) -> str:
    """Alias interpolation bounds onto the three implemented filter bounds
    (reference coeff.py:230-254)."""
    bound = int(bound)
    if bound in (BoundType.zero, BoundType.dct1):
        return "dct1"
    if bound in (BoundType.replicate, BoundType.dct2):
        return "dct2"
    if bound == BoundType.dft:
        return "dft"
    raise NotImplementedError(
        "spline_coeff only implements dct1/dct2/dft boundary conditions "
        f"(and their zero/replicate aliases); got bound={bound}")


_INITIAL = {"dct1": _dct1_initial, "dct2": _dct2_initial, "dft": _dft_initial}
_FINAL = {"dct1": _dct1_final, "dct2": _dct2_final, "dft": _dft_final}


# ------------------------------------------------- matrix path
# Axis lengths up to this use the precomputed inverse-filter matrix; the
# (n, n) f32 constant costs n^2 * 4 B (16 MB at n = 2048).
_MATRIX_MAX = 2048


def _np_initial(x, pole: float, btype: str):
    """Causal init on numpy lines (axis 0), mirroring _INITIAL."""
    import numpy as np
    n = x.shape[0]
    m = _horizon(pole)
    if btype == "dct1":
        if m < n:
            w = pole ** np.arange(m)
            return w @ x[:m]
        polen = pole ** (n - 1)
        out = x[0] + polen * x[-1]
        if n > 2:
            k = np.arange(1, n - 1)
            pk = pole ** k
            out = out + (pk + (polen * polen) / pk) @ x[1:-1]
        return out / (1. - pole ** (2 * (n - 1)))
    if btype == "dct2":
        polen = pole ** n
        w = pole ** np.arange(n)
        w = w + polen * w[::-1]
        return (w @ x) * (pole / (1. - polen * polen)) + x[0]
    # dft
    m = min(m, n)
    w = (pole ** np.arange(1, m))[::-1]
    out = w @ x[n - m + 1:] if m > 1 else 0.
    return (out + x[0]) / (1. - pole ** m)


def _np_final(x, pole: float, btype: str):
    """Anticausal init on numpy lines (axis 0), mirroring _FINAL."""
    import numpy as np
    n = x.shape[0]
    if btype == "dct1":
        return (pole * x[-2] + x[-1]) * (pole / (pole * pole - 1.))
    if btype == "dct2":
        return x[-1] * (pole / (pole - 1.))
    m = min(_horizon(pole), n)
    w = pole ** np.arange(2, m + 1)
    out = w[:m - 1] @ x[:m - 1] + pole * x[-1]
    return out / (pole ** m - 1.)


def _filter_matrix_np(n: int, order: int, btype: str):
    """(n, n) float64 matrix of the full per-axis prefilter cascade,
    built by running the exact scalar recursion on the identity.

    The filter is linear, so applying it to I_n column-wise yields the
    operator exactly — including the truncated-horizon boundary
    initializations (reference coeff.py:82-227) and the gain."""
    import numpy as np
    poles = get_poles(order)
    x = np.eye(n) * get_gain(poles)
    for pole in poles:
        c = np.empty_like(x)
        c[0] = _np_initial(x, pole, btype)
        for i in range(1, n):
            c[i] = x[i] + pole * c[i - 1]
        d = np.empty_like(x)
        d[n - 1] = _np_final(c, pole, btype)
        for i in range(n - 2, -1, -1):
            d[i] = pole * (d[i + 1] - c[i])
        x = d
    return x


# bounded host-memory cache: each (n, n) f64 entry is up to 32 MB at
# n=2048, and pyramid workloads sweep many axis lengths — evict LRU
@functools.lru_cache(maxsize=32)
def _filter_matrix(n: int, order: int, btype: str):
    return _filter_matrix_np(n, order, btype)


# ------------------------------------------------- blocked recurrence

def _toeplitz(pole: float, k: int, dtype, anticausal: bool) -> jnp.ndarray:
    """T[i, j] = pole^(i-j) on the lower (causal) or pole^(j-i) on the
    upper (anticausal) triangle; 0 elsewhere."""
    i = jnp.arange(k)
    expo = i[:, None] - i[None, :]
    if anticausal:
        expo = -expo
    return jnp.where(expo >= 0, jnp.asarray(pole, dtype) ** expo, 0)


def _apply_T(T: jnp.ndarray, xc: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Contract T's second index against ``axis`` of xc, leaving the
    result index *in place* — a layout-preserving chunk matmul.  Leading
    and trailing axes lower to clean (k,k)@(k,N) / (M,k)@(k,k) MXU forms;
    middle axes lower to a batched matmul."""
    nd = xc.ndim
    if axis % nd == 0:
        return jnp.tensordot(T, xc, axes=((1,), (0,)), precision=_PREC)
    if axis % nd == nd - 1:
        return jnp.tensordot(xc, T, axes=((axis,), (1,)), precision=_PREC)
    letters = "abcdefghmnopqrstuvw"
    pre = letters[:axis]
    post = letters[axis:nd - 1]
    return jnp.einsum(f"ij,{pre}j{post}->{pre}i{post}", T, xc,
                      precision=_PREC)


def _chain_axis(x: jnp.ndarray, pole: float, first: jnp.ndarray,
                axis: int, anticausal: bool = False) -> jnp.ndarray:
    """First-order linear recurrence along ``axis``, in layout.

    causal:      h[0] = first;   h[i] = x[i] + pole*h[i-1]
    anticausal:  h[n-1] = first; h[i] = x[i] + pole*h[i+1]

    One pass over the data: chunks of K elements are solved with a
    triangular-Toeplitz (K x K) matmul on the MXU (exact: |pole| < 1 so
    pole^K underflows) plus a rank-1 carry term, scanning chunk index in
    recursion order and updating a preallocated buffer in place.
    """
    axis %= x.ndim
    n = x.shape[axis]
    if n == 1:
        return jnp.expand_dims(first, axis)
    # replace the seed element so the chunk matmul reproduces it exactly
    # (T row 0 is e0 for causal / row k-1 is e_{k-1} anticausal)
    seed_idx = n - 1 if anticausal else 0
    x = jax.lax.dynamic_update_slice_in_dim(
        x, jnp.expand_dims(first.astype(x.dtype), axis), seed_idx, axis)
    k = min(_CHUNK, n)
    nchunks = -(-n // k)
    pad = nchunks * k - n
    if pad:
        # zero-pad on the far side of the recursion start so pad lanes
        # never feed real outputs' carries
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (pad, 0) if anticausal else (0, pad)
        x = jnp.pad(x, cfg)
    T = _toeplitz(pole, k, x.dtype, anticausal)
    # carry enters chunk element i as pole^(i+1) (causal, carry = previous
    # chunk's last) or pole^(k-i) (anticausal, carry = next chunk's first)
    cp = _powers(pole, 1, k + 1, x.dtype)
    if anticausal:
        cp = cp[::-1]
    cshape = [1] * x.ndim
    cshape[axis] = k
    cp = cp.reshape(cshape)
    zero = jnp.zeros([d for i, d in enumerate(x.shape) if i != axis],
                     x.dtype)

    order = range(nchunks - 1, -1, -1) if anticausal else range(nchunks)

    def step(state, j):
        carry, out = state
        xc = jax.lax.dynamic_slice_in_dim(x, j * k, k, axis)
        h = _apply_T(T, xc, axis) + carry_term(carry)
        nxt = jax.lax.index_in_dim(h, 0 if anticausal else k - 1,
                                   axis=axis, keepdims=False)
        out = jax.lax.dynamic_update_slice_in_dim(out, h, j * k, axis)
        return (nxt, out), None

    def carry_term(c):
        return jnp.expand_dims(c, axis) * cp

    state = (zero, jnp.zeros_like(x))
    (_, out), _ = jax.lax.scan(step, state,
                               jnp.asarray(list(order), jnp.int32))
    if pad:
        out = jax.lax.slice_in_dim(out, pad if anticausal else 0,
                                   (pad + n) if anticausal else n,
                                   axis=axis)
    return out


def _filter_axis(x: jnp.ndarray, poles: Sequence[float], btype: str,
                 axis: int, order: int = None,
                 transpose: bool = False) -> jnp.ndarray:
    """Full prefilter cascade along ``axis``, transpose- and flip-free
    (reference filter(): coeff.py:257-284 runs a scalar Python loop).

    Matrix path for n <= _MATRIX_MAX (one MXU matmul per axis; see
    module docstring), blocked-scan path beyond.  ``transpose`` applies
    the exact adjoint (matrix path only; the scan path's adjoint is
    derived by autodiff in ``_coeff_bwd``)."""
    n = x.shape[axis]
    if n == 1:
        return x
    if order is not None and n <= _MATRIX_MAX:
        A = _filter_matrix(n, order, btype)
        if transpose:
            A = A.T
        if x.dtype == jnp.float64:
            Aj = jnp.asarray(A, jnp.float64)
            return _apply_T(Aj, x, axis % x.ndim)
        # compute in at least f32 (bf16 matmul would break the
        # resize-identity exactness contract)
        wdtype = jnp.promote_types(x.dtype, jnp.float32)
        Aj = jnp.asarray(A, wdtype)
        out = _apply_T(Aj, x.astype(wdtype), axis % x.ndim)
        return out.astype(x.dtype)
    if transpose:
        raise NotImplementedError  # handled by autodiff in _coeff_bwd
    x = x * jnp.asarray(get_gain(poles), x.dtype)
    for pole in poles:
        # causal pass
        c0 = _INITIAL[btype](x, pole, axis)
        c = _chain_axis(x, pole, c0, axis)
        # anticausal pass: d[n-1] = final(c); d[i] = pole*(d[i+1] - c[i])
        dn = _FINAL[btype](c, pole, axis)
        x = _chain_axis((-pole) * c, pole, dn, axis, anticausal=True)
    return x


# ------------------------------------------------- public ops

@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def spline_coeff(inp: jnp.ndarray, order: int, bound: int,
                 axis: int = -1) -> jnp.ndarray:
    """Interpolating spline coefficients along one axis.

    Orders 0/1 are the identity (reference coeff.py:309-310).
    ``bound`` must be dct1/dct2/dft or a zero/replicate alias.
    """
    return _coeff_impl(inp, order, bound, axis)


def _coeff_impl(inp, order, bound, axis):
    if order in (0, 1):
        return inp
    btype = _coeff_bound(bound)
    poles = get_poles(order)
    return _filter_axis(inp, poles, btype, axis % inp.ndim, order=order)


def _coeff_fwd(inp, order, bound, axis):
    return _coeff_impl(inp, order, bound, axis), None


def _coeff_bwd(order, bound, axis, _, ct):
    # The filter is linear: the VJP is its exact transpose.  For dct2/dft
    # the filter is self-adjoint, so the transpose *is* the filter (this is
    # also the reference's backward for all bounds, autograd.py:299-305).
    # dct1 is not exactly self-adjoint (mirror extension weights the edge
    # samples differently), so its transpose is derived by autodiff of the
    # linear forward — exact where the reference approximates.
    if order in (0, 1):
        return (ct,)
    btype = _coeff_bound(bound)
    n = ct.shape[axis % ct.ndim]
    if n > 1 and n <= _MATRIX_MAX:
        # matrix path: the exact adjoint is the transposed matrix
        return (_filter_axis(ct, get_poles(order), btype,
                             axis % ct.ndim, order=order,
                             transpose=True),)
    if btype in ("dct2", "dft"):
        return (_coeff_impl(ct, order, bound, axis),)
    # Scan path, dct1: ``jax.linear_transpose`` would be the direct
    # spelling, but this jax version cannot transpose the blocked
    # ``lax.scan`` standalone (ad.ValAccum leaks into the scan transpose
    # rule), so derive the pullback with ``jax.vjp`` at a zero primal
    # instead.  The unused primal cascade is dead code XLA eliminates
    # when this backward is traced under jit (the custom_vjp always is).
    f = lambda x: _coeff_impl(x, order, bound, axis)
    _, pullback = jax.vjp(f, jnp.zeros_like(ct))
    (dx,) = pullback(ct)
    return (dx,)


spline_coeff.defvjp(_coeff_fwd, _coeff_bwd)


def spline_coeff_nd(inp: jnp.ndarray, orders: Sequence[int],
                    bounds: Sequence[int], ndim: int) -> jnp.ndarray:
    """Interpolating spline coefficients along the last ``ndim`` axes,
    one separable sweep per axis (reference coeff.py:316-347)."""
    out = inp
    for d in range(ndim):
        out = spline_coeff(out, orders[d], bounds[d], axis=out.ndim - ndim + d)
    return out
