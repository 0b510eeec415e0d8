"""Separable fast path: spline sampling along factored (outer-product)
grids as per-axis dense matrix contractions on the MXU.

``resize`` / ``restrict`` grids are exactly separable — an outer product
of D 1-D affine sample lines (reference resize.py:92-109) — so instead of
scattering 4^D gathers per voxel, each axis is resampled with one
(out_n x in_n) **sampling matrix**

    S[o, i] = sign(o, j) * weight_order(line[o] - node(o, j)) summed over
              the taps j that fold onto input index i

applied as a tensordot over that axis.  On TPU this turns the whole op
into D dense matmuls (MXU, bf16/fp32) instead of HBM-hostile gathers —
the idiomatic mapping for resize/restrict/pyramids.  The same matrices
also give ``restrict`` (apply S^T: exactly the adjoint) and per-axis
derivative sampling.

Numerically identical to the gather path: the matrix is built from the
same fold/sign/weight primitives, just materialized densely per axis
(out_n x in_n is tiny compared to the volume).

Used automatically by resize/restrict when the backend allows; also
exposed for direct use on any separable grid.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .bounds import fold_index, fold_sign
from .splines import bspline_taps, node_origin

__all__ = ["sampling_matrix", "separable_pull", "separable_push"]


def sampling_matrix(line: jnp.ndarray, n_in: int, order: int, bound: int,
                    extrapolate: int = 1, deriv: int = 0) -> jnp.ndarray:
    """Dense 1-D spline sampling matrix S (len(line) x n_in).

    ``(S @ v)[o] == pull(v, line[o])`` for a 1-D signal v with the given
    order/bound/extrapolate semantics; ``deriv`` in {0, 1, 2} selects the
    weight / first- / second-derivative factors.
    """
    line = jnp.asarray(line)
    dtype = line.dtype
    n_out = line.shape[0]
    n0, t = node_origin(line, order)
    w, g, h = bspline_taps(t, order, grad=(deriv == 1), hess=(deriv == 2))
    taps = {0: w, 1: g, 2: h}[deriv]

    cols = jnp.arange(n_in)
    S = jnp.zeros((n_out, n_in), dtype)
    for j in range(order + 1):
        node = n0 + j
        idx = fold_index(node, n_in, bound)
        weight = taps[j]
        sign = fold_sign(node, n_in, bound, dtype)
        if sign is not None:
            weight = weight * sign
        # scatter-add the tap into its folded column (dense, tiny)
        S = S + jnp.where(cols[None, :] == idx[:, None],
                          weight[:, None], 0)
    if extrapolate != 1:
        thr = 0.05 if extrapolate == 0 else 0.55
        inb = jnp.logical_and(line > -thr, line < (n_in - 1) + thr)
        S = S * inb[:, None].astype(dtype)
    return S


def _axis_matrices(lines, ishape, orders, bounds, extrapolate):
    return [sampling_matrix(line, n, o, b, extrapolate)
            for line, n, o, b in zip(lines, ishape, orders, bounds)]


def separable_pull(inp: jnp.ndarray, lines: Sequence[jnp.ndarray],
                   orders: Tuple[int, ...], bounds: Tuple[int, ...],
                   extrapolate: int = 1) -> jnp.ndarray:
    """Sample ``inp (..., *ishape)`` on the outer-product grid of
    ``lines`` via per-axis matmuls.  Equivalent to grid_pull on
    ``stack(meshgrid(*lines), -1)``."""
    D = len(lines)
    ishape = inp.shape[-D:]
    mats = _axis_matrices(lines, ishape, orders, bounds, extrapolate)
    out = inp
    for d, S in enumerate(mats):
        axis = out.ndim - D + d
        out = jnp.moveaxis(
            jnp.tensordot(S.astype(out.dtype), out, axes=([1], [axis])),
            0, axis)
    return out


def separable_push(inp: jnp.ndarray, lines: Sequence[jnp.ndarray],
                   oshape: Tuple[int, ...],
                   orders: Tuple[int, ...], bounds: Tuple[int, ...],
                   extrapolate: int = 1) -> jnp.ndarray:
    """Adjoint of :func:`separable_pull`: splat ``inp (..., *len(lines))``
    onto ``oshape`` (per-axis S^T matmuls — scatter-free)."""
    D = len(lines)
    mats = _axis_matrices(lines, oshape, orders, bounds, extrapolate)
    out = inp
    for d, S in enumerate(mats):
        axis = out.ndim - D + d
        out = jnp.moveaxis(
            jnp.tensordot(S.T.astype(out.dtype), out, axes=([1], [axis])),
            0, axis)
    return out
