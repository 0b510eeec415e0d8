"""Uniform B-spline weights, derivatives and second derivatives, orders 0-7.

Capability parity with the reference's ``Spline`` class
(reference: interpol/splines.py:18-195), but a different algorithm: instead
of eight hand-written piecewise Horner polynomials selected by chained
``where``s, we evaluate the Cox-de Boor recursion *for all (order+1) support
taps at once*:

    level 0:  A_0 = 1                                 (u_0 = t - p/2 in [-1/2, 1/2))
    level k:  A_j^(k) = [ a_jk * A_{j-1}^(k-1) + b_jk * A_j^(k-1) ] / k
              a_jk = t - j + (2k + 1 - p)/2
              b_jk = (p + 1)/2 + j - t            (a_jk + b_jk = k + 1)

where ``t = g - floor(g - (p-1)/2)`` is the fractional position of the
sample relative to the first support node (the same node-origin convention
as the reference, interpol/nd.py:45-49).  After p levels, ``A_j^(p)`` equals
``beta_p(t - j)``, the weight of tap ``j``.  The derivative identities

    beta_p'(x)  = beta_{p-1}(x + 1/2) - beta_{p-1}(x - 1/2)
    beta_p''(x) = beta_{p-2}(x + 1) - 2 beta_{p-2}(x) + beta_{p-2}(x - 1)

give gradients and hessians as differences of the level p-1 / p-2 taps that
the recursion produces on the way, so one pass yields weight+grad+hess for
every tap with no branches at all — a purely fused multiply-add program on
the TPU VPU, identical in exact arithmetic to the closed-form piecewise
polynomials.

Note on the order-1 derivative: the reference's generic ``Spline(1).fastgrad``
returns ``sign(x)`` (interpol/splines.py:90-97), which is the *negative* of
the true derivative ``beta_1'(x) = -sign(x)`` — inconsistent with its own
hand-unrolled trilinear kernel (interpol/iso1.py grad3d, which uses forward
differences).  This implementation uses the true derivative everywhere.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

__all__ = [
    "node_origin",
    "bspline_taps",
    "bspline_weight",
    "bspline_grad",
    "bspline_hess",
]


def node_origin(g: jnp.ndarray, order: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First support node and fractional offset for sample positions ``g``.

    Returns ``(n0, t)`` with ``n0 = floor(g - (order-1)/2)`` (int32) and
    ``t = g - n0`` in ``[(order-1)/2, (order+1)/2)``; the support nodes are
    ``n0 .. n0+order`` (reference convention: interpol/nd.py:45-49).

    Order 0 uses round-half-to-even, matching the reference's
    nearest-neighbor kernels (``round().long()``, iso0.py:10-15) rather
    than its generic path's ``floor(g + 1/2)`` — the two differ only at
    exact half-voxel coordinates (e.g. integer-factor resize anchors),
    where the dedicated kernels define the reference behavior.
    """
    if order == 0:
        n0f = jnp.round(g)
    else:
        n0f = jnp.floor(g - (order - 1) / 2)
    t = g - n0f
    return n0f.astype(jnp.int32), t


def _tap_levels(t: jnp.ndarray, order: int, upto: int) -> List[List[jnp.ndarray]]:
    """Run the tap recursion up from level 0, returning levels ``upto..order``.

    Level ``k`` holds ``k+1`` arrays: ``A_j^(k) = beta_k(u_k - j)`` with
    ``u_k = t - (order - k)/2``.
    """
    p = order
    one = jnp.ones_like(t)
    level = [one]
    kept = {0: level}
    for k in range(1, p + 1):
        prev = level
        level = []
        for j in range(k + 1):
            left = prev[j - 1] if j >= 1 else None
            right = prev[j] if j <= k - 1 else None
            a = t - j + (2 * k + 1 - p) / 2
            b = (p + 1) / 2 + j - t
            if left is None:
                term = b * right
            elif right is None:
                term = a * left
            else:
                term = a * left + b * right
            level.append(term / k)
        if k >= upto:
            kept[k] = level
    return kept


def bspline_taps(t: jnp.ndarray, order: int,
                 grad: bool = False, hess: bool = False):
    """Weights (and optionally 1st/2nd derivatives) of all ``order+1`` taps.

    Parameters
    ----------
    t : array — fractional position from :func:`node_origin`
    order : static int in 0..7
    grad, hess : whether to also return per-tap derivative factors

    Returns
    -------
    (weights, grads, hesss) : each a list of ``order+1`` arrays shaped like
    ``t`` (``grads`` / ``hesss`` are None when not requested).  Tap ``j``
    multiplies the sample at node ``n0 + j``.
    """
    p = order
    if p == 0:
        w = [jnp.ones_like(t)]
        g = [jnp.zeros_like(t)] if grad else None
        h = [jnp.zeros_like(t)] if hess else None
        return w, g, h

    lowest = p
    if grad:
        lowest = p - 1
    if hess:
        lowest = min(lowest, max(p - 2, 0))
    levels = _tap_levels(t, p, lowest)

    weights = levels[p]

    grads = None
    if grad:
        lv = levels[p - 1]  # taps of beta_{p-1} at u_{p-1} - j = t - 1/2 - j
        zero = jnp.zeros_like(t)

        def at(j):
            return lv[j] if 0 <= j < len(lv) else zero

        # beta_p'(t - j) = beta_{p-1}(t - j + 1/2) - beta_{p-1}(t - j - 1/2)
        #               = A_{j-1}^(p-1) - A_j^(p-1)
        grads = [at(j - 1) - at(j) for j in range(p + 1)]

    hesss = None
    if hess:
        zero = jnp.zeros_like(t)
        if p == 1:
            hesss = [zero, zero]
        else:
            lv = levels[p - 2]  # taps of beta_{p-2} at t - 1 - j

            def at2(j):
                return lv[j] if 0 <= j < len(lv) else zero

            # beta_p''(t - j) = beta_{p-2}(t-j+1) - 2 beta_{p-2}(t-j)
            #                   + beta_{p-2}(t-j-1)
            #                 = A_{j-2} - 2 A_{j-1} + A_j   (level p-2)
            hesss = [at2(j - 2) - 2 * at2(j - 1) + at2(j)
                     for j in range(p + 1)]

    return weights, grads, hesss


def _pointwise(x: jnp.ndarray, order: int, which: str) -> jnp.ndarray:
    """Evaluate beta_p (or a derivative) at arbitrary positions ``x``.

    Uses the tap machinery: with ``n0 = floor(x - (p-1)/2)``, the tap at
    node 0 (i.e. ``j = -n0``) is ``beta_p(x)``; positions outside the
    support select no tap and yield 0, reproducing the support cutoff of
    the reference's ``Spline.weight`` (interpol/splines.py:24-28).
    """
    n0, t = node_origin(x, order)
    w, g, h = bspline_taps(t, order,
                           grad=(which == "grad"), hess=(which == "hess"))
    taps = {"weight": w, "grad": g, "hess": h}[which]
    out = jnp.zeros_like(t)
    for j, tap in enumerate(taps):
        out = out + jnp.where(n0 == -j, tap, 0)
    return out


def bspline_weight(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """``beta_order(x)`` — the centered uniform B-spline basis function."""
    return _pointwise(jnp.asarray(x), order, "weight")


def bspline_grad(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """First derivative ``beta_order'(x)``."""
    if order == 0:
        x = jnp.asarray(x)
        return jnp.zeros_like(x)
    return _pointwise(jnp.asarray(x), order, "grad")


def bspline_hess(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """Second derivative ``beta_order''(x)``."""
    if order in (0, 1):
        x = jnp.asarray(x)
        return jnp.zeros_like(x)
    return _pointwise(jnp.asarray(x), order, "hess")
