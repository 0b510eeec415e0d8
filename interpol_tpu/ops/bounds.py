"""Boundary folding: map out-of-range integer indices into ``[0, n)`` plus an
optional sign flip, for the seven boundary conditions.

Semantics match the reference's ``Bound.index`` / ``Bound.transform``
(reference: interpol/bounds.py:24-89) exactly, including the ``n == 1``
degenerate cases, but are expressed as pure vectorized functions of
``jax.numpy`` integer arrays.  ``n`` and ``bound`` are always *static*
(shapes and options), so the per-condition branches are resolved at trace
time and the emitted program is branch-free elementwise arithmetic — ideal
for the TPU VPU.

Folding guarantees every produced index is in-range, so downstream gathers
never need clamping; "zero" padding and the antisymmetric conditions are
realized through the companion sign (0 / ±1) multiplied into the gathered
value.

Known reference quirk reproduced deliberately (numerics-parity contract):
the dst1 transform assigns sign 0 to the *in-bounds* index 0
(interpol/bounds.py:69-72 maps i=0 to the "virtual zero" class), although
the documented extension "-b -a 0 | a b c d | 0 -d -c" places the zeros at
the virtual samples -1 and n only.  Sampling exactly at voxel 0 with dst1
therefore returns 0, in both implementations.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..options import BoundType

# Every helper takes an array-module parameter ``xp`` (jax.numpy by
# default): passing ``numpy`` lets static (trace-time) index tables — pad
# contents, precomputed windows — be built as concrete constants even
# inside a jit trace.

__all__ = ["fold_index", "fold_sign", "has_sign"]


def fold_index(i, n: int, bound: int, xp=jnp):
    """Fold integer indices ``i`` into ``[0, n)`` for boundary ``bound``.

    Parameters
    ----------
    i : integer array
    n : static int — size of the folded axis
    bound : static int — a ``BoundType`` value

    Returns
    -------
    integer array with values in ``[0, n)``
    """
    bound = int(bound)
    if bound in (BoundType.zero, BoundType.replicate):
        # Clamp; for 'zero' the sign kills out-of-range contributions.
        return xp.clip(i, 0, n - 1)

    if bound in (BoundType.dct2, BoundType.dst2):
        # Period 2n, reflection about voxel edges.
        n2 = 2 * n
        i = xp.where(i < 0, (n2 - 1) - xp.remainder(-i - 1, n2),
                      xp.remainder(i, n2))
        return xp.where(i >= n, (n2 - 1) - i, i)

    if bound == BoundType.dct1:
        # Period 2(n-1), reflection about voxel centers.
        if n == 1:
            return xp.zeros_like(i)
        n2 = 2 * (n - 1)
        i = xp.remainder(xp.abs(i), n2)
        return xp.where(i >= n, n2 - i, i)

    if bound == BoundType.dst1:
        # Period 2(n+1), antisymmetric about the virtual zero samples at
        # -1 and n.  The two sentinel positions fold onto 0 / n-1; their
        # contribution is zeroed by the sign.
        n2 = 2 * (n + 1)
        i = xp.where(i < 0, -i - 2, i)
        i = xp.remainder(i, n2)
        i = xp.where(i > n, (n2 - 2) - i, i)
        i = xp.where(i == -1, xp.zeros_like(i), i)
        return xp.where(i == n, xp.full_like(i, n - 1), i)

    if bound == BoundType.dft:
        return xp.remainder(i, n)

    raise ValueError(f"Unknown bound: {bound}")


def has_sign(bound: int, n: int) -> bool:
    """Whether this boundary produces a non-trivial sign for axis size n."""
    bound = int(bound)
    if bound == BoundType.dst1:
        return n > 1
    return bound in (BoundType.zero, BoundType.dst2)


def fold_sign(i, n: int, bound: int, dtype=jnp.float32, xp=jnp):
    """Sign (+1 / -1 / 0) carried by index ``i`` under boundary ``bound``.

    Returns ``None`` for boundaries whose sign is identically +1
    (reference: interpol/bounds.py:62-89).
    """
    bound = int(bound)
    if not has_sign(bound, n):
        return None

    if bound == BoundType.zero:
        inb = xp.logical_and(i >= 0, i < n)
        return inb.astype(dtype)

    if bound == BoundType.dst2:
        i = xp.where(i < 0, (n - 1) - i, i)
        odd = xp.remainder(i // n, 2) > 0
        return xp.where(odd, -1, 1).astype(dtype)

    # dst1, n > 1
    n2 = 2 * (n + 1)
    i = xp.where(i < 0, -i + (n - 1), i)
    i = xp.remainder(i, n2)
    x = xp.where(i == 0, 0, 1)
    x = xp.where(xp.remainder(i, n + 1) == n, 0, x)
    odd = xp.remainder(i // (n + 1), 2) > 0
    return xp.where(odd, -x, x).astype(dtype)
