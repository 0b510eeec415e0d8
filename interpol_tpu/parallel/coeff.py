"""Distributed spline prefiltering.

The IIR cascade along one axis is independent per line (reference
coeff.py:344-345: the N-D filter is one sweep per axis), so the natural
sharding is: keep the *filtered* axis local, shard any other axes.  For a
volume sharded along one spatial axis this means:

  - sweeps along unsharded axes run fully local (zero collectives);
  - the sweep along the sharded axis is done by temporarily resharding
    (an all-to-all over ICI, inserted by XLA from sharding constraints)
    so that axis becomes local while another becomes sharded, then
    resharding back.

That is the classic "transpose" FFT/scan strategy and costs two
all-to-alls regardless of order — far cheaper than propagating the
recursion carry device-to-device (which serializes the mesh).
"""
from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.coeff import spline_coeff

__all__ = ["spline_coeff_nd_sharded"]


def spline_coeff_nd_sharded(inp, orders: Sequence[int],
                            bounds: Sequence[int], ndim: int, *,
                            mesh: Mesh, axis_name: str = "x",
                            sharded_axis: int = 0):
    """Prefilter the last ``ndim`` axes of ``inp`` while it is sharded
    along spatial axis ``sharded_axis`` over ``mesh[axis_name]``.

    Returns the filtered array with its original sharding.  Must run
    under ``jax.jit`` for the resharding collectives to be inserted.
    """
    D = ndim
    lead = inp.ndim - D
    spatial = list(range(lead, inp.ndim))

    def spec_with(shard_dim):
        parts = [None] * inp.ndim
        if shard_dim is not None:
            parts[shard_dim] = axis_name
        return NamedSharding(mesh, P(*parts))

    home = spatial[sharded_axis]
    # pick an alternate spatial dim to hold the sharding while the home
    # axis is filtered
    alt = next(a for i, a in enumerate(spatial) if i != sharded_axis) \
        if D > 1 else None

    out = jax.lax.with_sharding_constraint(inp, spec_with(home))
    for d in range(D):
        axis = lead + d
        if axis == home:
            if alt is not None:
                out = jax.lax.with_sharding_constraint(out, spec_with(alt))
            else:
                out = jax.lax.with_sharding_constraint(out, spec_with(None))
        out = spline_coeff(out, orders[d], bounds[d], axis=axis)
        if axis == home:
            out = jax.lax.with_sharding_constraint(out, spec_with(home))
    return out
