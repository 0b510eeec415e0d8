"""Batch data parallelism: shard the leading batch axis over a mesh axis.

The reference has no distributed layer at all (SURVEY §2/§5: no
torch.distributed / NCCL / MPI anywhere); this is new, idiomatic-TPU
capability.  Every (batch, channel) slice of pull/push/count/grad is
independent (kernel shapes, reference nd.py:83-97), so pure batch DP needs
**zero collectives**: ``shard_map`` splits the batch across devices and
each device runs the single-chip kernel on its shard, with XLA placing the
per-device programs and the compiler seeing the full static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pushpull as _pp

__all__ = ["pull_dp", "push_dp", "count_dp", "grad_dp", "batch_sharded"]


def batch_sharded(fn, mesh: Mesh, axis_name: str, n_arrays: int):
    """shard_map a function of ``n_arrays`` batch-leading arrays over
    ``mesh`` axis ``axis_name`` (batch must divide the axis size)."""
    specs = tuple(P(axis_name) for _ in range(n_arrays))
    return jax.shard_map(fn, mesh=mesh, in_specs=specs,
                         out_specs=P(axis_name), check_vma=False)


def pull_dp(inp, grid, orders, bounds, extrapolate, *,
            mesh: Mesh, axis_name: str = "data"):
    """Batch-sharded grid_pull: (B, C, *ish) x (B, *osh, D) -> (B, C, *osh)
    with B sharded over ``axis_name``."""
    f = partial(_pp.pull, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return batch_sharded(f, mesh, axis_name, 2)(inp, grid)


def push_dp(inp, grid, oshape: Tuple[int, ...], orders, bounds,
            extrapolate, *, mesh: Mesh, axis_name: str = "data"):
    """Batch-sharded grid_push."""
    f = partial(_pp.push, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return batch_sharded(f, mesh, axis_name, 2)(inp, grid)


def count_dp(grid, oshape: Tuple[int, ...], orders, bounds, extrapolate, *,
             mesh: Mesh, axis_name: str = "data"):
    """Batch-sharded grid_count."""
    f = partial(_pp.count, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return batch_sharded(f, mesh, axis_name, 1)(grid)


def grad_dp(inp, grid, orders, bounds, extrapolate, *,
            mesh: Mesh, axis_name: str = "data"):
    """Batch-sharded grid_grad."""
    f = partial(_pp.grad, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return batch_sharded(f, mesh, axis_name, 2)(inp, grid)
