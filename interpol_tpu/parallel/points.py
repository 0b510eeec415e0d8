"""Point-parallel scattered sampling: shard the POINT axis over devices.

The third distribution strategy, complementing batch DP
(`parallel/batch.py`) and spatial slab sharding (`parallel/spatial.py`):
for scattered-grid workloads (landmark tracking, surface sampling,
point-cloud losses) the natural axis to scale is the *point list* —
every sample point is independent, so with the volume replicated:

  * ``pull_points`` / ``grad_points`` need **zero collectives**: each
    device samples its own point shard with the single-chip op (on TPU
    that is the scattered Pallas tier of ``ops/scattered.py``, whose
    box sort and gather kernel then each see a P/ndev-sized problem —
    the schedule's ``lax.sort`` cost drops superlinearly);
  * the splat adjoints ``push_points`` / ``count_points`` accumulate
    into the shared volume: each device splats its shard into a private
    volume and ONE ``psum`` over the mesh axis merges them — exactly
    the race-free parallel-reduction layout the Pallas push kernel uses
    per-box, lifted to the mesh level, riding ICI.

Differentiation composes: ``shard_map`` is transparent to autodiff, the
inner ops carry hand-wired ``custom_vjp``s (pull ⊣ push), and the
``psum`` transposes to a broadcast — so ``jax.grad`` of a point-sharded
sampling loss needs zero extra collectives in the backward either.

The reference (single-device) has no equivalent; semantics match the
single-chip ops bit-for-bit (exact-match tests in
tests/test_sharding.py::TestPointSharding).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pushpull as _pp

__all__ = ["pull_points", "grad_points", "push_points", "count_points"]


def _points_sharded(fn, mesh: Mesh, in_specs, out_spec,
                    reduce_axis: str = None):
    """shard_map ``fn`` over ``mesh`` with explicit specs;
    ``reduce_axis`` psums the result over that axis (splat ops)."""
    if reduce_axis is not None:
        inner = fn

        def fn(*args):
            return jax.lax.psum(inner(*args), reduce_axis)
    return jax.shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=out_spec, check_vma=False)


def pull_points(inp, points, orders, bounds, extrapolate, *,
                mesh: Mesh, axis_name: str = "data"):
    """Point-sharded scattered pull: (B, C, *ishape) replicated x
    (B, P, D) point-sharded -> (B, C, P) point-sharded.  P must divide
    the mesh axis."""
    f = partial(_pp.pull, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(), P(None, axis_name, None)),
        P(None, None, axis_name))(inp, points)


def grad_points(inp, points, orders, bounds, extrapolate, *,
                mesh: Mesh, axis_name: str = "data"):
    """Point-sharded scattered spatial gradients: -> (B, C, P, D)."""
    f = partial(_pp.grad, orders=orders, bounds=bounds,
                extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(), P(None, axis_name, None)),
        P(None, None, axis_name, None))(inp, points)


def push_points(values, points, oshape: Tuple[int, ...], orders, bounds,
                extrapolate, *, mesh: Mesh, axis_name: str = "data"):
    """Point-sharded splat: (B, C, P) x (B, P, D) -> (B, C, *oshape)
    replicated (each device splats its shard; one psum merges)."""
    f = partial(_pp.push, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(None, None, axis_name), P(None, axis_name, None)),
        P(), reduce_axis=axis_name)(values, points)


def count_points(points, oshape: Tuple[int, ...], orders, bounds,
                 extrapolate, *, mesh: Mesh, axis_name: str = "data"):
    """Point-sharded splat density: (B, P, D) -> (B, 1, *oshape)."""
    f = partial(_pp.count, oshape=tuple(oshape), orders=orders,
                bounds=bounds, extrapolate=extrapolate)
    return _points_sharded(
        f, mesh, (P(None, axis_name, None),), P(),
        reduce_axis=axis_name)(points)
