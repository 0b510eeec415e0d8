"""Batched push/pull ops with hand-wired adjoints (``jax.custom_vjp``).

This is the TPU-native re-expression of the reference's autograd layer
(interpol/autograd.py:157-333 + interpol/pushpull.py:237-325): each op's
backward is *composed from the forward primitives themselves* instead of
differentiating through the node loop —

    pull  : d_inp = push(ct)            d_grid = sum_C grad(inp) . ct
    push  : d_inp = pull(ct)            d_grid = sum_C grad(ct) . inp
    count :                             d_grid = sum_C grad(ct)
    grad  : d_inp = pushgrad(ct)        d_grid = sum_{C, D2} hess(inp) . ct

(pushpull.py:237-258, 262-282, 286-299, 303-325).  This keeps backward
memory O(1) in the tap count and — because the ops appearing in each
backward carry their own custom VJPs (with ``pushgrad``/``hess`` left to
native JAX autodiff) — gives correct second-order derivatives, mirroring
the role of the reference's backward-only ``grid_pushgrad``/``grid_hess``.

Layouts here are the normalized kernel layouts:
    input (B, C, *spatial), grid (B, *spatial, D).
Static options (orders, bounds, extrapolate, output shape) are hashable
tuples, declared ``nondiff_argnums`` so XLA specializes per combination.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import ndkernels as nd

__all__ = ["pull", "push", "count", "grad", "pushgrad", "hess"]


def _flat_grid(grid: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """(B, *oshape, D) -> (B, P, D) plus the static oshape."""
    D = grid.shape[-1]
    oshape = tuple(grid.shape[1:-1])
    return grid.reshape(grid.shape[0], -1, D), oshape


def _scattered_ok(D: int, P: int) -> bool:
    """Route the pull/push/count/grad families through the scattered
    native tier (ops/scattered.py) when the backend and problem shape
    warrant it.

    The documented density/size threshold for the ``auto`` backend:
    1-D, 2-D or 3-D (lower-dim clouds ride the 3-D kernels via
    scattered._lift_2d's zero-cost degenerate axes), at least
    ``scattered.MIN_POINTS`` sample points (below that the tier's fixed
    sort + box-table costs exceed the XLA gather), on a real TPU.
    ``pallas`` forces the tier (any P); ``xla`` never uses it."""
    from .. import backend as _backend

    be = _backend.get_backend()
    if be == "xla" or D not in (1, 2, 3):
        return False
    if be == "pallas":
        return True
    from .scattered import MIN_POINTS
    return P >= MIN_POINTS and jax.default_backend() == "tpu"


# ---------------------------------------------------------------- pull

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pull(inp, grid, orders, bounds, extrapolate):
    """(B, C, *ishape), (B, *oshape, D) -> (B, C, *oshape)."""
    return _pull_impl(inp, grid, orders, bounds, extrapolate)


def _pull_impl(inp, grid, orders, bounds, extrapolate):
    gflat, oshape = _flat_grid(grid)
    if _scattered_ok(grid.shape[-1], gflat.shape[1]):
        from .scattered import pull_scattered
        # static Python loop over B (usually 1): keeps the tier's
        # exact-fallback cond un-vmapped (vmapping a cond turns it into
        # a select that would always pay the fallback)
        out = jnp.stack([
            pull_scattered(inp[b], gflat[b], orders, bounds, extrapolate)
            for b in range(inp.shape[0])])
    else:
        core = partial(nd.pull_core, orders=orders, bounds=bounds,
                       extrapolate=extrapolate)
        out = jax.vmap(core)(inp, gflat)             # (B, C, P)
    return out.reshape(out.shape[:2] + oshape)


def _pull_fwd(inp, grid, orders, bounds, extrapolate):
    # fwd re-calls the wrapped op (not the raw impl): jax.vjp inlines
    # fwd into the primal graph, and only the wrapped call keeps the
    # custom rule available to an outer (second-order) differentiation
    return pull(inp, grid, orders, bounds, extrapolate), (inp, grid)


def _pull_bwd(orders, bounds, extrapolate, res, ct):
    inp, grid = res
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    d_inp = push(ct, grid, ishape, orders, bounds, extrapolate)
    g = grad(inp, grid, orders, bounds, extrapolate)   # (B, C, *oshape, D)
    d_grid = (g * ct[..., None]).sum(axis=1)           # (B, *oshape, D)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


pull.defvjp(_pull_fwd, _pull_bwd)


# ---------------------------------------------------------------- push

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def push(inp, grid, oshape, orders, bounds, extrapolate):
    """(B, C, *ishape), (B, *ishape, D) -> (B, C, *oshape) (pull adjoint)."""
    return _push_impl(inp, grid, oshape, orders, bounds, extrapolate)


def _push_impl(inp, grid, oshape, orders, bounds, extrapolate):
    gflat, gshape = _flat_grid(grid)
    B, C = inp.shape[:2]
    vals = inp.reshape(B, C, -1)                      # (B, C, P)
    if _scattered_ok(grid.shape[-1], gflat.shape[1]):
        from .scattered import push_scattered
        return jnp.stack([
            push_scattered(vals[b], gflat[b], tuple(oshape), orders,
                           bounds, extrapolate)
            for b in range(B)])
    core = partial(nd.push_core, oshape=tuple(oshape), orders=orders,
                   bounds=bounds, extrapolate=extrapolate)
    return jax.vmap(core)(vals, gflat)                # (B, C, *oshape)


def _push_fwd(inp, grid, oshape, orders, bounds, extrapolate):
    return push(inp, grid, oshape, orders, bounds, extrapolate), \
        (inp, grid)


def _push_bwd(oshape, orders, bounds, extrapolate, res, ct):
    inp, grid = res
    d_inp = pull(ct, grid, orders, bounds, extrapolate)
    g = grad(ct, grid, orders, bounds, extrapolate)    # (B, C, *ishape, D)
    d_grid = (g * inp[..., None]).sum(axis=1)          # (B, *ishape, D)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


push.defvjp(_push_fwd, _push_bwd)


# ---------------------------------------------------------------- count

@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def count(grid, oshape, orders, bounds, extrapolate):
    """(B, *ishape, D) -> (B, 1, *oshape): splatted unit weights."""
    return _count_impl(grid, oshape, orders, bounds, extrapolate)


def _count_impl(grid, oshape, orders, bounds, extrapolate):
    gflat, _ = _flat_grid(grid)
    if _scattered_ok(grid.shape[-1], gflat.shape[1]):
        from .scattered import count_scattered
        return jnp.stack([
            count_scattered(gflat[b], tuple(oshape), orders, bounds,
                            extrapolate)
            for b in range(gflat.shape[0])])
    core = partial(nd.count_core, oshape=tuple(oshape), orders=orders,
                   bounds=bounds, extrapolate=extrapolate)
    return jax.vmap(core)(gflat)


def _count_fwd(grid, oshape, orders, bounds, extrapolate):
    return count(grid, oshape, orders, bounds, extrapolate), (grid,)


def _count_bwd(oshape, orders, bounds, extrapolate, res, ct):
    (grid,) = res
    g = grad(ct, grid, orders, bounds, extrapolate)    # (B, 1, *ishape, D)
    return (g.sum(axis=1).astype(grid.dtype),)


count.defvjp(_count_fwd, _count_bwd)


# ---------------------------------------------------------------- grad

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grad(inp, grid, orders, bounds, extrapolate):
    """(B, C, *ishape), (B, *oshape, D) -> (B, C, *oshape, D)."""
    return _grad_impl(inp, grid, orders, bounds, extrapolate)


def _grad_impl(inp, grid, orders, bounds, extrapolate):
    gflat, oshape = _flat_grid(grid)
    if _scattered_ok(grid.shape[-1], gflat.shape[1]):
        from .scattered import grad_scattered
        out = jnp.stack([
            grad_scattered(inp[b], gflat[b], orders, bounds, extrapolate)
            for b in range(inp.shape[0])])
    else:
        core = partial(nd.grad_core, orders=orders, bounds=bounds,
                       extrapolate=extrapolate)
        out = jax.vmap(core)(inp, gflat)              # (B, C, P, D)
    return out.reshape(out.shape[:2] + oshape + out.shape[-1:])


def _grad_fwd(inp, grid, orders, bounds, extrapolate):
    return grad(inp, grid, orders, bounds, extrapolate), (inp, grid)


def _grad_bwd(orders, bounds, extrapolate, res, ct):
    inp, grid = res
    D = grid.shape[-1]
    ishape = tuple(inp.shape[-D:])
    d_inp = pushgrad(ct, grid, ishape, orders, bounds, extrapolate)
    h = hess(inp, grid, orders, bounds, extrapolate)   # (B, C, *osh, D, D)
    d_grid = (h * ct[..., None]).sum(axis=(1, -2))     # (B, *oshape, D)
    return (d_inp.astype(inp.dtype), d_grid.astype(grid.dtype))


grad.defvjp(_grad_fwd, _grad_bwd)


# ------------------------------------------------- second-order primitives
# These two exist to serve grad's backward (reference pushpull.py:176-233)
# and are left as plain jnp functions: JAX differentiates their gathers and
# scatters natively, so third- and higher-order derivatives remain exact.

def pushgrad(inp, grid, oshape, orders, bounds, extrapolate):
    """(B, C, *ishape, D), (B, *ishape, D) -> (B, C, *oshape)."""
    D = grid.shape[-1]
    gflat, _ = _flat_grid(grid)
    B, C = inp.shape[:2]
    vals = inp.reshape(B, C, -1, D)                   # (B, C, P, D)
    core = partial(nd.pushgrad_core, oshape=tuple(oshape), orders=orders,
                   bounds=bounds, extrapolate=extrapolate)
    return jax.vmap(core)(vals, gflat)


def hess(inp, grid, orders, bounds, extrapolate):
    """(B, C, *ishape), (B, *oshape, D) -> (B, C, *oshape, D, D)."""
    gflat, oshape = _flat_grid(grid)
    core = partial(nd.hess_core, orders=orders, bounds=bounds,
                   extrapolate=extrapolate)
    out = jax.vmap(core)(inp, gflat)                  # (B, C, P, D, D)
    return out.reshape(out.shape[:2] + oshape + out.shape[-2:])
