"""Diffeomorphic registration: stationary-velocity-field (SVF) model.

The companion to :class:`~interpol_tpu.models.warp.WarpModel`: instead
of learning a displacement directly, learn a *velocity* field and warp
by its group exponential (scaling-and-squaring,
:func:`~interpol_tpu.ops.flow.exp_disp`).  The resulting deformation is
a diffeomorphism by construction — invertible
(:func:`~interpol_tpu.ops.flow.invert_disp`), positive Jacobian
determinant, and ``exp(-v)`` is its exact inverse flow — the standard
requirement for topology-preserving medical registration (LDDMM/SVF
literature; the reference library is the resampling core such stacks
build on).

TPU shape: the coarse velocity is clamped per-axis at the control
points (tanh), so every doubling stage's displacement is provably
bounded by ``max_disp`` (streamline arc bound) and *all* pulls — the
``steps`` squarings and the final image warp — ride the windowed
Pallas tier.  The whole model jits to one straight-line program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.api import add_identity_grid, grid_pull
from ..ops.flow import exp_disp, invert_disp, jacobian_det
from ..ops.resize import resize

__all__ = ["SVFModel", "svf_mse_loss", "svf_train_step"]


class SVFModel(NamedTuple):
    """Static configuration of the diffeomorphic registration model."""

    vol_shape: Tuple[int, ...]      # full-resolution spatial shape
    coarse_shape: Tuple[int, ...]   # velocity control-point grid
    interpolation: int = 3          # spline order (upsample + warp)
    bound: str = "dct2"
    max_disp: float = 4.0           # per-axis velocity budget (voxels);
    # the time-1 flow displacement obeys the same bound
    steps: int = 6                  # scaling-and-squaring doublings

    def init_params(self, batch: int, dtype=jnp.float32):
        """Zero velocity control points: (B, *coarse_shape, D)."""
        D = len(self.vol_shape)
        return jnp.zeros((batch,) + tuple(self.coarse_shape) + (D,),
                         dtype)

    def velocity(self, params):
        """Upsample coarse velocity control points to a dense field
        (B, *vol_shape, D), clamped per-axis to ``max_disp`` at the
        COARSE nodes so the dense field is a convex B-spline mixture of
        bounded values (the provable bound the window tier needs)."""
        D = len(self.vol_shape)
        vel = jnp.moveaxis(params, -1, 1)      # (B, D, *coarse)
        scale = [v / c for v, c in zip(self.vol_shape, self.coarse_shape)]
        sc = jnp.asarray(scale, vel.dtype).reshape((1, D) + (1,) * D)
        vel = self.max_disp * jnp.tanh(vel * sc / self.max_disp)
        vel = resize(vel, shape=list(self.vol_shape), anchor=["e"] * D,
                     interpolation=self.interpolation, bound=self.bound,
                     prefilter=False)
        return jnp.moveaxis(vel, 1, -1)

    def flow(self, params, inverse: bool = False):
        """Time-1 displacement field exp(v) (or exp(-v), its exact
        inverse) — (B, *vol_shape, D)."""
        vel = self.velocity(params)
        return exp_disp(-vel if inverse else vel, steps=self.steps,
                        interpolation=1, bound=self.bound,
                        max_disp=self.max_disp)

    def warp(self, params, moving, inverse: bool = False):
        """Warp ``moving`` (B, C, *vol_shape) by the diffeomorphism."""
        grid = add_identity_grid(self.flow(params, inverse=inverse))
        return grid_pull(moving, grid, interpolation=self.interpolation,
                         bound=self.bound, extrapolate=True,
                         max_disp=self.max_disp)

    def log_jacobian(self, params):
        """log |J| of the forward warp — the standard volume-change
        regularizer (finite everywhere: the determinant is positive for
        a converged exponential)."""
        return jnp.log(jacobian_det(self.flow(params)))


def svf_mse_loss(model: SVFModel, params, moving, fixed,
                 jac_weight: float = 0.0):
    """MSE image term, optionally + ``jac_weight`` x mean log|J|^2
    (volume-change regularizer)."""
    loss = jnp.mean((model.warp(params, moving) - fixed) ** 2)
    if jac_weight:
        loss = loss + jac_weight * jnp.mean(model.log_jacobian(params) ** 2)
    return loss


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def svf_train_step(model: SVFModel, params, moving, fixed,
                   lr: float = 0.1, jac_weight: float = 0.0):
    """One SGD step on the diffeomorphic registration objective."""
    loss, g = jax.value_and_grad(svf_mse_loss, argnums=1)(
        model, params, moving, fixed, jac_weight)
    return params - lr * g, loss
