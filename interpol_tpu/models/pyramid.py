"""Coarse-to-fine multiresolution registration driver.

The standard way the reference library is used in production (it is the
resampling core of the NITorch registration stack) is inside a
*pyramid*: restrict both volumes several times, register at the
coarsest level where the basin of attraction is widest, then carry the
estimated deformation down and refine at each finer level.  The
reference leaves that driver to the user (its notebooks sketch it);
this module ships it as a model, composed entirely from framework ops:

  * ``restrict`` builds the image pyramids (successive ~2x
    restrictions, the multiscale adjoint path — MXU separable kernels);
  * each level is a :class:`~interpol_tpu.models.warp.WarpModel` over
    that level's volume shape, so every level rides the windowed /
    adaptive Pallas warp tier and the hand-wired custom-VJP chain;
  * one jitted ``lax.scan`` runs a level's SGD steps on-device.

**Why parameters transfer between levels unchanged.**  The control grid
(``coarse_shape``) is FIXED across levels while the volume shape
halves.  ``WarpModel.dense_flow`` upsamples the control values and
multiplies by the per-axis scale ``vol/coarse``, so a given parameter
value always displaces by the same *fraction of the volume* — i.e. the
same physical displacement — no matter the level.  Prolongation is
therefore the identity; only the displacement clamp (``max_disp``,
expressed in that level's voxels) is rescaled per level.

Typical use::

    model = PyramidModel(vol_shape=(128, 128, 128),
                         coarse_shape=(8, 8, 8), levels=3,
                         steps_per_level=30, interpolation=3)
    params, losses = register(model, moving, fixed, lr=1.0)
    warped = model.finest().warp(params, moving)
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.resize import restrict
from .warp import WarpModel, mse_loss

__all__ = ["PyramidModel", "register", "run_level", "image_pyramid"]


class PyramidModel(NamedTuple):
    """Static configuration of the coarse-to-fine registration driver."""

    vol_shape: Tuple[int, ...]      # finest (full-resolution) shape
    coarse_shape: Tuple[int, ...]   # control-point grid (FIXED across levels)
    levels: int = 3                 # pyramid depth (1 = plain WarpModel)
    interpolation: int = 3
    bound: str = "dct2"
    max_disp: float = 4.0           # displacement budget in FINEST-level
    # voxels; level l (0 = coarsest) gets max_disp / 2**(levels-1-l)
    steps_per_level: int = 20
    tile_spread: Tuple[float, ...] = None   # forwarded to WarpModel
    # (incl. "auto"; see WarpModel.tile_spread)
    coarse_clamp: bool = False

    def level_shapes(self) -> Tuple[Tuple[int, ...], ...]:
        """Spatial shapes coarse -> fine: ceil-halved per level, floored
        at the spline support so the coarsest level stays resolvable."""
        floor = self.interpolation + 1
        shapes = [tuple(self.vol_shape)]
        for _ in range(self.levels - 1):
            shapes.append(tuple(max(floor, math.ceil(n / 2))
                                for n in shapes[-1]))
        return tuple(reversed(shapes))

    def level_model(self, level: int) -> WarpModel:
        """The WarpModel for pyramid level ``level`` (0 = coarsest)."""
        shapes = self.level_shapes()
        # clamp budget in this level's voxels: same physical budget as
        # max_disp at the finest level (shapes halve ~exactly)
        scale = 2.0 ** (self.levels - 1 - level)
        return WarpModel(vol_shape=shapes[level],
                         coarse_shape=tuple(self.coarse_shape),
                         interpolation=self.interpolation,
                         bound=self.bound,
                         max_disp=self.max_disp / scale,
                         tile_spread=self.tile_spread,
                         coarse_clamp=self.coarse_clamp)

    def finest(self) -> WarpModel:
        return self.level_model(self.levels - 1)

    def init_params(self, batch: int, dtype=jnp.float32):
        return self.finest().init_params(batch, dtype)


def image_pyramid(model: PyramidModel, image):
    """Restrict ``image`` (B, C, *vol_shape) into the model's pyramid,
    returned coarse -> fine (successive ~2x restrictions, each level
    built from the previous one like a classic Gaussian pyramid).

    Levels are *mean-preserving* (raw splat sum scaled by the voxel
    ratio = spline-weighted averaging), NOT ``restrict``'s fullscale
    normalization (the resize adjoint, which grows intensities by the
    volume ratio): every level must keep the same intensity scale so
    the MSE gradient magnitude — and with it a single learning rate —
    is comparable across levels."""
    shapes = model.level_shapes()
    ndim = len(model.vol_shape)
    levels = [jnp.asarray(image)]
    for shape in reversed(shapes[:-1]):
        prev = levels[-1]
        ratio = math.prod(shape) / math.prod(prev.shape[-ndim:])
        lvl = restrict(prev, shape=list(shape), anchor=["e"] * ndim,
                       interpolation=model.interpolation,
                       bound=model.bound, reduce_sum=True)
        levels.append(lvl * ratio)
    return list(reversed(levels))


@partial(jax.jit, static_argnums=(0, 4), donate_argnums=(1,))
def run_level(model: WarpModel, params, moving, fixed, steps: int,
              lr: float = 1.0):
    """``steps`` SGD steps on one pyramid level as a single jitted
    ``lax.scan`` (one launch per level, not per step).  Returns the
    updated params and the per-step loss trace."""
    def body(p, _):
        loss, g = jax.value_and_grad(mse_loss, argnums=1)(
            model, p, moving, fixed)
        return p - lr * g, loss
    return lax.scan(body, params, None, length=steps)


def register(model: PyramidModel, moving, fixed, lr: float = 1.0,
             params=None):
    """Coarse-to-fine registration of ``moving`` onto ``fixed`` (both
    (B, C, *vol_shape)).  Returns ``(params, losses)`` where ``losses``
    is the (levels, steps_per_level) loss-trace array, coarse level
    first.  ``params`` warm-starts the estimate (its values are
    level-invariant — see the module docstring)."""
    moving = jnp.asarray(moving)
    fixed = jnp.asarray(fixed)
    mov_pyr = image_pyramid(model, moving)
    fix_pyr = image_pyramid(model, fixed)
    if params is None:
        params = model.init_params(moving.shape[0],
                                   dtype=mov_pyr[0].dtype)
    else:
        # run_level donates its params operand; never eat the caller's
        params = jnp.array(params)
    traces = []
    for level in range(model.levels):
        wm = model.level_model(level)
        params, trace = run_level(wm, params, mov_pyr[level],
                                  fix_pyr[level], model.steps_per_level,
                                  lr)
        traces.append(trace)
    return params, jnp.stack(traces)
