"""interpol_tpu — TPU-native N-D B-spline interpolation framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
``torch-interpol`` (the resampling core of NITorch): high-order B-spline
sampling/splatting (``grid_pull`` / ``grid_push`` / ``grid_count`` /
``grid_grad``) for orders 0-7 with seven boundary conditions and per-
dimension options, exact interpolating prefilters (``spline_coeff`` /
``spline_coeff_nd``), label-map soft resampling, grid constructors, and
``resize`` / ``restrict`` multiscale operators — with hand-wired adjoints
(``jax.custom_vjp``), Pallas TPU kernels on the hot paths, and
``shard_map``-based multi-device sharding.
"""
from . import options  # noqa: F401
from . import backend  # noqa: F401
from . import models, ops, parallel, utils  # noqa: F401
from .options import BoundType, ExtrapolateType, InterpolationType  # noqa: F401
from .ops.api import (  # noqa: F401
    grid_pull, grid_push, grid_count, grid_grad,
    spline_coeff, spline_coeff_nd,
    identity_grid, add_identity_grid, add_identity_grid_, affine_grid,
    pull, push, count, required_tile_spread,
)
from .ops.resize import resize, restrict  # noqa: F401
from .ops.flow import (  # noqa: F401
    compose_disp, exp_disp, disp_jacobian, jacobian_det, invert_disp,
)

__version__ = "0.1.0"

__all__ = [
    "grid_pull", "grid_push", "grid_count", "grid_grad",
    "spline_coeff", "spline_coeff_nd",
    "identity_grid", "add_identity_grid", "add_identity_grid_",
    "affine_grid",
    "pull", "push", "count", "required_tile_spread",
    "resize", "restrict",
    "compose_disp", "exp_disp", "disp_jacobian", "jacobian_det",
    "invert_disp",
    "BoundType", "ExtrapolateType", "InterpolationType",
    "options", "backend",
]
