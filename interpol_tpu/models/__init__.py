"""Flagship workloads built on the framework (registration warp model,
coarse-to-fine pyramid driver, diffeomorphic SVF model)."""
from .warp import WarpModel, mse_loss, train_step  # noqa: F401
from .pyramid import (PyramidModel, register, run_level,  # noqa: F401
                      image_pyramid)
from .svf import SVFModel, svf_mse_loss, svf_train_step  # noqa: F401
