"""Flagship workloads built on the framework (registration warp model)."""
from .warp import WarpModel, mse_loss, train_step  # noqa: F401
