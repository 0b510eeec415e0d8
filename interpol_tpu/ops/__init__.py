"""Operator tier: bounds/splines primitives, N-D kernels, prefilter,
high-level API, resize/restrict."""
from . import (  # noqa: F401
    bounds, splines, ndkernels, pushpull, coeff, api, resize, separable)
