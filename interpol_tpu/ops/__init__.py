"""Operator tier: bounds/splines primitives, N-D kernels, prefilter,
high-level API, resize/restrict."""
from . import bounds, splines, ndkernels, pushpull, coeff, api, resize  # noqa: F401
