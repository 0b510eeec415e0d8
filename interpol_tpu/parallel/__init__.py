"""Multi-device layer: batch data parallelism (zero-collective),
slab-sharded spatial ops with ring halo exchange over ICI, and
point-sharded scattered sampling."""
from . import batch, coeff, points, spatial  # noqa: F401
from .batch import pull_dp, push_dp, count_dp, grad_dp  # noqa: F401
from .coeff import spline_coeff_nd_sharded  # noqa: F401
from .spatial import (  # noqa: F401
    halo_width, pull_sharded, push_sharded, count_sharded, grad_sharded)
from .points import (  # noqa: F401
    pull_points, grad_points, push_points, count_points)
