"""Resize (scipy-zoom-like) and restrict (its adjoint) for multiscale
pyramids, built on grid_pull / grid_push.

Functional parity with the reference's interpol/resize.py and
interpol/restrict.py, including the four anchor modes::

        edges          centers          first           last
    e - + - + - e   + - + - + - +   + - + - + - +   + - + - + - +
    | . | . | . |   | c | . | c |   | f | . | . |   | . | . | . |
    + _ + _ + _ +   + _ + _ + _ +   + _ + _ + _ +   + _ + _ + _ +
    | . | . | . |   | . | . | . |   | . | . | . |   | . | . | . |
    + _ + _ + _ +   + _ + _ + _ +   + _ + _ + _ +   + _ + _ + _ +
    | . | . | . |   | c | . | c |   | . | . | . |   | . | . | l |
    e _ + _ + _ e   + _ + _ + _ +   + _ + _ + _ +   + _ + _ + _ +

Defaults (as in the reference): bound='nearest', extrapolate=True;
resize prefilters by default (true interpolation), restrict does not,
and divides by the accumulated scale unless ``reduce_sum=True``
(restrict.py:117-120).

The sampling grid here is *separable* (an outer product of per-axis affine
lines, resize.py:92-109), which the dedicated separable fast path exploits
on TPU (see :mod:`interpol_tpu.ops.separable`); this module keeps the fully
general grid_pull/grid_push route for exact reference semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from .. import backend as _backend
from ..options import normalize_options
from ..utils.shapes import make_list
from . import coeff as _coeff
from .api import grid_pull, grid_push
from .separable import separable_pull, separable_push

__all__ = ["resize", "restrict"]


def _resolve_geometry(inshape, factor, shape, anchor, ndim, for_restrict):
    """Common factor/shape/anchor resolution (resize.py:70-89)."""
    factor = make_list(factor) if factor else []
    shape = make_list(shape) if shape else []
    if factor:
        factor = make_list(factor, ndim)
    elif not shape:
        raise ValueError("One of `factor` or `shape` must be provided")
    if shape:
        shape = make_list(shape, ndim)
    elif for_restrict:
        shape = [int(i / f) for i, f in zip(inshape, factor)]
    else:
        shape = [int(i * f) for i, f in zip(inshape, factor)]
    if not factor:
        if for_restrict:
            factor = [i / o for i, o in zip(inshape, shape)]
        else:
            factor = [o / i for o, i in zip(shape, inshape)]
    return factor, shape


def resize(image, factor=None, shape=None, anchor="c",
           interpolation=1, prefilter=True, **kwargs):
    """Resize an image by a factor or to a target shape
    (reference resize.py:13-119).

    Parameters
    ----------
    image : (batch, channel, *inshape) array
    factor : float or per-dim list — >1 upsamples
    shape : target spatial shape
    anchor : {'centers','edges','first','last'} or per-dim list
    interpolation : spline order(s), default=1
    prefilter : apply the interpolating prefilter (default True)
    kwargs : forwarded to grid_pull (bound='nearest', extrapolate=True
        by default)
    """
    image = jnp.asarray(image)
    anchor_list = make_list(anchor)
    ndim = max(len(make_list(factor) if factor else []),
               len(make_list(shape) if shape else []),
               len(anchor_list)) or (image.ndim - 2)
    anchors = [a[0].lower() for a in make_list(anchor_list, ndim)]
    inshape = image.shape[-ndim:]
    factor, shape = _resolve_geometry(inshape, factor, shape, anchors,
                                      ndim, for_restrict=False)

    fdtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) \
        else jnp.float32
    lines = []
    for anch, f, insz, outsz in zip(anchors, factor, inshape, shape):
        if anch == "c":      # centers: endpoints map to endpoints
            lines.append(jnp.linspace(0, insz - 1, outsz, dtype=fdtype))
        elif anch == "e":    # edges: voxel-edge-aligned affine map
            scale = insz / outsz
            shift = 0.5 * (scale - 1)
            lines.append(jnp.arange(outsz, dtype=fdtype) * scale + shift)
        elif anch == "f":    # first voxel anchored, voxel size = 1/f
            lines.append(jnp.arange(outsz, dtype=fdtype) / f)
        elif anch == "l":    # last voxel anchored
            shift = (insz - 1) - (outsz - 1) / f
            lines.append(jnp.arange(outsz, dtype=fdtype) / f + shift)
        else:
            raise ValueError(f"Unknown anchor {anch}")

    kwargs.setdefault("bound", "nearest")
    kwargs.setdefault("extrapolate", True)
    kwargs.setdefault("interpolation", interpolation)
    kwargs.setdefault("prefilter", prefilter)

    # Separable fast path: the grid is an outer product of the per-axis
    # lines, so the whole resample is D dense matmuls (MXU) instead of
    # gathers.  Falls back to grid_pull for label maps (integer dtype) or
    # when the pure-XLA gather backend is forced.
    if (_backend.get_backend() != "xla"
            and jnp.issubdtype(image.dtype, jnp.inexact)):
        orders, bounds, ex = normalize_options(
            kwargs["interpolation"], kwargs["bound"],
            kwargs["extrapolate"], ndim)
        img = image
        if kwargs["prefilter"]:
            img = _coeff.spline_coeff_nd(img, orders, bounds, ndim)
        return separable_pull(img, lines, orders, bounds, ex)

    grid = jnp.stack(jnp.meshgrid(*lines, indexing="ij"), axis=-1)
    return grid_pull(image, grid, **kwargs)


def restrict(image, factor=None, shape=None, anchor="c",
             interpolation=1, reduce_sum=False, **kwargs):
    """Restrict (adjoint of resize) an image by a factor
    (reference restrict.py:9-122).

    The sampling grid lives in the *output* space; the image is splatted
    with grid_push and normalized by the accumulated scale unless
    ``reduce_sum`` is set.
    """
    image = jnp.asarray(image)
    anchor_list = make_list(anchor)
    ndim = max(len(make_list(factor) if factor else []),
               len(make_list(shape) if shape else []),
               len(anchor_list)) or (image.ndim - 2)
    anchors = [a[0].lower() for a in make_list(anchor_list, ndim)]
    inshape = image.shape[-ndim:]
    factor, shape = _resolve_geometry(inshape, factor, shape, anchors,
                                      ndim, for_restrict=True)

    fdtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) \
        else jnp.float32
    lines = []
    fullscale = 1.0
    for anch, f, insz, outsz in zip(anchors, factor, inshape, shape):
        if anch == "c":
            lines.append(jnp.linspace(0, outsz - 1, insz, dtype=fdtype))
            fullscale *= (insz - 1) / (outsz - 1)
        elif anch == "e":
            scale = outsz / insz
            shift = 0.5 * (scale - 1)
            fullscale *= scale
            lines.append(jnp.arange(insz, dtype=fdtype) * scale + shift)
        elif anch == "f":
            fullscale *= 1 / f
            lines.append(jnp.arange(insz, dtype=fdtype) / f)
        elif anch == "l":
            shift = (outsz - 1) - (insz - 1) / f
            fullscale *= 1 / f
            lines.append(jnp.arange(insz, dtype=fdtype) / f + shift)
        else:
            raise ValueError(f"Unknown anchor {anch}")

    kwargs.setdefault("bound", "nearest")
    kwargs.setdefault("extrapolate", True)
    kwargs.setdefault("interpolation", interpolation)
    kwargs.setdefault("prefilter", False)

    if (_backend.get_backend() != "xla"
            and jnp.issubdtype(image.dtype, jnp.inexact)):
        orders, bounds, ex = normalize_options(
            kwargs["interpolation"], kwargs["bound"],
            kwargs["extrapolate"], ndim)
        out = separable_push(image, lines, tuple(shape), orders, bounds, ex)
        if kwargs["prefilter"]:
            out = _coeff.spline_coeff_nd(out, orders, bounds, ndim)
    else:
        grid = jnp.stack(jnp.meshgrid(*lines, indexing="ij"), axis=-1)
        out = grid_push(image, grid, shape, **kwargs)
    if not reduce_sum:
        out = out / fullscale
    return out
