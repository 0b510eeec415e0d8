"""Coarse-to-fine pyramid registration driver (models/pyramid.py)."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from interpol_tpu.models import (PyramidModel, WarpModel, register,
                                 run_level, image_pyramid, mse_loss)


def _smooth_image(rng, shape, batch=1, channel=1):
    """Band-limited random image: white noise upsampled by resize, so
    the MSE landscape is smooth enough for SGD at every pyramid level."""
    from interpol_tpu.ops.resize import resize
    coarse = tuple(max(3, n // 4) for n in shape)
    x = rng.standard_normal((batch, channel) + coarse)
    return resize(jnp.asarray(x, jnp.float32), shape=list(shape),
                  anchor=["e"] * len(shape), interpolation=3,
                  prefilter=False)


def test_level_shapes_and_models():
    m = PyramidModel(vol_shape=(48, 37), coarse_shape=(4, 4), levels=3,
                     interpolation=3, max_disp=4.0)
    shapes = m.level_shapes()
    assert shapes[-1] == (48, 37)
    assert shapes[1] == (24, 19)
    assert shapes[0] == (12, 10)
    # spline support floor
    tiny = PyramidModel(vol_shape=(8, 8), coarse_shape=(4, 4), levels=4,
                        interpolation=3)
    assert all(min(s) >= 4 for s in tiny.level_shapes())
    # clamp budget halves per level (same physical displacement)
    assert m.level_model(2).max_disp == 4.0
    assert m.level_model(1).max_disp == 2.0
    assert m.level_model(0).max_disp == 1.0
    # control grid fixed across levels -> params transfer untouched
    assert all(m.level_model(l).coarse_shape == (4, 4) for l in range(3))
    assert m.init_params(2).shape == (2, 4, 4, 2)


def test_image_pyramid_shapes_and_content():
    rng = np.random.default_rng(0)
    m = PyramidModel(vol_shape=(32, 24), coarse_shape=(4, 4), levels=3,
                     interpolation=1)
    img = _smooth_image(rng, (32, 24))
    pyr = image_pyramid(m, img)
    assert [p.shape[-2:] for p in pyr] == [(8, 6), (16, 12), (32, 24)]
    assert pyr[-1] is not img or pyr[-1].shape == img.shape
    # restriction is an averaging: coarse levels keep the intensity scale
    for p in pyr:
        assert abs(float(p.mean()) - float(img.mean())) < 0.2


def test_pyramid_registers_synthetic_warp():
    """Recover a smooth synthetic deformation: the pyramid must drive
    the fine-level MSE far below the unregistered MSE, and the coarse
    warm start must already transfer (fine level starts below the
    unregistered loss)."""
    rng = np.random.default_rng(7)
    vol = (32, 32)
    model = PyramidModel(vol_shape=vol, coarse_shape=(4, 4), levels=3,
                         interpolation=1, max_disp=3.0,
                         steps_per_level=25)
    moving = _smooth_image(rng, vol)
    # ground-truth deformation from the finest-level model itself
    true = jnp.asarray(0.5 * rng.standard_normal((1, 4, 4, 2)),
                       jnp.float32)
    fixed = model.finest().warp(true, moving)

    params, losses = register(model, moving, fixed, lr=2.0)
    assert losses.shape == (3, 25)
    l0 = float(mse_loss(model.finest(), model.init_params(1),
                        moving, fixed))
    # warm start transfers: first fine-level step already beats cold
    assert float(losses[-1, 0]) < l0
    # and the full pyramid converges well below the unregistered loss
    assert float(losses[-1, -1]) < 0.15 * l0
    # loss decreases within every level
    for lev in range(3):
        assert float(losses[lev, -1]) < float(losses[lev, 0])


def test_run_level_matches_train_step():
    """One jitted lax.scan level == the per-step train_step loop."""
    from interpol_tpu.models import train_step
    rng = np.random.default_rng(3)
    wm = WarpModel(vol_shape=(16, 16), coarse_shape=(4, 4),
                   interpolation=1, max_disp=2.0)
    moving = _smooth_image(rng, (16, 16))
    fixed = jnp.roll(moving, 1, axis=2)
    p0 = wm.init_params(1)
    # run_level donates params: hand it a copy, keep p0 for the loop
    p_scan, trace = run_level(wm, jnp.array(p0), moving, fixed, 4, lr=1.0)
    p_loop = p0
    losses = []
    for _ in range(4):
        p_loop, loss = train_step(wm, p_loop, moving, fixed, lr=1.0)
        losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(trace), losses, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_scan), np.asarray(p_loop),
                               rtol=1e-5, atol=1e-7)


def test_pyramid_3d_smoke():
    """Tiny 3-D pyramid end-to-end (cubic, auto tile_spread plumbing)."""
    rng = np.random.default_rng(11)
    vol = (16, 12, 16)
    model = PyramidModel(vol_shape=vol, coarse_shape=(3, 3, 3), levels=2,
                         interpolation=3, max_disp=2.0,
                         steps_per_level=4, tile_spread="auto")
    moving = _smooth_image(rng, vol)
    fixed = jnp.roll(moving, 1, axis=4)
    params, losses = register(model, moving, fixed, lr=1.0)
    assert losses.shape == (2, 4)
    assert np.isfinite(np.asarray(losses)).all()
    # loss decreases within each level (levels are different
    # resolutions, so cross-level loss values are not comparable)
    for lev in range(2):
        assert float(losses[lev, -1]) < float(losses[lev, 0])
