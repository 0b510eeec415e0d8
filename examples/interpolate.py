"""Random smooth deformation warp (script port of
examples/interpolate.ipynb): draw a coarse random displacement, upsample
it with cubic splines, warp an image along it, and compare against the
registration model that learns the displacement back.

Run:  python examples/interpolate.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import interpol_tpu as itp
from interpol_tpu.models import WarpModel, train_step


def main():
    rng = np.random.default_rng(0)
    H = W = 64

    # smooth random deformation: coarse control points -> dense field
    coarse = rng.standard_normal((8, 8, 2)).astype(np.float32) * 2.0
    disp = itp.resize(jnp.moveaxis(jnp.asarray(coarse), -1, 0),
                      shape=[H, W], interpolation=3, prefilter=False)
    grid = itp.add_identity_grid(jnp.moveaxis(disp, 0, -1))

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    image = np.exp(-(((yy - 24) / 9.) ** 2 + ((xx - 32) / 5.) ** 2))
    warped = itp.grid_pull(image, grid, interpolation=3, bound="dct2",
                           extrapolate=True, prefilter=True)
    print("warped:", warped.shape, "max", float(warped.max()))

    # inverse problem: recover a warp registering image -> warped
    model = WarpModel(vol_shape=(H, W), coarse_shape=(8, 8),
                      interpolation=1, max_disp=4.0)
    params = model.init_params(1)
    moving = jnp.asarray(image, jnp.float32)[None, None]
    fixed = jnp.asarray(warped, jnp.float32)[None, None]
    for step in range(20):
        params, loss = train_step(model, params, moving, fixed, lr=2.0)
        if step % 5 == 0:
            print(f"step {step:3d}  loss {float(loss):.6f}")
    print(f"final loss {float(loss):.6f}")

    # adaptive per-tile windows: for tile-smooth fields the warp cost
    # becomes independent of max_disp.  Measure the field's residual
    # bound, then declare it:
    sp = itp.required_tile_spread(grid[None])
    print("required_tile_spread:", tuple(round(s, 2) for s in sp))
    warped_ad = itp.grid_pull(image, grid, interpolation=3, bound="dct2",
                              extrapolate=True, prefilter=True,
                              max_disp=4.0,
                              tile_spread=tuple(s + 0.25 for s in sp))
    err = float(jnp.abs(warped_ad - warped).max())
    print(f"adaptive-window warp matches: maxerr {err:.2e}")


if __name__ == "__main__":
    main()
