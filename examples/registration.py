"""Deformable image registration — the flagship end-to-end workflow.

This is the production workload the library exists for (the reference
is the resampling core of the NITorch neuroimaging stack): learn a
smooth dense deformation that warps a moving volume onto a fixed one.
The example composes the framework end-to-end:

  * coarse displacement control points, upsampled to a dense flow with
    the separable MXU ``resize`` path;
  * ``grid_pull`` warping with the bounded-displacement windowed fast
    path (``max_disp``) — on TPU this runs the fused Pallas warp
    kernel; gradients flow through hand-wired custom VJPs (one fused
    value+3-derivatives launch in the backward);
  * optional adaptive per-tile windows (``tile_spread="auto"``): warp
    cost independent of the displacement budget for tile-smooth flows;
  * optional multi-device data + spatial sharding (see
    ``interpol_tpu.parallel`` and ``__graft_entry__.dryrun_multichip``).

Run:  python examples/registration.py     (CPU-sized problem, ~1 min)
"""
import numpy as np
import jax
import jax.numpy as jnp

import interpol_tpu as itp
from interpol_tpu.models import WarpModel, train_step


def make_pair(rng, shape, model):
    """A synthetic (moving, fixed) pair with a known smooth warp."""
    moving = jnp.asarray(
        rng.standard_normal((1, 1) + shape).astype(np.float32))
    # smooth it a little so the MSE landscape is informative
    moving = itp.resize(itp.restrict(moving, factor=2, interpolation=1),
                        shape=list(shape), interpolation=3)
    true_params = jnp.asarray(
        rng.uniform(-2.0, 2.0,
                    (1,) + model.coarse_shape + (len(shape),))
        .astype(np.float32))
    fixed = model.warp(true_params, moving)
    return moving, fixed


def main():
    rng = np.random.default_rng(0)
    shape = (16, 16, 32)
    model = WarpModel(vol_shape=shape, coarse_shape=(4, 4, 4),
                      interpolation=3, bound="dct2", max_disp=3.0)
    moving, fixed = make_pair(rng, shape, model)

    params = model.init_params(batch=1)
    for step in range(8):
        params, loss = train_step(model, params, moving, fixed, lr=2.0)
        if step % 3 == 0 or step == 7:
            print(f"step {step:2d}  mse {float(loss):.6f}")

    # the learned warp, resampled artifacts
    warped = model.warp(params, moving)
    err = float(jnp.mean((warped - fixed) ** 2))
    base = float(jnp.mean((moving - fixed) ** 2))
    print(f"final alignment mse {err:.6f} (unregistered: {base:.6f})")

    # adaptive per-tile windows: identical flows, displacement-budget-
    # independent warp cost on TPU (the flow is tile-smooth because it
    # is upsampled from coarse control points with coarse-node clamping)
    model_ad = model._replace(tile_spread="auto", coarse_clamp=True,
                              max_disp=8.0)
    print("adaptive-window bound from the coarse geometry:",
          tuple(round(s, 2) for s in model_ad.auto_tile_spread()))
    if jax.default_backend() == "tpu":
        # on CPU the auto backend lowers the window op to the unrolled
        # XLA formulation, whose graph grows as the FULL window span —
        # a max_disp=8 demo would spend minutes in the XLA compiler for
        # no insight; on TPU it is one Pallas launch.
        params_ad = model_ad.init_params(batch=1)
        _, loss0 = train_step(model_ad, params_ad, moving, fixed,
                              lr=2.0)
        print(f"adaptive-window model (max_disp=8): first-step mse "
              f"{float(loss0):.6f}")

    # --- coarse-to-fine pyramid: the production driver --------------
    # restrict both volumes into a mean-preserving pyramid, register at
    # the coarsest level first (widest basin of attraction), refine at
    # each finer level; the control grid is level-invariant so the
    # estimate carries down unchanged.
    from interpol_tpu.models import PyramidModel, register

    pyr = PyramidModel(vol_shape=shape, coarse_shape=(4, 4, 4),
                       levels=2, interpolation=3, bound="dct2",
                       max_disp=3.0, steps_per_level=8)
    params_pyr, losses = register(pyr, moving, fixed, lr=2.0)
    for lev in range(pyr.levels):
        print(f"pyramid level {lev} ({pyr.level_shapes()[lev]}): "
              f"mse {float(losses[lev, 0]):.6f} -> "
              f"{float(losses[lev, -1]):.6f}")
    err = float(jnp.mean((pyr.finest().warp(params_pyr, moving)
                          - fixed) ** 2))
    print(f"pyramid final alignment mse {err:.6f}")

    # --- diffeomorphic (SVF) registration -----------------------------
    # learn a stationary velocity field and warp by its group
    # exponential: the deformation is invertible by construction
    # (positive Jacobian determinant; exp(-v) is the exact inverse).
    from interpol_tpu import jacobian_det
    from interpol_tpu.models import SVFModel, svf_train_step

    svf = SVFModel(vol_shape=shape, coarse_shape=(4, 4, 4),
                   interpolation=3, max_disp=3.0, steps=6)
    p = svf.init_params(1)
    for _ in range(10):
        p, loss = svf_train_step(svf, p, moving, fixed, lr=2.0)
    det = jacobian_det(svf.flow(p))
    back = svf.warp(p, svf.warp(p, moving), inverse=True)
    m = [max(1, n // 4) for n in shape]       # interior (skip edge taps)
    inv_err = float(jnp.abs(back - moving)[:, :, m[0]:-m[0],
                                           m[1]:-m[1], m[2]:-m[2]].max())
    print(f"svf: mse {float(loss):.6f}, det J in "
          f"[{float(det.min()):.3f}, {float(det.max()):.3f}], "
          f"inverse-consistency {inv_err:.4f}")

    # --- Jacobian-determinant regularization (second order) ----------
    # penalizing (det J - 1)^2 differentiates THROUGH grid_grad: the
    # training backward evaluates the native second-order kernels
    # (pushgrad/hess windows) at full volume — on TPU this runs at
    # 256^3 (BASELINE.md round-5 rows); here a small dense-field demo.
    u0 = 0.5 * jnp.tanh(jnp.asarray(
        np.random.default_rng(7).standard_normal(shape + (3,))
        .astype(np.float32)))

    def reg_loss(u):
        det = jacobian_det(u[None])
        return jnp.mean((det - 1.0) ** 2)

    g = jax.jit(jax.grad(reg_loss))(u0)
    u1 = u0 - 5.0 * g
    print(f"jacdet regularizer: loss {float(reg_loss(u0)):.5f} -> "
          f"{float(reg_loss(u1)):.5f} after one step "
          f"(|dL/du|_max {float(jnp.abs(g).max()):.4f})")


if __name__ == "__main__":
    main()
