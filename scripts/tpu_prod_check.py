"""On-chip compiled-path check for the production window ops:
parity (Pallas vs XLA formulation, compiled) + slope-timed throughput.

Usage: python scripts/tpu_prod_check.py [N] [ops...]
ops: pull grad push step
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import sync, wait_healthy  # noqa: E402

import interpol_tpu  # noqa: E402
from interpol_tpu import backend  # noqa: E402
from interpol_tpu.ops import window as wd  # noqa: E402


def slope_time(make_f, args, R1=1, R2=5, iters=4):
    ts = []
    for R in (R1, R2):
        f = jax.jit(make_f(R))
        def run(n):
            out = None
            cur = args
            for _ in range(n):
                out = f(*cur)
                cur = (cur[0] + jnp.ravel(out)[0] * 1e-30,) + cur[1:]
            sync(jnp.ravel(out)[:1])
        run(2)
        t0 = time.time()
        run(iters)
        ts.append((time.time() - t0) / iters)
    return (ts[1] - ts[0]) / (R2 - R1)


def data(N, max_disp, C=1, seed=0):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((C, N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-max_disp, max_disp,
                                           ident.shape).astype(np.float32))
    return vol, grid


def parity(N=32, order=3, max_disp=2.0):
    """Compiled Pallas vs XLA window formulation on the chip."""
    vol, grid = data(N, max_disp, C=2, seed=1)
    o, b = (order,) * 3, (3,) * 3
    outs = {}
    for be in ("pallas", "xla"):
        with backend.use_backend(be):
            p = jax.jit(lambda v, g: wd._pull_impl(v, g, o, b, 1, max_disp))(
                vol, grid)
            gr = jax.jit(lambda v, g: wd._grad_impl(v, g, o, b, 1, max_disp))(
                vol, grid)
            ps = jax.jit(lambda v, g: wd._push_impl(v, g, o, b, 1, max_disp))(
                vol, grid)
            outs[be] = (np.asarray(p), np.asarray(gr), np.asarray(ps))
    errs = [float(np.abs(a - c).max())
            for a, c in zip(outs["pallas"], outs["xla"])]
    print(f"parity N={N} o={order}: pull={errs[0]:.2e} "
          f"grad={errs[1]:.2e} push={errs[2]:.2e}", flush=True)
    return max(errs)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ops = sys.argv[2:] or ["parity", "pull", "grad", "push"]
    order, max_disp = 3, 2.0
    o, b = (order,) * 3, (3,) * 3
    print("health:", wait_healthy(), flush=True)

    if "parity" in ops:
        parity()

    vol, grid = data(N, max_disp)

    if "pull" in ops:
        def mk(R):
            def f(v, g):
                for _ in range(R):
                    v = wd.pull_window(v, g, o, b, 1, max_disp)
                return v
            return f
        dt = slope_time(mk, (vol, grid))
        print(f"pull  N={N}: {N**3/dt/1e9:7.3f} Gvox/s ({dt*1e3:.2f} ms)",
              flush=True)

    if "grad" in ops:
        def mk(R):
            def f(v, g):
                out = v
                for _ in range(R):
                    gr = wd.grad_window(out, g, o, b, 1, max_disp)
                    out = gr[..., 0] + 1e-30 * (gr[..., 1] + gr[..., 2])
                return out
            return f
        dt = slope_time(mk, (vol, grid))
        print(f"grad  N={N}: {N**3/dt/1e9:7.3f} Gvox/s ({dt*1e3:.2f} ms)",
              flush=True)

    if "push" in ops:
        def mk(R):
            def f(v, g):
                for _ in range(R):
                    v = wd.push_window(v, g, o, b, 1, max_disp)
                return v
            return f
        dt = slope_time(mk, (vol, grid))
        print(f"push  N={N}: {N**3/dt/1e9:7.3f} Gvox/s ({dt*1e3:.2f} ms)",
              flush=True)

    if "step" in ops:
        # warp-MSE value_and_grad step (the VERDICT item-3 gate)
        from interpol_tpu.models import WarpModel, train_step
        model = WarpModel(vol_shape=(N, N, N), coarse_shape=(8, 8, 8),
                          interpolation=3, bound="dct2")
        params = model.init_params(1) + 0.01
        moving = vol[None]
        fixed = moving * 0.9

        def mk(R):
            def f(p, mv, fx):
                loss = 0.
                for _ in range(R):
                    l, g = jax.value_and_grad(
                        lambda pp: jnp.mean(
                            (model.warp(pp, mv) - fx) ** 2))(p)
                    p = p - 0.1 * g
                    loss = loss + l
                return p, loss
            return f

        ts = []
        for R in (1, 3):
            f = jax.jit(mk(R))
            def run(n):
                pp = params
                out = None
                for _ in range(n):
                    pp, out = f(pp, moving, fixed)
                sync(jnp.ravel(out)[:1])
            run(2)
            t0 = time.time()
            run(4)
            ts.append((time.time() - t0) / 4)
        dt = (ts[1] - ts[0]) / 2
        print(f"step  N={N}: {dt*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
