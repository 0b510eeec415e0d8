"""Kernel lab 7: isolate the adaptive-push Mosaic SIGSEGV.

Variants at tiny size (md=2, spread=1, 32x32x128):
  v0  plain push (control)
  v1  adaptive push, full kernel
  v2  adaptive coef planes but NO final dynamic rolls (monkeypatched)
  v3  adaptive with rolls but B margins = 0 (same box size as plain)
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import wait_healthy  # noqa: E402
from interpol_tpu.ops import pallas_warp as pw  # noqa: E402
from interpol_tpu.ops import window as wd  # noqa: E402

N = 32
o, b = (3,) * 3, (3,) * 3


def data(seed=0):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((1, N, N, 128)).astype(np.float32))
    ident = np.stack(np.meshgrid(np.arange(N), np.arange(N),
                                 np.arange(128), indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray((ident + rng.uniform(-1, 1, ident.shape))
                       .astype(np.float32))
    return vol, grid


def try_compile(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"  {name}: OK ({float(jnp.ravel(out)[0]):.3e})", flush=True)
        return True
    except Exception as e:
        print(f"  {name}: FAIL {str(e)[:160]}", flush=True)
        return False


def main():
    print("health:", wait_healthy(), flush=True)
    vol, grid = data()
    try_compile("v0 plain push",
                lambda v, g: pw.push_window_pallas(v, g, o, b, 1, 2.0),
                vol, grid)
    try_compile("v1 adaptive push",
                lambda v, g: pw.push_window_pallas(v, g, o, b, 1, 2.0,
                                                   spread=1.0),
                vol, grid)

    # v2: no final dynamic rolls (correctness broken; compile probe only)
    real_roll = pw.pltpu.roll
    import contextlib

    @contextlib.contextmanager
    def no_dyn_roll():
        def fake(x, s, axis=0, **kw):
            if not isinstance(s, int):
                return x
            return real_roll(x, s, axis, **kw)
        pw.pltpu.roll = fake
        try:
            yield
        finally:
            pw.pltpu.roll = real_roll

    with no_dyn_roll():
        try_compile("v2 adaptive, no dyn rolls",
                    lambda v, g: pw.push_window_pallas(
                        v, g, o, b, 1, 2.0, spread=1.0), vol, grid)





def main2():
    print("health:", wait_healthy(), flush=True)
    rng = np.random.default_rng(2)
    M = 64
    vol = jnp.asarray(rng.standard_normal((1, M, M, M)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(M)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray((ident + rng.uniform(-7, 7, ident.shape))
                       .astype(np.float32))
    print("default tile:", pw.default_tile((M, M, M)), flush=True)
    try_compile("v3 adaptive push 64^3 md=8 tile(8,8,64)",
                lambda v, g: pw.push_window_pallas(
                    v, g, o, b, 1, 8.0, spread=1.5), vol, grid)
    try_compile("v4 adaptive push 64^3 md=8 tile(8,8,128)",
                lambda v, g: pw.push_window_pallas(
                    v, g, o, b, 1, 8.0, spread=1.5,
                    tile=(8, 8, 128)), vol, grid)
    try_compile("v5 adaptive PULL 64^3 md=8 tile(8,8,64)",
                lambda v, g: pw.warp_pallas(
                    v, g, o, b, 1, 8.0, spread=(1.5,) * 3)[0],
                vol, grid)


if __name__ == "__main__":
    import sys as _s
    (main2 if len(_s.argv) > 1 else main)()
