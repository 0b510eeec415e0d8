"""Tile-size sweep for the Pallas warp kernel on the real chip."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts_common import sync, wait_healthy  # noqa: E402


def main():
    from functools import partial
    from interpol_tpu.ops import pallas_warp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tiles = [(8, 8, 128), (8, 32, 128), (16, 16, 128), (4, 16, 128),
             (8, 16, 128)]
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-2, 2, ident.shape)
                       .astype(np.float32))

    print("health:", wait_healthy(), flush=True)
    for tile in tiles:
        try:
            f = jax.jit(partial(pallas_warp.pull_window_pallas,
                                orders=(3,) * 3, bounds=(3,) * 3,
                                extrapolate=1, max_disp=2.0, tile=tile))
            def chain(iters):
                cur = vol
                r = None
                for _ in range(iters):
                    r = f(cur, grid)
                    cur = vol + r[0, 0, 0] * 1e-30
                sync(r[:1, :1, :1])
            t0 = time.time()
            chain(1)          # compile kernel + every auxiliary op
            comp = time.time() - t0
            t0 = time.time()
            sync(f(vol, grid)[:1, :1, :1])
            sb = time.time() - t0   # single-call incl. sync overhead
            t0 = time.time()
            chain(4)
            dt = (time.time() - t0) / 4
            print(f"tile {tile}: warmup {comp:.1f}s single {sb*1e3:.0f}ms "
                  f"chained {dt*1e3:.1f} ms  {N**3/dt/1e9:.3f} Gvox/s",
                  flush=True)
        except Exception as e:
            print(f"tile {tile}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
