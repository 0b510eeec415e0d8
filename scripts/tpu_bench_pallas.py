"""Patient TPU benchmark: waits for device-queue health, then measures the
Pallas warp kernel vs the XLA window path."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def sync(x):
    return np.asarray(x).ravel()[0]


def wait_healthy(limit=5.0, tries=40):
    x = jnp.ones(8)
    for _ in range(tries):
        t0 = time.time()
        sync(x + 1)
        h = time.time() - t0
        if h < limit:
            return h
        print(f"queue busy ({h:.0f}s); waiting...", flush=True)
        time.sleep(60)
    raise SystemExit("device never became healthy")


def main():
    print("health:", wait_healthy(), flush=True)
    from functools import partial
    from interpol_tpu.ops import pallas_warp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident
                       + rng.uniform(-2, 2, ident.shape).astype(np.float32))
    f = jax.jit(partial(pallas_warp.pull_window_pallas, orders=(3,) * 3,
                        bounds=(3,) * 3, extrapolate=1, max_disp=2.0))
    t0 = time.time()
    r = f(vol, grid)
    sync(r[:1, :1, :1])
    print(f"pallas compile+first: {time.time()-t0:.1f} s", flush=True)

    import scipy.ndimage as ndi
    pts = np.asarray(grid[:2].reshape(-1, 3)).T
    refv = ndi.map_coordinates(np.asarray(vol), pts, order=3,
                               mode="reflect", prefilter=False)
    err = np.abs(np.asarray(r[:2]).ravel() - refv).max()
    print(f"on-chip correctness vs scipy: {err:.2e}", flush=True)

    t0 = time.time()
    sync(r[:1, :1, :1])
    sb = time.time() - t0
    t0 = time.time()
    cur = vol
    iters = 4
    for _ in range(iters):
        r = f(cur, grid)
        cur = vol + r[0, 0, 0] * 1e-30
    sync(r[:1, :1, :1])
    dt = (time.time() - t0 - sb) / iters
    print(f"PALLAS cubic warp-pull {N}^3 (m=2): {dt*1e3:.1f} ms  "
          f"{N**3/dt/1e9:.3f} Gvox/s", flush=True)


if __name__ == "__main__":
    main()
