"""Benchmark harness: 3D cubic grid_pull throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Gvox/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the driver-assigned north star: 70% of the HBM roofline
for the op.  Roofline model: one output voxel of the dense cubic warp
needs ~20 B of HBM traffic (amortized input read 4 B + grid 12 B +
output write 4 B); at ~819 GB/s (v5e) that is ~41 Gvox/s, so the
baseline target is 0.7 * 41 = 28.7 Gvox/s.

Timing method: the platform tunnel has high sync latency and an async
dispatch queue, so each sample chains iterations through a data
dependency and the (separately measured) sync overhead is subtracted.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_GVOX = 28.7   # 70% of the 20 B/voxel HBM roofline on v5p/v5e


def _sync(x):
    # slice to a scalar ON DEVICE before fetching: materializing a full
    # array pulls it through the (slow) device tunnel
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def wait_healthy(limit=5.0, tries=30):
    """The device tunnel queues work across clients; gate measurements on
    a small round-trip so backlog from other sessions isn't billed to the
    op under test."""
    x = jnp.ones(8)
    h = None
    for _ in range(tries):
        t0 = time.time()
        _sync(x + 1)
        h = time.time() - t0
        if h < limit:
            return h
        time.sleep(30)
    return h


def measure(f, args, iters=4, chain=None):
    """Wall time per iteration with a data-dependency chain.  The first
    full chain pass is discarded: it compiles both the op under test and
    every auxiliary op of the chain itself (measuring from the second
    call was shown to bill ~400 ms of auxiliary compiles to the op)."""
    def run(n):
        cur = args
        out = None
        for _ in range(n):
            out = f(*cur)
            if chain is not None:
                cur = chain(cur, out)
        _sync(out)

    run(2)              # compile op + chain auxiliaries, settle
    t0 = time.time()
    run(iters)
    return max((time.time() - t0) / iters, 1e-9)


def bench_pull(n=128, order=3, dtype=jnp.float32, max_disp=2.0,
               path="window"):
    import interpol_tpu as itp
    from interpol_tpu.ops import pushpull as pp
    from interpol_tpu.ops import window as wd

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, 1, n, n, n)).astype(
        np.float32)).astype(dtype)
    grid = (itp.identity_grid((n, n, n), dtype=jnp.float32)[None]
            + jnp.asarray(rng.uniform(-max_disp, max_disp,
                                      (1, n, n, n, 3)).astype(np.float32))
            ).astype(dtype)

    if path == "window":
        f = jax.jit(lambda v, g: jax.vmap(
            lambda vv, gg: wd.pull_window(vv, gg, (order,) * 3, (3,) * 3,
                                          1, max_disp))(v, g))
    else:
        f = jax.jit(lambda v, g: pp.pull(v, g, (order,) * 3, (3,) * 3, 1))

    def chain(args, out):
        # thread a scalar of the output back into the input volume so
        # iterations are truly serialized on-device
        v, g = args
        return (v + out[0, 0, 0, 0, 0] * 1e-30, g)

    dt = measure(f, (vol, grid), iters=4, chain=chain)
    return n ** 3 / dt / 1e9


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    path = sys.argv[2] if len(sys.argv) > 2 else "window"
    wait_healthy()
    gvox = bench_pull(n=n, path=path)
    print(json.dumps({
        "metric": f"3d_cubic_warp_pull_{n}cubed_fp32_{path}",
        "value": round(gvox, 4),
        "unit": "Gvox/s",
        "vs_baseline": round(gvox / BASELINE_GVOX, 5),
    }))


if __name__ == "__main__":
    main()
