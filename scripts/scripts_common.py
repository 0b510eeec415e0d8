"""Shared helpers for on-chip measurement scripts."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x).ravel()[0]


def wait_healthy(limit=5.0, tries=40):
    x = jnp.ones(8)
    for _ in range(tries):
        t0 = time.time()
        sync(x + 1)
        h = time.time() - t0
        if h < limit:
            return round(h, 2)
        print(f"queue busy ({h:.0f}s); waiting...", flush=True)
        time.sleep(60)
    raise SystemExit("device never became healthy")


def slope_time(make_f, args, R1=1, R2=5, iters=3, perturb=1e-6):
    """Per-application wall time with dispatch/sync/caching artifacts
    cancelled.

    The device tunnel (a) costs ~3 ms per dispatch, (b) has ~0.5 s sync
    latency, and (c) serves *value-level cache hits* for bitwise
    identical dispatch inputs.  So: the op is applied in a genuinely
    data-dependent chain of R applications inside ONE jit (no caching
    inside a compiled program), every outer call perturbs its input by
    a bit-changing amount (not an underflowing 1e-30), and the reported
    time is the slope between two chain lengths.
    """
    import time as _time
    import jax as _jax
    import jax.numpy as _jnp

    salt = [0]
    ts = []
    for R in (R1, R2):
        f = _jax.jit(make_f(R))

        def run(n):
            out = None
            for _ in range(n):
                salt[0] += 1
                cur = (args[0] + salt[0] * perturb,) + tuple(args[1:])
                out = f(*cur)
            sync(_jnp.ravel(out)[:1])

        run(2)
        t0 = _time.time()
        run(iters)
        ts.append((_time.time() - t0) / iters)
    return max((ts[1] - ts[0]) / (R2 - R1), 1e-9), ts
