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


def slope_time(body, args, R1=2, R2=12, iters=3, perturb=1e-6):
    """Per-application wall time with dispatch/sync/caching/compile
    artifacts cancelled.

    The device tunnel (a) costs ~3 ms per dispatch, (b) has ~0.5 s sync
    latency, and (c) serves *value-level cache hits* for bitwise
    identical dispatch inputs.  And unrolled R-fold chains explode
    compile time through the remote compile helper.  So: the op is
    chained R times with ``lax.fori_loop`` over a RUNTIME trip count
    (one compile serves every R), every call perturbs its input by a
    bit-changing amount, and the reported time is the slope between two
    chain lengths.

    ``body(carry) -> carry`` applies the op once; ``args`` is the
    initial carry tuple whose first leaf gets perturbed.
    """
    import time as _time
    import jax as _jax
    import jax.numpy as _jnp

    @_jax.jit
    def chain(r, *cur):
        return _jax.lax.fori_loop(0, r, lambda i, c: body(c), cur)

    salt = [0]

    def run(R, n):
        out = None
        for _ in range(n):
            salt[0] += 1
            cur = (args[0] + salt[0] * perturb,) + tuple(args[1:])
            out = chain(R, *cur)
        sync(_jnp.ravel(out[0])[:1])

    ts = []
    for R in (R1, R2):
        run(R, 2)
        t0 = _time.time()
        run(R, iters)
        ts.append((_time.time() - t0) / iters)
    return max((ts[1] - ts[0]) / (R2 - R1), 1e-9), ts
