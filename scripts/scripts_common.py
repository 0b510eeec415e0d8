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
