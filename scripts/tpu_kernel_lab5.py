"""Kernel lab 5: per-lane gather throughput (scattered-grid feasibility).

The one jitfields-parity hole left is a native path for scattered
(non-dense) sampling points; the sketch (ROUND_NOTES) buckets sorted
points by tile and gathers each point's taps from a VMEM-resident box
with per-lane dynamic indices.  Feasibility hinges on the throughput of
``jnp.take_along_axis`` with a shared table replicated across sublanes:

    out[s, l] = table[s, idx[s, l]]     (table identical per sublane s)

This probe measures that primitive: REPS gathers of (8, 128) indices
from an (8, TAB) table, chained data-dependently.

Run: python scripts/tpu_kernel_lab5.py [TAB] [REPS]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import sync, wait_healthy, slope_time  # noqa: E402


def _kernel(tab_ref, idx_ref, out_ref, *, reps):
    tab = tab_ref[0]                  # (8, TAB) — 2-D (gather limit)
    idx = idx_ref[0]                  # (8, 128)
    acc = jnp.zeros(idx.shape, tab.dtype)
    for i in range(reps):
        # perturb indices so gathers can't be CSE'd; stay in range
        cur = (idx + i) % tab.shape[-1]
        acc = acc + jnp.take_along_axis(tab, cur, axis=-1)
    out_ref[0] = acc


def probe(tab=2304, reps=64, rows=256):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((rows, 8, tab))
                        .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, tab, (rows, 8, 128))
                      .astype(np.int32))
    f = jax.jit(pl.pallas_call(
        partial(_kernel, reps=reps),
        grid=(rows,),
        in_specs=[pl.BlockSpec((1, 8, tab), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8, 128), jnp.float32),
    ))

    # correctness once
    out = f(table, idx)
    ref = sum(np.take_along_axis(np.asarray(table),
                                 (np.asarray(idx) + i) % tab, axis=-1)
              for i in range(reps))
    err = float(np.abs(np.asarray(out) - ref).max())

    dt, _ = slope_time(
        lambda c: (c[0].at[..., :128].add(f(c[0], c[1]) * 1e-6), c[1]),
        (table, idx), R1=1, R2=5)
    n = rows * 8 * 128 * reps
    print(f"lane-gather tab={tab}: err={err:.1e}  "
          f"{n/dt/1e9:7.2f} Gelem/s  ({dt*1e3:.2f} ms per {reps}-gather "
          f"pass)", flush=True)


def main():
    tab = int(sys.argv[1]) if len(sys.argv) > 1 else 2304
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print("health:", wait_healthy(), flush=True)
    probe(tab=tab, reps=reps)


if __name__ == "__main__":
    main()
