"""On-chip bench + parity for the scattered-grid native tier.

Measures (caching-safe slope timing):
  1. compiled parity vs the XLA gather core (small cloud),
  2. end-to-end pull_scattered throughput (1M points into 256^3,
     cubic) vs the VERDICT target of >= 0.1 Gpt/s,
  3. the XLA gather core on the same workload at reduced P
     (extrapolated) for the speedup claim,
  4. component split: table build, schedule (sort+searchsorted),
     kernel+unsort — by timing nested sub-jits.

Run: nohup python scripts/tpu_scatter_bench.py [P] [N] > log &
"""
import json
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import sync, wait_healthy, slope_time  # noqa: E402

from interpol_tpu.ops import ndkernels as nd  # noqa: E402
from interpol_tpu.ops import scattered as sc  # noqa: E402


def data(P, N, seed=0):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((1, N, N, N)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, N - 1, (P, 3)).astype(np.float32))
    return vol, pts


def parity(n=64, P=20000):
    vol, pts = data(P, n, seed=1)
    o, b = (3,) * 3, (3,) * 3
    ref = jax.jit(lambda v, p: nd.pull_core(v, p, o, b, 1))(vol, pts)
    out = jax.jit(lambda v, p: sc.pull_scattered(v, p, o, b, 1))(vol, pts)
    err = float(jnp.abs(out - ref).max())
    refg = jax.jit(lambda v, p: nd.grad_core(v, p, o, b, 1))(vol, pts)
    outg = jax.jit(lambda v, p: sc.grad_scattered(v, p, o, b, 1))(vol, pts)
    errg = float(jnp.abs(outg - refg).max())
    print(f"parity pull={err:.2e} grad={errg:.2e}", flush=True)
    return max(err, errg)


def bench(P=1_000_000, N=256):
    vol, pts = data(P, N)
    o, b = (3,) * 3, (3,) * 3

    dt, _ = slope_time(
        lambda c: (c[0], pts + 1e-7 * jnp.sum(c[1][0, 0])), (vol, pts))
    # ^ noop feedback chain sanity (dispatch floor) — then the real op:
    dt, ts = slope_time(
        lambda c: (c[0],
                   c[1].at[:, :].add(1e-9 * sc.pull_scattered(
                       c[0], c[1], o, b, 1)[0, :, None])),
        (vol, pts))
    gpt = P / dt / 1e9
    print(f"pull_scattered P={P} N={N}: {dt*1e3:.2f} ms -> "
          f"{gpt:.4f} Gpt/s", flush=True)
    return gpt, dt


def bench_xla_core(P=100_000, N=256):
    vol, pts = data(P, N, seed=2)
    o, b = (3,) * 3, (3,) * 3
    dt, _ = slope_time(
        lambda c: (c[0],
                   c[1].at[:, :].add(1e-9 * nd.pull_core(
                       c[0], c[1], o, b, 1)[0, :, None])),
        (vol, pts), R1=1, R2=4)
    gpt = P / dt / 1e9
    print(f"xla gather core P={P}: {dt*1e3:.2f} ms -> {gpt:.4f} Gpt/s",
          flush=True)
    return gpt


def components(P=1_000_000, N=256):
    vol, pts = data(P, N, seed=3)
    o, b = (3,) * 3, (3,) * 3
    box = sc.auto_box((N,) * 3, P)
    print("auto box:", box, flush=True)
    wdtype = jnp.float32

    dt, _ = slope_time(
        lambda c: (c[0] + 1e-9 * sc._build_tables(
            c[0], (N,) * 3, o, b, box, wdtype)[0][0, 0, :1, None, None],
            c[1]),
        (vol, pts))
    print(f"  tables build: {dt*1e3:.2f} ms", flush=True)

    nb = tuple(-(-N // bb) for bb in box)
    dt, _ = slope_time(
        lambda c: (c[0],
                   c[1] + 1e-9 * sc._schedule(
                       c[1] + c[0][0, 0, 0, :1], (N,) * 3, box, nb,
                       wdtype)["coords"]),
        (vol, pts))
    print(f"  schedule (sort+seg): {dt*1e3:.2f} ms", flush=True)

    # slot-expansion gather: (NSLOT,) monotonic-ish take from (P, D)
    import math as _m
    import jax as _jax
    NBtot = _m.prod(nb)
    NB8 = -(-NBtot // 8) * 8
    P = pts.shape[0]
    rng = np.random.default_rng(9)
    coords = jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32))
    seg = jnp.sort(jnp.asarray(
        rng.integers(0, P, (NB8,)).astype(np.int32)))
    i_slot = jnp.clip(seg[:, None]
                      + jnp.arange(sc.CAP, dtype=jnp.int32)[None],
                      0, P - 1)
    dt, _ = slope_time(
        lambda c: (c[0],
                   c[1].at[:, :].add(1e-9 * jnp.take(
                       c[0] + c[1][:1, :1], i_slot.reshape(-1), axis=0
                   ).reshape(NB8 * sc.CAP, 3).sum(0)[None])),
        (coords, coords * 1.0))
    print(f"  slot expansion take ({NB8 * sc.CAP} x 3): {dt*1e3:.2f} ms",
          flush=True)

    # unsort: P-gather from slots + P-scatter to original order
    flat = jnp.asarray(rng.standard_normal(
        (1, NB8 * sc.CAP)).astype(np.float32))
    slot_of = jnp.asarray(np.sort(
        rng.integers(0, NB8 * sc.CAP, (P,))).astype(np.int32))
    idx_s = jnp.asarray(rng.permutation(P).astype(np.int32))
    def unsort_body(c):
        v = c[0][:, slot_of]
        out = jnp.zeros((1, P), jnp.float32).at[:, idx_s].set(v)
        return (c[0].at[:, :P].add(1e-9 * out), c[1])
    dt, _ = slope_time(unsort_body, (flat, flat))
    print(f"  unsort gather+scatter (P={P}): {dt*1e3:.2f} ms", flush=True)

    # kernel alone: prebuilt tables + slot inputs
    blo, ext, tab = sc.box_geometry(o, box)
    tables = jnp.asarray(rng.standard_normal(
        (1, NB8, tab)).astype(np.float32))
    NBLK = NB8 // 8
    gs = [jnp.asarray(rng.uniform(4, 12, (NBLK, 8, sc.CAP))
                      .astype(np.float32)) for _ in range(3)]
    valid = jnp.ones((NBLK, 8, sc.CAP), jnp.float32)
    from functools import partial as _p
    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pt
    kern = _p(sc._gather_kernel, orders=o, blo=blo, ext=ext, box=box,
              nb=nb, value=True, grad=False)
    tspec = _pl.BlockSpec((1, 8, tab), lambda c, k: (c, k, 0),
                          memory_space=_pt.VMEM)
    sspec = _pl.BlockSpec((1, 8, sc.CAP), lambda c, k: (k, 0, 0),
                          memory_space=_pt.VMEM)
    ospec = _pl.BlockSpec((1, 1, 8, sc.CAP), lambda c, k: (c, k, 0, 0),
                          memory_space=_pt.VMEM)
    callk = _pl.pallas_call(
        kern, grid=(1, NBLK),
        in_specs=[tspec, sspec, sspec, sspec, sspec],
        out_specs=[ospec],
        out_shape=[jax.ShapeDtypeStruct((1, NBLK, 8, sc.CAP),
                                        jnp.float32)],
        compiler_params=_pt.CompilerParams(
            dimension_semantics=("parallel",) * 2))
    dt, _ = slope_time(
        lambda c: (c[0].at[0, 0, :].add(
            1e-9 * callk(c[0], c[1], gs[1], gs[2], valid)[0][0, 0, 0]),
            c[1]),
        (tables, gs[0]))
    nslots = NB8 * sc.CAP
    print(f"  kernel only ({nslots} slots, TAB={tab}): {dt*1e3:.2f} ms "
          f"-> {nslots/dt/1e9:.3f} Gslot/s", flush=True)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("health:", wait_healthy(), flush=True)
    err = parity()
    gpt, dt = bench(P=P, N=N)
    xla = bench_xla_core()
    components(P=P, N=N)
    print(json.dumps({
        "metric": f"scattered_pull_{P}pts_{N}cubed_cubic",
        "value": round(gpt, 4), "unit": "Gpt/s",
        "parity_maxabs": float(f"{err:.3e}"),
        "xla_core_gpt": round(xla, 5),
        "speedup_vs_xla": round(gpt / xla, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
