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


def parity_push(n=64, P=20000):
    vol, pts = data(P, n, seed=4)
    o, b = (3,) * 3, (3,) * 3
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.standard_normal((1, P)).astype(np.float32))
    ref = jax.jit(lambda v, p: nd.push_core(v, p, (n,) * 3, o, b, 1)
                  )(vals, pts)
    out = jax.jit(lambda v, p: sc.push_scattered(v, p, (n,) * 3, o, b,
                                                 1))(vals, pts)
    err = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    print(f"parity push(rel)={err:.2e}", flush=True)
    return err


def bench_push(P=1_000_000, N=256):
    vol, pts = data(P, N, seed=6)
    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.standard_normal((1, P)).astype(np.float32))
    o, b = (3,) * 3, (3,) * 3

    def body(c):
        out = sc.push_scattered(c[0], c[1], (N,) * 3, o, b, 1)
        return (c[0], c[1] + 1e-9 * out[0, 0, 0, :3])

    dt, _ = slope_time(body, (vals, pts))
    gpt = P / dt / 1e9
    print(f"push_scattered P={P} N={N}: {dt*1e3:.2f} ms -> "
          f"{gpt:.4f} Gpt/s", flush=True)
    return gpt, dt


def bench_xla_push(P=100_000, N=256):
    vol, pts = data(P, N, seed=8)
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.standard_normal((1, P)).astype(np.float32))
    o, b = (3,) * 3, (3,) * 3

    def body(c):
        out = nd.push_core(c[0], c[1], (N,) * 3, o, b, 1)
        return (c[0], c[1] + 1e-9 * out[0, 0, 0, :3])

    dt, _ = slope_time(body, (vals, pts), R1=1, R2=4)
    gpt = P / dt / 1e9
    print(f"xla scatter core P={P}: {dt*1e3:.2f} ms -> {gpt:.4f} Gpt/s",
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

    print("  (kernel + epilogue = end-to-end minus the above)", flush=True)


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
    errp = parity_push()
    pgpt, _ = bench_push(P=P, N=N)
    pxla = bench_xla_push()
    print(json.dumps({
        "metric": f"scattered_push_{P}pts_{N}cubed_cubic",
        "value": round(pgpt, 4), "unit": "Gpt/s",
        "parity_rel": float(f"{errp:.3e}"),
        "xla_core_gpt": round(pxla, 5),
        "speedup_vs_xla": round(pgpt / pxla, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
