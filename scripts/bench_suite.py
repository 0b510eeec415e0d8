"""Quantitative baseline suite (BASELINE.md: the reference publishes no
numbers, so this framework establishes them).

Measures pull/push/grad (windowed warp path) and the prefilter at several
volume sizes / orders / dtypes on the attached accelerator, appending one
JSON line per measurement to ``BENCH_SUITE.jsonl`` — incremental and
restartable, because the shared device tunnel can stall between runs.

Usage:  python scripts/bench_suite.py [quick|full]
"""
import itertools
import json
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_healthy, _sync  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_SUITE.jsonl")


def record(entry):
    entry["device"] = str(jax.devices()[0])
    entry["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


def done_keys():
    keys = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                e = json.loads(line)
                keys.add(e["key"])
            except Exception:
                pass
    return keys


def measure_chain(f, args, feedback, iters=3):
    def run(n):
        cur = args
        out = None
        for _ in range(n):
            out = f(*cur)
            cur = feedback(cur, out)
        _sync(out)

    run(2)    # compile the op AND the chain's auxiliary ops
    t0 = time.time()
    run(iters)
    return max((time.time() - t0) / iters, 1e-9)


def bench_op(op, n, order, dtype_name, max_disp=2.0):
    from interpol_tpu.ops import window as wdm
    from interpol_tpu.ops import coeff as cf

    dtype = dict(fp32=jnp.float32, bf16=jnp.bfloat16)[dtype_name]
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32)
                      ).astype(dtype)
    if op == "coeff":
        f = jax.jit(partial(cf.spline_coeff_nd, orders=(order,) * 3,
                            bounds=(3,) * 3, ndim=3))
        dt = measure_chain(f, (vol,),
                           lambda a, o: (vol + o[0, 0, 0] * 1e-30,))
        return dt

    ident = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-max_disp, max_disp,
                                           ident.shape).astype(np.float32)
                       ).astype(dtype)
    o, b = (order,) * 3, (3,) * 3
    if op == "pull":
        g = jax.jit(lambda v, gr: wdm.pull_window(v[None], gr, o, b, 1,
                                                  max_disp)[0])
    elif op == "push":
        g = jax.jit(lambda v, gr: wdm.push_window(v[None], gr, o, b, 1,
                                                  max_disp)[0])
    elif op == "grad":
        g = jax.jit(lambda v, gr: wdm.grad_window(v[None], gr, o, b, 1,
                                                  max_disp)[0])
    return measure_chain(
        g, (vol, grid),
        lambda a, out: (vol + jnp.ravel(out)[0].astype(dtype) * 1e-30,
                        grid))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "quick":
        sizes, orders, dtypes = [128], [1, 3], ["fp32"]
        ops = ["pull", "push", "coeff"]
    else:
        sizes, orders, dtypes = [128, 192, 256], [1, 3, 5], ["fp32", "bf16"]
        ops = ["pull", "push", "grad", "coeff"]

    skip = done_keys()
    for op, n, order, dt in itertools.product(ops, sizes, orders, dtypes):
        if op == "coeff" and (dt == "bf16" or order == 1):
            continue
        key = f"{op}_{n}_{order}_{dt}"
        if key in skip:
            continue
        try:
            h = wait_healthy()
            secs = bench_op(op, n, order, dt)
        except Exception as e:   # record and keep going
            record({"key": key, "error": str(e)[:200]})
            continue
        record({"key": key, "op": op, "size": n, "order": order,
                "dtype": dt, "ms": round(secs * 1e3, 2),
                "gvox_s": round(n ** 3 / secs / 1e9, 4),
                "health_s": round(h, 2)})


if __name__ == "__main__":
    main()
