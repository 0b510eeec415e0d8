"""Quantitative baseline suite (BASELINE.md: the reference publishes no
numbers, so this framework establishes them).

Measures pull/push/grad (windowed warp path), the prefilter, and the
warp-MSE training step at several volume sizes / orders on the attached
accelerator, appending one JSON line per measurement to
``BENCH_SUITE.jsonl`` — incremental and restartable, because the shared
device tunnel can stall between runs.

Round-2 harness: ``scripts_common.slope_time`` (fori_loop chains at a
runtime trip count, >=1e-6 input perturbation, slope between two chain
lengths) — cancels the tunnel's dispatch floor, sync latency, and
value-level result caching.  Round-1 rows in the JSONL used a
dispatch-exposed harness and are superseded.

Usage:  python scripts/bench_suite.py [quick|full|step|scattered|second]
"""
import itertools
import json
import math
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scripts_common import wait_healthy, slope_time  # noqa: E402

HARNESS = "slope_fori_r5"  # bumped per kernel-generation: re-measures all keys
# r3c: third-gen splat kernels (kernel-side value DMA, native pushgrad
# backward), doctrine-#5 perturbation fixes in the scattered chains.
# r3d: scattered-tier overflow round (lax.cond second pass when a box
# overflows its 128-slot ladder) + single-payload return sort (slot
# results come back via ONE shared gather + ONE lax.sort).
# r4: sorted-stream return in the gather kernel (results RMW'd into a
# (C, n_out, ~P) stream at sorted positions; ONE payload sort back to
# user order, NO per-point gather — lab-8: gathers are ~7 ms/1M
# regardless of index order, sorts ~1.5 ms regardless of width);
# per-ROW (was per-block) DMA-window fallback predicate.
# r5: fused custom-vjp forwards on the scattered tier (pull's vjp fwd
# computes value+grad in ONE kernel pass, grad's fwd grad+hess; the
# backward's separate gather pass disappears); per-BLOCK overflow-round
# skip; native Pallas hess/pushgrad window kernels (second-order rows);
# self-normalizing coeff chain (values stay finite — r4 advisor).
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_SUITE.jsonl")


def record(entry):
    entry["device"] = str(jax.devices()[0])
    entry["ts"] = time.time()
    entry["harness"] = HARNESS
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


def done_keys():
    keys = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                e = json.loads(line)
                if e.get("harness") == HARNESS and "error" not in e:
                    keys.add(e["key"])
            except Exception:
                pass
    return keys


def _adaptive_slope(body, args, R1=2, R2=12):
    """slope_time, re-measured with a longer chain when the first
    slope's total contrast is under ~20 ms (sub-ms ops at the default
    R2=12 sit below the tunnel's dispatch-floor noise and can report a
    0.0 slope — observed for order-1/coeff/resize at 128^3)."""
    dt, ts = slope_time(body, args, R1=R1, R2=R2)
    if dt * (R2 - R1) < 0.02:
        need = int(math.ceil(0.03 / max(dt, 2e-5)))
        R2b = min(R1 + need, 2048)
        if R2b > R2:
            dt, ts = slope_time(body, args, R1=R1, R2=R2b)
    return dt, ts


def bench_op(op, n, order, dtype_name, max_disp=2.0):
    from interpol_tpu.ops import window as wdm
    from interpol_tpu.ops import coeff as cf

    dtype = dict(fp32=jnp.float32, bf16=jnp.bfloat16)[dtype_name]
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, n, n, n)).astype(np.float32)
                      ).astype(dtype)
    o, b = (order,) * 3, (3,) * 3
    if op == "coeff":
        # very fast op: widen the chain-length contrast so the slope
        # rises above queue noise; self-normalizing body (r4 advisor:
        # the cubic inverse prefilter gains ~27x per application, so an
        # undamped chain overflows fp32 around iteration ~30)
        dt, _ = _adaptive_slope(
            lambda c: (cf.spline_coeff_nd(c[0], o, b, 3) * 0.0370,),
            (vol,), R1=2, R2=62)
        return dt

    ident = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-max_disp, max_disp,
                                           ident.shape).astype(np.float32))
    if op == "pull":
        body = lambda c: (wdm.pull_window(c[0], c[1], o, b, 1, max_disp
                                          ).astype(dtype), c[1])
    elif op == "push":
        body = lambda c: (wdm.push_window(c[0], c[1], o, b, 1, max_disp
                                          ).astype(dtype), c[1])
    elif op == "grad":
        def body(c):
            g = wdm.grad_window(c[0], c[1], o, b, 1, max_disp)
            return (g[..., 0].astype(dtype)
                    + (1e-6 * (g[..., 1] + g[..., 2])).astype(dtype),
                    c[1])
    dt, _ = _adaptive_slope(body, (vol, grid))
    return dt


def bench_adaptive(n, md):
    """Adaptive per-tile windows on a tile-smooth field (spread 0.75)."""
    from interpol_tpu.ops import window as wdm
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, n, n, n)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    x = np.linspace(0, np.pi / 2, n)
    d = np.zeros((n, n, n, 3), np.float32)
    d[..., 0] = (md * 0.9 * np.sin(x)).reshape(n, 1, 1)
    d[..., 1] = (md * 0.9 * np.cos(x)).reshape(1, n, 1)
    d[..., 2] = (md * 0.9 * np.sin(x + 1)).reshape(n, 1, 1)
    grid = jnp.asarray(ident + d)
    o, b = (3,) * 3, (3,) * 3
    sp = (0.75, 0.75, 0.75)
    dt, _ = _adaptive_slope(
        lambda c: (wdm.pull_window(c[0], c[1], o, b, 1, float(md), sp),
                   c[1]),
        (vol, grid), R1=2, R2=42)
    return dt


def bench_2d(n, order=3, max_disp=2.0):
    """2-D dense warp through the lifted 3-D kernel (dummy axis)."""
    from interpol_tpu.ops import window as wdm
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(n)] * 2, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-max_disp, max_disp,
                                           ident.shape).astype(np.float32))
    o, b = (order,) * 2, (3,) * 2
    dt, _ = _adaptive_slope(
        lambda c: (wdm.pull_window(c[0], c[1], o, b, 1, max_disp), c[1]),
        (vol, grid), R1=2, R2=42)
    return dt


def bench_resize(n, factor=2):
    """Separable MXU resize: upsample n^3 -> (factor*n)^3 (cubic,
    prefilter)."""
    from interpol_tpu.ops.resize import resize
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, 1, n, n, n))
                      .astype(np.float32))
    dt, _ = _adaptive_slope(
        lambda c: (resize(c[0], factor=[factor] * 3, interpolation=3,
                          prefilter=True)[..., :n, :n, :n] * (1 / factor),
                   ),
        (vol,), R1=2, R2=62)
    return dt


def _scatter_data(P, N, seed=0):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((1, N, N, N)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, N - 1, (P, 3)).astype(np.float32))
    return vol, pts


def bench_scattered(kind, P=1_000_000, N=256):
    """Scattered-grid native tier rows (1M points into N^3, cubic).

    kinds: pull (one-shot), pull_amortized (precomputed box tables —
    repeated sampling of one volume), grad (fused 3-derivative),
    push (box-densifying MXU splat).  Each row also times the XLA
    gather/scatter core at P/10 (extrapolated per-point) for the
    speedup column."""
    from interpol_tpu.ops import scattered as sc
    from interpol_tpu.ops import ndkernels as nd
    o, b = (3,) * 3, (3,) * 3
    vol, pts = _scatter_data(P, N)
    if kind == "push":
        rng = np.random.default_rng(7)
        vals = jnp.asarray(rng.standard_normal((1, P)).astype(np.float32))

        def body(c):
            out = sc.push_scattered(c[0], c[1], (N,) * 3, o, b, 1)
            # doctrine #5: perturb EVERY input whose downstream
            # sub-computation should be counted (vals feeds the sort
            # payload + slot expansion)
            return (c[0] + 1e-9 * out[0, 0, 0, 0],
                    c[1] + 1e-9 * out[0, 0, 0, :3])
        dt, _ = slope_time(body, (vals, pts))

        def xbody(c):
            out = nd.push_core(c[0], c[1], (N,) * 3, o, b, 1)
            return (c[0] + 1e-9 * out[0, 0, 0, 0],
                    c[1] + 1e-9 * out[0, 0, 0, :3])
        xv, xp = _scatter_data(P // 10, N, seed=2)
        xdt, _ = slope_time(
            xbody, (vals[:, :P // 10], xp), R1=1, R2=4)
        xgpt = (P // 10) / xdt / 1e9
    else:
        pre, box = None, None
        if kind == "pull_amortized":
            box = sc.auto_box((N,) * 3, P)
            pre = jax.jit(partial(sc.precompute_tables, orders=o,
                                  bounds=b, box=box))(vol)
            pre.block_until_ready()
        if kind == "grad":
            def body(c):
                g = sc.grad_scattered(c[0], c[1], o, b, 1)
                # doctrine #5: perturb vol too, or XLA hoists the
                # vol->tables build out of the fori_loop (observed:
                # 26 ms reported vs the honest ~34)
                return (c[0] + 1e-9 * g[0, 0, 0],
                        c[1] + 1e-9 * g[0])
        elif kind == "pull_vjp":
            def loss(v, p):
                return jnp.sum(sc.pull_scattered(v, p, o, b, 1) ** 2)

            def body(c):
                gv, gp = jax.grad(loss, argnums=(0, 1))(c[0], c[1])
                return (c[0] + 1e-9 * gv, c[1] + 1e-9 * gp)
        else:
            def body(c):
                out = sc.pull_scattered(c[0], c[1], o, b, 1,
                                        pre=pre, box=box)
                # one-shot: perturb vol so the table build is counted
                # (doctrine #5).  Amortized (pre= given): vol stays
                # loop-invariant BY DESIGN — the tables are precomputed.
                v = c[0] if pre is not None else c[0] + 1e-9 * out[0, 0]
                return (v, c[1].at[:, :].add(1e-9 * out[0, :, None]))
        dt, _ = slope_time(body, (vol, pts))

        xv, xp = _scatter_data(P // 10, N, seed=2)
        if kind == "grad":
            def xbody(c):
                out = nd.grad_core(c[0], c[1], o, b, 1)
                return (c[0] + 1e-9 * out[0, 0, 0],
                        c[1] + 1e-9 * out[0])
        elif kind == "pull_vjp":
            def xloss(v, p):
                return jnp.sum(nd.pull_core(v, p, o, b, 1) ** 2)

            def xbody(c):
                gv, gp = jax.grad(xloss, argnums=(0, 1))(c[0], c[1])
                return (c[0] + 1e-9 * gv, c[1] + 1e-9 * gp)
        else:
            def xbody(c):
                out = nd.pull_core(c[0], c[1], o, b, 1)
                return (c[0] + 1e-9 * out[0, 0],
                        c[1].at[:, :].add(1e-9 * out[0, :, None]))
        xdt, _ = slope_time(xbody, (xv, xp), R1=1, R2=4)
        xgpt = (P // 10) / xdt / 1e9
    return dt, xgpt


def bench_step(n, adaptive=False):
    """Full warp-MSE value_and_grad training step (flagship model);
    ``adaptive``: tile_spread="auto" per-tile windows (the flow is
    coarse-upsampled, hence tile-smooth by construction)."""
    from interpol_tpu.models import WarpModel
    rng = np.random.default_rng(0)
    kw = dict(tile_spread="auto") if adaptive else {}
    model = WarpModel(vol_shape=(n, n, n), coarse_shape=(8, 8, 8),
                      interpolation=3, bound="dct2", **kw)
    params = model.init_params(1) + 0.01
    moving = jnp.asarray(
        rng.standard_normal((1, 1, n, n, n)).astype(np.float32))
    fixed = moving * 0.9

    def body(c):
        p = c[0]
        _, g = jax.value_and_grad(
            lambda pp: jnp.mean((model.warp(pp, moving) - fixed) ** 2))(p)
        return (p - 0.1 * g,)

    dt, _ = slope_time(body, (params,))
    return dt


def bench_grad_vjp(n, md=2.0):
    """jax.grad THROUGH grid_grad at full volume — the
    Jacobian-determinant / bending-energy regularizer backward, which
    evaluates pushgrad_window + hess_window (native Pallas kernels,
    round 5) at n^3.  The round-4 verdict's tracked number for the
    second-order production path (previously the XLA formulation OOM'd
    at 256^3)."""
    from interpol_tpu.ops import window as wdm
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, n, n, n)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(ident + rng.uniform(-md, md, ident.shape)
                       .astype(np.float32))
    o, b = (3,) * 3, (3,) * 3

    def loss(v, g2):
        return (wdm.grad_window(v, g2, o, b, 1, md) ** 2).sum()

    def body(c):
        gv, gg = jax.grad(loss, argnums=(0, 1))(c[0], c[1])
        return (c[0] + 1e-9 * gv, c[1] + 1e-9 * gg)

    dt, _ = slope_time(body, (vol, grid))
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "scattered":
        skip = done_keys()
        for kind in ["pull", "pull_amortized", "grad", "push",
                     "pull_vjp"]:
            key = f"scattered_{kind}_1M_256_3_fp32"
            if key in skip:
                continue
            try:
                h = wait_healthy()
                secs, xgpt = bench_scattered(kind)
            except Exception as e:
                record({"key": key, "error": str(e)[:200]})
                continue
            gpt = 1_000_000 / secs / 1e9
            record({"key": key, "op": f"scattered_{kind}", "points": 10 ** 6,
                    "size": 256, "order": 3, "dtype": "fp32",
                    "ms": round(secs * 1e3, 3), "gpt_s": round(gpt, 4),
                    "xla_core_gpt_s": round(xgpt, 5),
                    "speedup_vs_xla": round(gpt / xgpt, 1),
                    "health_s": round(h, 2)})
        return
    if mode == "second":
        # second-order + flagship-at-256 rows (round-4 verdict #1/#8)
        skip = done_keys()
        for n in [128, 256]:
            key = f"grad_vjp_{n}_3_fp32"
            if key in skip:
                continue
            try:
                h = wait_healthy()
                secs = bench_grad_vjp(n)
            except Exception as e:
                record({"key": key, "error": str(e)[:200]})
                continue
            record({"key": key, "op": "grad_vjp", "size": n, "order": 3,
                    "dtype": "fp32", "ms": round(secs * 1e3, 3),
                    "gvox_s": round(n ** 3 / secs / 1e9, 4),
                    "health_s": round(h, 2)})
        for n, adaptive in [(256, False), (256, True)]:
            key = f"step_{n}_3_fp32" + ("_adaptive" if adaptive else "")
            if key in skip:
                continue
            try:
                h = wait_healthy()
                secs = bench_step(n, adaptive=adaptive)
            except Exception as e:
                record({"key": key, "error": str(e)[:200]})
                continue
            record({"key": key, "op": "train_step", "size": n,
                    "order": 3, "dtype": "fp32",
                    "adaptive": adaptive,
                    "ms": round(secs * 1e3, 3),
                    "health_s": round(h, 2)})
        return
    if mode == "quick":
        sizes, orders, dtypes = [128], [1, 3], ["fp32"]
        ops = ["pull", "push", "coeff"]
        steps = []
    elif mode == "step":
        sizes, orders, dtypes, ops = [], [], [], []
        steps = [128, 192]
    else:
        sizes, orders, dtypes = [128, 192, 256], [1, 3, 5], ["fp32", "bf16"]
        ops = ["pull", "push", "grad", "coeff"]
        steps = [128, 192]

    skip = done_keys()
    for op, n, order, dt in itertools.product(ops, sizes, orders, dtypes):
        if op == "coeff" and (dt == "bf16" or order == 1):
            continue
        if dt == "bf16" and (n, order) != (256, 3):
            continue      # bf16: one representative point (compute is f32)
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
                "dtype": dt, "ms": round(secs * 1e3, 3),
                "gvox_s": round(n ** 3 / secs / 1e9, 4),
                "health_s": round(h, 2)})

    for n in ([] if mode == "quick" else [2048]):
        key = f"pull2d_{n}_3_fp32"
        if key in skip:
            continue
        try:
            h = wait_healthy()
            secs = bench_2d(n)
        except Exception as e:
            record({"key": key, "error": str(e)[:200]})
            continue
        record({"key": key, "op": "pull_2d", "size": n, "order": 3,
                "dtype": "fp32", "ms": round(secs * 1e3, 3),
                "gvox_s": round(n ** 2 / secs / 1e9, 4),
                "health_s": round(h, 2)})

    for n in ([] if mode == "quick" else [128]):
        key = f"resize_{n}_x2_3_fp32"
        if key in skip:
            continue
        try:
            h = wait_healthy()
            secs = bench_resize(n)
        except Exception as e:
            record({"key": key, "error": str(e)[:200]})
            continue
        nvox = (2 * n) ** 3
        record({"key": key, "op": "resize_x2", "size": n, "order": 3,
                "dtype": "fp32", "ms": round(secs * 1e3, 3),
                "gvox_s": round(nvox / secs / 1e9, 4),
                "health_s": round(h, 2)})

    for n, md in ([] if mode == "quick" else [(128, 4.0), (128, 8.0),
                                              (256, 4.0)]):
        key = f"pull_adaptive_{n}_md{int(md)}"
        if key in skip:
            continue
        try:
            h = wait_healthy()
            secs = bench_adaptive(n, md)
        except Exception as e:
            record({"key": key, "error": str(e)[:200]})
            continue
        record({"key": key, "op": "pull_adaptive", "size": n,
                "max_disp": md, "spread": 0.75, "order": 3,
                "dtype": "fp32", "ms": round(secs * 1e3, 3),
                "gvox_s": round(n ** 3 / secs / 1e9, 4),
                "health_s": round(h, 2)})

    for n in steps:
        key = f"step_{n}_3_fp32"
        if key in skip:
            continue
        try:
            h = wait_healthy()
            secs = bench_step(n)
        except Exception as e:
            record({"key": key, "error": str(e)[:200]})
            continue
        record({"key": key, "op": "train_step", "size": n, "order": 3,
                "dtype": "fp32", "ms": round(secs * 1e3, 3),
                "health_s": round(h, 2)})


if __name__ == "__main__":
    main()
