"""Sharded-path perf evidence on the virtual CPU mesh (VERDICT r2 #5).

Multi-chip hardware is not attached, so these rows do NOT measure TPU
throughput — they measure the *composition*: what the windowed kernels
inside shard_map cost beyond the raw per-slab compute (halo exchange,
edge correction, shard_map plumbing).  Rows are appended to
BENCH_SUITE.jsonl with ``harness=sharded_cpu_mesh_r3`` and per-device
throughput plus ``halo_overhead_ratio`` = sharded step time / local
single-device run at the SAME local slab size.

Interpreting the ratio depends on the host: with >= ndev usable cores
the virtual devices run concurrently and perfect scaling gives ratio
1.0; on a 1-usable-core host (this measurement box — see
docs/ROUND_NOTES.md) the device threads serialize and the ideal ratio
is ``ndev`` — measured r3: 2.04 at d2 and 3.88 at d4 vs ideals 2 / 4,
i.e. the composition itself costs ~0-2%.

Run (forces a CPU mesh, safe anywhere):
    python scripts/bench_sharded.py [ndev ...]
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scripts_common import slope_time  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_SUITE.jsonl")


def record(entry, harness="sharded_cpu_mesh_r3"):
    entry["device"] = str(jax.devices()[0])
    entry["n_devices_avail"] = len(jax.devices())
    entry["ts"] = time.time()
    entry["harness"] = harness
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


def data(n, max_disp=1.5, seed=0, ny=None):
    ny = ny or n
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((1, 1, n, ny, ny))
                      .astype(np.float32))
    ident = np.stack(np.meshgrid(np.arange(n), np.arange(ny),
                                 np.arange(ny), indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(
        (ident + rng.uniform(-max_disp, max_disp, ident.shape))[None]
        .astype(np.float32))
    return vol, grid


def bench_sharded_op(op_name, n=64, ndev=8, order=3, max_disp=1.5,
                     ny=None):
    from interpol_tpu.parallel import spatial as sp

    o, b = (order,) * 3, (3,) * 3
    vol, grid = data(n, max_disp, ny=ny)
    oshape = tuple(vol.shape[2:])
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))

    if op_name == "pull":
        f = lambda v, g: sp.pull_sharded(
            v, g, o, b, 1, mesh=mesh, max_disp=max_disp, use_window=True)
    elif op_name == "push":
        f = lambda v, g: sp.push_sharded(
            v, g, oshape, o, b, 1, mesh=mesh, max_disp=max_disp,
            use_window=True)
    else:
        f = lambda v, g: sp.grad_sharded(
            v, g, o, b, 1, mesh=mesh, max_disp=max_disp,
            use_window=True)

    # the carry IS the full output (bench.py's rule): feeding back only
    # a scalar lets XLA narrow the windowed chain to one voxel and DCE
    # the rest (observed: 0.0-slope rows)
    def body(c):
        out = f(c[0], c[1])
        if op_name == "grad":
            out = out[..., 0]
        return (out, c[1])

    dt, _ = slope_time(body, (vol, grid), R1=2, R2=16, iters=3)
    gvox = np.prod(vol.shape[2:]) / dt / 1e9
    return dt, gvox


def bench_local_window(op_name, n_loc, order=3, max_disp=1.5):
    """Unsharded single-device run at the LOCAL slab size: the
    perfect-scaling reference for the halo-overhead ratio."""
    from interpol_tpu.ops import window as wd

    o, b = (order,) * 3, (3,) * 3
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.standard_normal((1, n_loc, 64, 64))
                      .astype(np.float32))
    ident = np.stack(np.meshgrid(np.arange(n_loc), np.arange(64),
                                 np.arange(64), indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray((ident + rng.uniform(-max_disp, max_disp,
                                            ident.shape))
                       .astype(np.float32))
    fns = {"pull": wd.pull_window, "push": wd.push_window,
           "grad": wd.grad_window}
    f = fns[op_name]

    def body(c):
        out = f(c[0], c[1], o, b, 1, max_disp)
        if op_name == "grad":
            out = out[..., 0]
        return (out, c[1])

    dt, _ = slope_time(body, (vol, grid), R1=2, R2=16, iters=3)
    return dt


def bench_train_step(ndev=8, n=64):
    """Distributed registration train step on the dryrun mesh layout
    (('data', 'x'), the __graft_entry__ composition) timed end-to-end
    at a realistic volume size."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from interpol_tpu.models import WarpModel
    from interpol_tpu.parallel.spatial import pull_sharded

    dx = 4 if ndev % 4 == 0 else (2 if ndev % 2 == 0 else 1)
    dd = ndev // dx
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(dd, dx),
                ("data", "x"))
    vol = (n, n, n)
    model = WarpModel(vol_shape=vol, coarse_shape=(8, 8, 8),
                      interpolation=3, bound="dct2", max_disp=1.5)
    B = dd
    rng = np.random.default_rng(2)
    params = model.init_params(B) + 0.01 * jnp.asarray(
        rng.standard_normal((B, 8, 8, 8, 3)).astype(np.float32))
    moving = jnp.asarray(
        rng.standard_normal((B, 1) + vol).astype(np.float32))
    fixed = jnp.asarray(
        rng.standard_normal((B, 1) + vol).astype(np.float32))
    vol_spec = NamedSharding(mesh, P("data", None, "x"))
    rep = NamedSharding(mesh, P())
    moving = jax.device_put(moving, vol_spec)
    fixed = jax.device_put(fixed, vol_spec)
    params = jax.device_put(params, rep)

    def loss_fn(p, mv, fx):
        flow = model.dense_flow(p)
        warped = pull_sharded(
            mv, flow, (3,) * 3, (3,) * 3, 1, mesh=mesh, axis_name="x",
            max_disp=model.max_disp, batch_axis="data")
        return jnp.mean((warped - fx) ** 2)

    def body(c):
        l, g = jax.value_and_grad(loss_fn)(c[0], c[1], c[2])
        return (c[0] - 0.1 * g, c[1], c[2])

    dt, _ = slope_time(body, (params, moving, fixed), R1=1, R2=3,
                       iters=2)
    return dt


def bench_points(op_name, P=200_000, n=64, ndev=8, order=3):
    """Point-axis sharding (parallel/points.py) on the virtual mesh:
    pull is zero-collective, push is one psum.  Like the slab rows,
    this measures the *composition* overhead — the ratio of the
    sharded run to a single-device run at the SAME local point count
    (ideal = ndev on the 1-usable-core host, 1.0 with >= ndev cores).
    The inner op is the XLA gather/scatter core (the CPU path); the
    sharding layer is identical to what wraps the Pallas tier on TPU."""
    from interpol_tpu.parallel import points as pp
    from interpol_tpu.ops import ndkernels as nd

    o, b = (order,) * 3, (3,) * 3
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, 1) + (n,) * 3)
                      .astype(np.float32))              # (B, C, *ishape)
    pts = jnp.asarray(rng.uniform(0, n - 1, (1, P, 3))
                      .astype(np.float32))              # (B, P, D)
    vals = jnp.asarray(rng.standard_normal((1, 1, P))
                       .astype(np.float32))             # (B, C, P)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))

    if op_name == "pull":
        def body(c):        # sharded: out (B, C, P)
            out = pp.pull_points(c[0], c[1], o, b, 1, mesh=mesh)
            return (c[0] + 1e-9 * out[0, 0, 0],
                    c[1] + 1e-9 * out[0, :1, :, None])

        def bodyl(c):       # local, unbatched core at P/ndev points
            out = nd.pull_core(c[0], c[1], o, b, 1)
            return (c[0] + 1e-9 * out[0, 0],
                    c[1] + 1e-9 * out[0, :, None])

        dt, _ = slope_time(body, (vol, pts), R1=2, R2=8, iters=2)
        dtl, _ = slope_time(bodyl, (vol[0], pts[0, :P // ndev]),
                            R1=2, R2=8, iters=2)
    else:
        def body(c):        # sharded: out (B, C, *oshape) replicated
            out = pp.push_points(c[0], c[1], (n,) * 3, o, b, 1,
                                 mesh=mesh)
            return (c[0] + 1e-9 * out[0, 0, 0, 0, 0],
                    c[1] + 1e-9 * out[0, 0, 0, 0, :3])

        def bodyl(c):
            out = nd.push_core(c[0], c[1], (n,) * 3, o, b, 1)
            return (c[0] + 1e-9 * out[0, 0, 0, 0],
                    c[1] + 1e-9 * out[0, 0, 0, :3])

        dt, _ = slope_time(body, (vals, pts), R1=2, R2=8, iters=2)
        dtl, _ = slope_time(bodyl, (vals[0, :, :P // ndev],
                                    pts[0, :P // ndev]),
                            R1=2, R2=8, iters=2)
    return dt, dtl


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "weak":
        # WEAK scaling (round-4 verdict #6): the per-device slab is
        # FIXED ((n_loc, 64, 64) — only the SHARDED axis grows with
        # ndev) — the regime slab sharding exists for (a volume too
        # large for one device).  Ideal on the 1-usable-core host:
        # total time = ndev * local_ref (threads serialize); with real
        # parallel devices: total = local_ref + halo cost.
        n_loc = 16
        for op in ("pull", "grad", "push"):
            for ndev in (2, 4, 8):
                n = n_loc * ndev
                dt, gvox = bench_sharded_op(op, n=n, ndev=ndev, ny=64)
                loc = bench_local_window(op, n_loc)
                record({
                    "key": f"sharded_weak_{op}_slab16x64x64_d{ndev}",
                    "op": f"{op}_sharded_window_weak", "n": n,
                    "ny": 64, "n_loc": n_loc, "ndev": ndev, "order": 3,
                    "max_disp": 1.5,
                    "total_ms": round(dt * 1e3, 3),
                    "gvox_s": round(gvox, 4),
                    "local_ref_ms": round(loc * 1e3, 3),
                    "serialized_overhead_ratio":
                        round(dt / (ndev * loc), 3),
                }, harness="sharded_cpu_mesh_r5")
        P_loc = 50_000
        for op in ("pull", "push"):
            for ndev in (2, 4, 8):
                P = P_loc * ndev
                dt, dtl = bench_points(op, P=P, n=64, ndev=ndev)
                record({
                    "key": f"sharded_weak_points_{op}_Ploc50k_d{ndev}",
                    "op": f"{op}_points_sharded_weak", "points": P,
                    "size": 64, "ndev": ndev, "order": 3,
                    "total_ms": round(dt * 1e3, 3),
                    "local_ref_ms": round(dtl * 1e3, 3),
                    "serialized_overhead_ratio":
                        round(dt / (ndev * dtl), 3),
                }, harness="sharded_points_r5")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "points":
        P, n = 200_000, 64
        for op in ("pull", "push"):
            for ndev in (2, 4, 8):
                dt, dtl = bench_points(op, P=P, n=n, ndev=ndev)
                record({
                    "key": f"sharded_points_{op}_P{P//1000}k_d{ndev}",
                    "op": f"{op}_points_sharded", "points": P,
                    "size": n, "ndev": ndev, "order": 3,
                    "total_ms": round(dt * 1e3, 3),
                    "gpt_s": round(P / dt / 1e9, 5),
                    "local_ref_ms": round(dtl * 1e3, 3),
                    "overhead_ratio": round(dt / dtl, 3),
                }, harness="sharded_points_r4")
        return
    ndevs = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    n = 64
    for op in ("pull", "grad", "push"):
        base = {}
        for ndev in ndevs:
            dt, gvox = bench_sharded_op(op, n=n, ndev=ndev)
            loc = bench_local_window(op, n // ndev)
            record({
                "key": f"sharded_{op}_n{n}_d{ndev}",
                "op": f"{op}_sharded_window", "n": n, "ndev": ndev,
                "order": 3, "max_disp": 1.5,
                "total_ms": round(dt * 1e3, 3),
                "gvox_s": round(gvox, 4),
                "gvox_s_per_dev": round(gvox / ndev, 4),
                "local_ref_ms": round(loc * 1e3, 3),
                "halo_overhead_ratio": round(dt / loc, 3),
            })
    try:
        dt = bench_train_step(ndev=8, n=n)
        record({"key": f"sharded_trainstep_n{n}_d8",
                "op": "train_step_sharded", "n": n, "ndev": 8,
                "total_ms": round(dt * 1e3, 3)})
    except Exception as e:
        record({"key": "sharded_trainstep_error", "error": str(e)[:200]})


if __name__ == "__main__":
    main()
