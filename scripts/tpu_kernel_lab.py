"""Kernel lab: on-chip A/B experiments for the windowed warp pull kernel.

Round-2 perf campaign (VERDICT task 2): the round-1 kernel spends ~2/3 of
its VPU issue slots on per-term lane rolls (S^3 of them).  Variants here
restructure the data movement so the inner loop is pure FMA:

  v0     round-1 kernel (package import) — baseline
  v1     ky-loop builds Sz pre-cropped z-slabs once; (kx, kz) inner loop
         reads them at dynamic leading-dim offsets (free addressing)
  v1s    v1 with the ky loop static-unrolled (register/compile tradeoff)
  gather probe: per-voxel take_along_axis on the lane dim (tap-form z)

Run:  python scripts/tpu_kernel_lab.py [N] [variants...]
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
from scripts_common import sync, wait_healthy  # noqa: E402

from interpol_tpu.ops.splines import bspline_taps  # noqa: E402
from interpol_tpu.ops.window import (  # noqa: E402
    _pad_folded, _window_geom, window_range)
from interpol_tpu.ops.pallas_warp import (  # noqa: E402
    _coef_planes, _pad_grid_edge, _aligned, pull_window_pallas)


# ---------------------------------------------------------------- v1

def _kernel_v1(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref,
               box, zslab, cx_ref, cy_ref, acc_ref, sem, *,
               orders, ranges, tile, box_shape, static_ky):
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(x0, BXa), pl.ds(y0, BYa), pl.ds(z0, BZa)],
        box, sem)
    cp.start()

    shape = (TX, TY, TZ)
    for k, c in enumerate(_coef_planes(gx_ref[...], orders[0], sx0, sx1,
                                       x0, 0, shape)):
        cx_ref[k] = c
    for k, c in enumerate(_coef_planes(gy_ref[...], orders[1], sy0, sy1,
                                       y0, 1, shape)):
        cy_ref[k] = c
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape)

    cp.wait()
    bval = box[...]

    acc_ref[...] = jnp.zeros(shape, dtype=acc_ref.dtype)

    def xbody(kx, ky):
        zacc = None
        for kz in range(Sz):
            t = czs[kz] * zslab[kz, pl.ds(kx, TX)]
            zacc = t if zacc is None else zacc + t
        acc_ref[...] += (cx_ref[kx] * cy_ref[ky]) * zacc
        return ky

    def ky_step(ky):
        # roll the full box so row ky is at sublane 0, crop to TY rows,
        # then stage Sz statically-cropped z-slabs (shared across kx)
        ys = pltpu.roll(bval, BYa - ky, 1)[:, 0:TY, :]
        for kz in range(Sz):
            zslab[kz] = ys[:, :, kz:kz + TZ]
        jax.lax.fori_loop(0, Sx, xbody, ky)

    if static_ky:
        for ky in range(Sy):
            ky_step(ky)
    else:
        def body(ky, _):
            ky_step(ky)
            return 0
        jax.lax.fori_loop(0, Sy, body, 0)

    out_ref[...] = acc_ref[...]


def pull_v1(inp, grid, orders, bounds, max_disp, tile, static_ky=False,
            box_dtype=None):
    ishape = tuple(inp.shape)
    D = 3
    wdtype = jnp.float32
    box_dtype = box_dtype or wdtype
    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]

    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(box_dtype)[None], ishape, bounds,
                       lo, hi, box_dtype)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    kernel = partial(_kernel_v1, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape,
                     static_ky=static_ky)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    g = grid.astype(wdtype)
    out = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[gspec, gspec, gspec,
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ishape_a, wdtype),
        scratch_shapes=[
            pltpu.VMEM(box_shape, box_dtype),
            pltpu.VMEM((S[2], box_shape[0], tile[1], tile[2]), wdtype),
            pltpu.VMEM((S[0],) + tuple(tile), wdtype),
            pltpu.VMEM((S[1],) + tuple(tile), wdtype),
            pltpu.VMEM(tuple(tile), wdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(g[..., 0], g[..., 1], g[..., 2], vpad)
    return out[:ishape[0], :ishape[1], :ishape[2]]


# ---------------------------------------------------------------- v2
# Fully static shift loops; z-slabs live as *values* (register-resident,
# static kx slicing is free vreg selection); accumulator is a value too.
# VMEM traffic per term: none (beyond the one box DMA + coef planes).

def _kernel_v2(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref, box, sem, *,
               orders, ranges, tile, box_shape, static_ky):
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(x0, BXa), pl.ds(y0, BYa), pl.ds(z0, BZa)],
        box, sem)
    cp.start()

    shape = (TX, TY, TZ)
    cxs = _coef_planes(gx_ref[...], orders[0], sx0, sx1, x0, 0, shape)
    cys = _coef_planes(gy_ref[...], orders[1], sy0, sy1, y0, 1, shape)
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape)

    cp.wait()
    bval = box[...]

    acc = jnp.zeros(shape, dtype=out_ref.dtype)
    for ky in range(Sy):
        ys = bval if ky == 0 else pltpu.roll(bval, BYa - ky, 1)
        ys = ys[:, 0:TY, :]
        zvals = [ys[:, :, kz:kz + TZ] for kz in range(Sz)]
        for kx in range(Sx):
            zacc = None
            for kz in range(Sz):
                t = czs[kz] * zvals[kz][kx:kx + TX]
                zacc = t if zacc is None else zacc + t
            acc = acc + (cxs[kx] * cys[ky]) * zacc
    out_ref[...] = acc


def pull_v2(inp, grid, orders, bounds, max_disp, tile, box_dtype=None):
    ishape = tuple(inp.shape)
    D = 3
    wdtype = jnp.float32
    box_dtype = box_dtype or wdtype
    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]

    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(box_dtype)[None], ishape, bounds,
                       lo, hi, box_dtype)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    kernel = partial(_kernel_v2, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape, static_ky=True)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    g = grid.astype(wdtype)
    out = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[gspec, gspec, gspec,
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ishape_a, wdtype),
        scratch_shapes=[
            pltpu.VMEM(box_shape, box_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(g[..., 0], g[..., 1], g[..., 2], vpad)
    return out[:ishape[0], :ishape[1], :ishape[2]]


# ---------------------------------------------------------------- v3
# kz-outer loop: one z-slab live at a time (small shuffle set); per-kx
# zacc accumulators stay in registers across the kz loop; weights bf16
# optional (f32 accumulation at the (kx,ky) level).

def _kernel_v3(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref, box, sem, *,
               orders, ranges, tile, box_shape, mul_dtype):
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = ranges
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ

    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(x0, BXa), pl.ds(y0, BYa), pl.ds(z0, BZa)],
        box, sem)
    cp.start()

    shape = (TX, TY, TZ)
    cxs = _coef_planes(gx_ref[...], orders[0], sx0, sx1, x0, 0, shape)
    cys = _coef_planes(gy_ref[...], orders[1], sy0, sy1, y0, 1, shape)
    czs = _coef_planes(gz_ref[...], orders[2], sz0, sz1, z0, 2, shape)
    czs = [c.astype(mul_dtype) for c in czs]

    cp.wait()
    bval = box[...].astype(mul_dtype)

    acc = jnp.zeros(shape, dtype=out_ref.dtype)
    for ky in range(Sy):
        ys = bval if ky == 0 else pltpu.roll(bval, BYa - ky, 1)
        ys = ys[:, 0:TY, :]
        zaccs = [None] * Sx
        for kz in range(Sz):
            slab = ys[:, :, kz:kz + TZ]
            for kx in range(Sx):
                t = czs[kz] * slab[kx:kx + TX]
                zaccs[kx] = t if zaccs[kx] is None else zaccs[kx] + t
        for kx in range(Sx):
            acc = acc + (cxs[kx] * cys[ky]) * zaccs[kx].astype(acc.dtype)
    out_ref[...] = acc


def pull_v3(inp, grid, orders, bounds, max_disp, tile, mul_dtype=None):
    ishape = tuple(inp.shape)
    D = 3
    wdtype = jnp.float32
    mul_dtype = mul_dtype or wdtype
    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    lo, hi = _window_geom(orders, max_disp, D)
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    hi = [h + (b - n) for h, b, n in zip(hi, box_shape, need)]

    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(wdtype)[None], ishape, bounds,
                       lo, hi, wdtype)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    kernel = partial(_kernel_v3, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape,
                     mul_dtype=mul_dtype)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    g = grid.astype(wdtype)
    out = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[gspec, gspec, gspec,
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ishape_a, wdtype),
        scratch_shapes=[
            pltpu.VMEM(box_shape, wdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(g[..., 0], g[..., 1], g[..., 2], vpad)
    return out[:ishape[0], :ishape[1], :ishape[2]]


# --------------------------------------------------------- microbench

def _kernel_fma(a_ref, b_ref, out_ref, *, reps):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros_like(a)
    for i in range(reps):
        acc = acc + a * b
        a = a + 1e-30
    out_ref[...] = acc


def _kernel_fma2(a_ref, b_ref, out_ref, *, reps, dtype):
    a = a_ref[...].astype(dtype)
    b = b_ref[...].astype(dtype)
    # 8 independent accumulator chains over a tiny live set (≈24 vregs):
    # measures FMA *throughput*, not latency or VMEM spill bandwidth.
    accs = [a * (i + 1.0) for i in range(8)]

    def body(_, accs):
        for i in range(8):
            accs[i] = accs[i] + a * b
        return accs

    accs = jax.lax.fori_loop(0, reps // 8, lambda i, c: body(i, list(c)),
                             accs)
    out_ref[...] = sum(accs).astype(out_ref.dtype)


def fma_probe2(reps=4096, dtype=jnp.float32, shape=(512, 8, 1024)):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        partial(_kernel_fma2, reps=reps, dtype=dtype),
        grid=(shape[0],),
        in_specs=[pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    ))
    dt = measure(f, (a, b), iters=4)
    n = np.prod(shape) * reps
    print(f"fma2 {jnp.dtype(dtype).name}: {n/dt/1e12:6.3f} T-FMA/s",
          flush=True)


def _kernel_fma3(a_ref, b_ref, out_ref, *, reps, nacc, dtype):
    a = a_ref[...].astype(dtype)
    b = b_ref[...].astype(dtype)
    accs = [a * float(i + 1) for i in range(nacc)]
    for r in range(reps // nacc):
        for i in range(nacc):
            accs[i] = accs[i] + a * b
    out_ref[...] = sum(accs).astype(out_ref.dtype)


def fma_probe3(reps=1024, nacc=8, dtype=jnp.float32, sub=8):
    """Fully static-unrolled FMA chain — the true VPU issue ceiling."""
    shape = (256, sub, 1024)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        partial(_kernel_fma3, reps=reps, nacc=nacc, dtype=dtype),
        grid=(shape[0],),
        in_specs=[pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    ))
    dt = measure(f, (a, b), iters=4)
    n = np.prod(shape) * reps
    print(f"fma3 {jnp.dtype(dtype).name} nacc={nacc}: "
          f"{n/dt/1e12:6.3f} T-FMA/s", flush=True)


def xla_fma_probe(reps=64):
    shape = (256, 256, 256)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    @jax.jit
    def f(a, b):
        acc = jnp.zeros_like(a)
        x = a
        for _ in range(reps):
            acc = acc + x * b
            x = x * 1.0000001
        return acc

    dt = measure(f, (a, b), iters=4)
    n = np.prod(shape) * reps * 2
    print(f"xla fma chain: {n/dt/1e12:6.3f} T-FMA/s f32", flush=True)


def mxu_probe(dtype=jnp.bfloat16, M=1024, K=1024, N=1024, reps=8):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)).astype(dtype)

    @jax.jit
    def f(a, b):
        x = a
        for _ in range(reps):
            x = jnp.dot(x, b, preferred_element_type=jnp.float32).astype(dtype)
        return x

    dt = measure(f, (a, b), iters=4)
    n = M * K * N * reps
    print(f"mxu {jnp.dtype(dtype).name}: {n/dt/1e12:6.2f} T-MAC/s "
          f"({2*n/dt/1e12:6.1f} TFLOP/s)", flush=True)


def fma_probe(reps=512):
    """Pure-FMA VPU rate: reps FMAs per element on a resident tile."""
    shape = (8, 256, 1024)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        partial(_kernel_fma, reps=reps),
        grid=(shape[0],),
        in_specs=[pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    ))
    dt = measure(f, (a, b), iters=8)
    n = np.prod(shape) * reps
    print(f"fma probe: {n/dt/1e12:6.2f} T-FMA/s f32 "
          f"(2 ops/FMA -> {2*n/dt/1e12:5.2f} TFLOP/s)", flush=True)


# ------------------------------------------------- gather probe

def _kernel_gather(gz_ref, v_ref, out_ref):
    """Can Mosaic lower a per-voxel lane gather, and how fast?
    out[x,y,z] = v[x, y, idx(x,y,z)] with idx in [0, BZ)."""
    idx = jnp.clip(gz_ref[...].astype(jnp.int32), 0, v_ref.shape[-1] - 1)
    out_ref[...] = jnp.take_along_axis(v_ref[...], idx, axis=-1)


def gather_probe(N=128):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((8, 8, 2 * N)).astype(np.float32))
    gz = jnp.asarray(rng.uniform(0, 2 * N, (8, 8, N)).astype(np.float32))
    f = pl.pallas_call(
        _kernel_gather,
        out_shape=jax.ShapeDtypeStruct((8, 8, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(gz, v)
    ref = np.take_along_axis(np.asarray(v),
                             np.clip(np.asarray(gz).astype(np.int32), 0,
                                     2 * N - 1), axis=-1)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"gather probe: compiled OK, err={err:.2e}", flush=True)


# ------------------------------------------------------------- harness

def measure(f, args, iters=4):
    def run(n):
        cur = args
        out = None
        for _ in range(n):
            out = f(*cur)
            cur = (cur[0] + jnp.ravel(out)[0] * 1e-30,) + cur[1:]
        sync(jnp.ravel(out)[:1])

    run(2)
    t0 = time.time()
    run(iters)
    return max((time.time() - t0) / iters, 1e-9)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variants = sys.argv[2:] or ["v0", "v1", "v1s", "gather"]
    order, max_disp = 3, 2.0
    print("health:", wait_healthy(), flush=True)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(
        ident + rng.uniform(-max_disp, max_disp, ident.shape
                            ).astype(np.float32))
    o, b = (order,) * 3, (3,) * 3

    ref = None
    for v in variants:
        try:
            if v == "gather":
                gather_probe(N)
                continue
            if v == "v0":
                f = jax.jit(partial(pull_window_pallas, orders=o, bounds=b,
                                    extrapolate=1, max_disp=max_disp))
            elif v == "fma":
                fma_probe()
                continue
            elif v == "fma2":
                fma_probe2()
                continue
            elif v == "fma2bf":
                fma_probe2(dtype=jnp.bfloat16)
                continue
            elif v == "xlafma":
                xla_fma_probe()
                continue
            elif v == "mxubf":
                mxu_probe()
                continue
            elif v == "mxuf32":
                mxu_probe(dtype=jnp.float32)
                continue
            elif v == "fma3":
                fma_probe3()
                continue
            elif v == "fma3bf":
                fma_probe3(dtype=jnp.bfloat16, sub=16)
                continue
            elif v == "fma3n16":
                fma_probe3(nacc=16)
                continue
            elif v.startswith("v3"):
                mul = jnp.bfloat16 if v.endswith("bf") else None
                f = jax.jit(partial(pull_v3, orders=o, bounds=b,
                                    max_disp=max_disp, tile=(8, 8, 128),
                                    mul_dtype=mul))
            elif v.startswith("v2"):
                tile = (8, 8, 128)
                if "T" in v:
                    tile = {"16": (16, 8, 128), "32": (32, 8, 128),
                            "y16": (8, 16, 128), "z256": (8, 8, 256)}[
                                v.split("T")[1]]
                f = jax.jit(partial(pull_v2, orders=o, bounds=b,
                                    max_disp=max_disp, tile=tile))
            elif v.startswith("v1"):
                static_ky = v.startswith("v1s")
                tile = (8, 8, 128)
                if "T" in v:   # e.g. v1-T16 -> tile (16,16,256)
                    tile = {"16": (16, 16, 256), "8": (8, 8, 128),
                            "32": (8, 16, 256)}[v.split("T")[1]]
                bf16 = v.endswith("bf")
                f = jax.jit(partial(
                    pull_v1, orders=o, bounds=b, max_disp=max_disp,
                    tile=tile, static_ky=static_ky,
                    box_dtype=jnp.bfloat16 if bf16 else None))
            else:
                print(f"unknown variant {v}")
                continue
            t0 = time.time()
            out = f(vol, grid)
            sync(out[:1, :1, :1])
            compile_t = time.time() - t0
            if ref is None:
                ref = np.asarray(out)
                err = 0.0
            else:
                err = float(np.abs(np.asarray(out) - ref).max())
            dt = measure(f, (vol, grid))
            print(f"{v:8s} N={N} {N**3/dt/1e9:7.3f} Gvox/s  "
                  f"({dt*1e3:7.2f} ms)  err={err:.2e}  "
                  f"compile={compile_t:.0f}s", flush=True)
        except Exception as e:
            msg = str(e)
            if len(msg) > 400:
                msg = msg[:200] + " ... " + msg[-200:]
            print(f"{v:8s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
