"""Kernel lab 3: register-pressure-aware pull kernels.

v3 (lab 1 winner) holds the full box + Sx 3-D accumulators + all
coefficient planes live as *values* — an estimated ~350-vreg live set
against a much smaller architectural register file, so most "FMAs" are
really VMEM spill round-trips.  v5 restructures to a plane-streaming
loop whose live set is ~40 vregs:

  - output tile (TX, 8, 128): each output x-row slab is EXACTLY one
    f32 vreg (8 sublanes x 128 lanes); accs = TX vregs.
  - coefficient plane stacks live in VMEM scratch, read per use.
  - loop u over box x-planes; per (u, ky): build the Sz lane-rotated
    segs once (shared over the valid kx's); inner loop over valid
    (kx -> x = u - kx): zacc = sum_kz czs[kz][x]*seg[kz]; accs[x] +=
    cxy[kx, ky][x]*zacc.

FMA count: exactly S^3 per voxel + S^2 combine; rotate count Bx*Sy*Sz.

Run: python scripts/tpu_kernel_lab3.py [N] [variants...]
variants: v5, v5T16 (TX=16), v5T4, v3 (reference)
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
from scripts_common import sync, wait_healthy  # noqa: E402

from interpol_tpu.ops.window import (  # noqa: E402
    _pad_folded, _window_geom, window_range)
from interpol_tpu.ops.pallas_warp import (  # noqa: E402
    _coef_planes, _pad_grid_edge, _aligned)
from tpu_kernel_lab import pull_v3  # noqa: E402


def _kernel_v5(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref,
               box, cx_ref, cy_ref, cz_ref, sem, *,
               orders, ranges, tile, box_shape):
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

    # coefficient plane stacks -> VMEM scratch, one (TX, TY, TZ) plane
    # per shift (overlaps the DMA).  cxy is folded into cx*cy at use.
    shape = (TX, TY, TZ)
    for k, c in enumerate(_coef_planes(gx_ref[...], orders[0], sx0, sx1,
                                       x0, 0, shape)):
        cx_ref[k] = c
    for k, c in enumerate(_coef_planes(gy_ref[...], orders[1], sy0, sy1,
                                       y0, 1, shape)):
        cy_ref[k] = c
    for k, c in enumerate(_coef_planes(gz_ref[...], orders[2], sz0, sz1,
                                       z0, 2, shape)):
        cz_ref[k] = c

    cp.wait()

    accs = [jnp.zeros((TY, TZ), dtype=out_ref.dtype)
            for _ in range(TX)]
    for u in range(TX + Sx - 1):
        kx_lo = max(0, u - TX + 1)
        kx_hi = min(Sx - 1, u)
        plane = box[u]                       # (BYa, BZa) value
        for ky in range(Sy):
            # sublane-misaligned row: static roll + aligned crop
            row = plane if ky == 0 else pltpu.roll(plane, BYa - ky, 0)
            row = row[0:TY, :]
            segs = [row[:, kz:kz + TZ] for kz in range(Sz)]
            for kx in range(kx_lo, kx_hi + 1):
                x = u - kx
                zacc = None
                for kz in range(Sz):
                    t = cz_ref[kz, x] * segs[kz]
                    zacc = t if zacc is None else zacc + t
                accs[x] = accs[x] + (cx_ref[kx, x] * cy_ref[ky, x]) * zacc
    for x in range(TX):
        out_ref[x] = accs[x]


def pull_v5(inp, grid, orders, bounds, max_disp, tile):
    ishape = tuple(inp.shape)
    D = 3
    wdtype = jnp.float32
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

    kernel = partial(_kernel_v5, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape)
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
            pltpu.VMEM((S[0],) + tuple(tile), wdtype),
            pltpu.VMEM((S[1],) + tuple(tile), wdtype),
            pltpu.VMEM((S[2],) + tuple(tile), wdtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3),
    )(g[..., 0], g[..., 1], g[..., 2], vpad)
    return out[:ishape[0], :ishape[1], :ishape[2]]


def measure(f, args, iters=10):
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
    variants = sys.argv[2:] or ["v3", "v5", "v5T16"]
    order, max_disp = 3, 2.0
    o, b = (order,) * 3, (3,) * 3
    print("health:", wait_healthy(), flush=True)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(
        ident + rng.uniform(-max_disp, max_disp, ident.shape
                            ).astype(np.float32))

    ref = None
    for v in variants:
        try:
            if v == "v3":
                f = jax.jit(partial(pull_v3, orders=o, bounds=b,
                                    max_disp=max_disp, tile=(8, 8, 128)))
            elif v.startswith("v5"):
                tx = {"": 8, "T16": 16, "T4": 4, "T24": 24, "T32": 32}[
                    v[2:]]
                f = jax.jit(partial(pull_v5, orders=o, bounds=b,
                                    max_disp=max_disp, tile=(tx, 8, 128)))
            else:
                print(f"unknown {v}")
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
