"""Kernel lab 2: decompose the round-1 pull time into prologue (XLA pad)
vs kernel, and probe bf16 VPU rate + true MXU rate.

Variants:
  pro      XLA prologue only (pad_folded + grid cast) at N
  profast  slice/flip/concat pad (no take-gather) at N
  konly    pallas kernel only, prologue precomputed outside the timer
  v3       full v3 path (prologue + kernel) — reference point
  v4       v3 with bf16 multiplies (roll in f32, cast after), f32 acc
  fma2bf   bf16 FMA throughput probe
  mxu512   MXU probe with enough reps to swamp the dispatch overhead

Run: python scripts/tpu_kernel_lab2.py [N] [variants...]
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
from tpu_kernel_lab import pull_v3, measure  # noqa: E402


# ------------------------------------------------------------ prologue

def prologue(inp, grid, orders, bounds, max_disp, tile):
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
    return vpad, grid.astype(wdtype)


def _pad_folded_fast(x, ishape, bounds, lo, hi):
    """Boundary pad via slice+flip+concat (no take-gather).

    Handles pad widths < n for the reflect-family bounds; dft wraps.
    Only dct2 (+replicate) / dct1 / dft are common in benchmarks; signs
    (dst/zero) fall back to the take-based version.
    """
    from interpol_tpu.options import BoundType
    D = len(ishape)
    for d in range(D):
        ax = x.ndim - D + d
        n = ishape[d]
        b = bounds[d]
        l, h = lo[d], hi[d]
        parts = []
        if b == BoundType.dct2:
            if l:
                parts.append(jnp.flip(
                    jax.lax.slice_in_dim(x, 0, l, axis=ax), ax))
            parts.append(x)
            if h:
                parts.append(jnp.flip(
                    jax.lax.slice_in_dim(x, n - h, n, axis=ax), ax))
        elif b == BoundType.dct1:
            if l:
                parts.append(jnp.flip(
                    jax.lax.slice_in_dim(x, 1, 1 + l, axis=ax), ax))
            parts.append(x)
            if h:
                parts.append(jnp.flip(
                    jax.lax.slice_in_dim(x, n - 1 - h, n - 1, axis=ax), ax))
        elif b == BoundType.dft:
            if l:
                parts.append(jax.lax.slice_in_dim(x, n - l, n, axis=ax))
            parts.append(x)
            if h:
                parts.append(jax.lax.slice_in_dim(x, 0, h, axis=ax))
        else:
            raise NotImplementedError
        x = jnp.concatenate(parts, axis=ax) if len(parts) > 1 else x
    return x


def prologue_fast(inp, grid, orders, bounds, max_disp, tile):
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
    vpad = _pad_folded_fast(inp.astype(wdtype)[None], ishape, bounds,
                            lo, hi)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    return vpad, grid.astype(wdtype)


# ------------------------------------------------------- kernel-only v3

def _kernel_v4(gx_ref, gy_ref, gz_ref, vpad_hbm, out_ref, box, sem, *,
               orders, ranges, tile, box_shape):
    """v3 with bf16 multiplies: roll in f32, cast the cropped slab and
    the z coefficient planes to bf16; accumulate zaccs in f32 (widening
    FMA) to bound error."""
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
    czs = [c.astype(jnp.bfloat16) for c in czs]

    cp.wait()
    bval = box[...]

    acc = jnp.zeros(shape, dtype=out_ref.dtype)
    for ky in range(Sy):
        ys = bval if ky == 0 else pltpu.roll(bval, BYa - ky, 1)
        ys = ys[:, 0:TY, :].astype(jnp.bfloat16)
        zaccs = [None] * Sx
        for kz in range(Sz):
            slab = ys[:, :, kz:kz + TZ]
            for kx in range(Sx):
                t = (czs[kz] * slab[kx:kx + TX]).astype(jnp.float32)
                zaccs[kx] = t if zaccs[kx] is None else zaccs[kx] + t
        for kx in range(Sx):
            acc = acc + (cxs[kx] * cys[ky]) * zaccs[kx]
    out_ref[...] = acc


def make_kernel_call(kernel_fn, ishape, orders, max_disp, tile,
                     box_dtype=jnp.float32):
    D = 3
    wdtype = jnp.float32
    ranges = tuple(window_range(orders[d], max_disp) for d in range(D))
    S = tuple(r[1] - r[0] + 1 for r in ranges)
    need = [t + s - 1 for t, s in zip(tile, S)]
    align = (1, 8, 128)
    box_shape = tuple(-(-n // a) * a for n, a in zip(need, align))
    ishape_a = _aligned(ishape, tile)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))
    kernel = partial(kernel_fn, orders=tuple(orders), ranges=ranges,
                     tile=tuple(tile), box_shape=box_shape)
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)

    def call(gx, gy, gz, vpad):
        return pl.pallas_call(
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3),
        )(gx, gy, gz, vpad)

    return call


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variants = sys.argv[2:] or ["pro", "profast", "konly", "v4"]
    order, max_disp = 3, 2.0
    tile = (8, 8, 128)
    o, b = (order,) * 3, (3,) * 3
    print("health:", wait_healthy(), flush=True)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    grid = jnp.asarray(
        ident + rng.uniform(-max_disp, max_disp, ident.shape
                            ).astype(np.float32))

    from tpu_kernel_lab import _kernel_v3

    for v in variants:
        try:
            if v == "pro":
                f = jax.jit(partial(prologue, orders=o, bounds=b,
                                    max_disp=max_disp, tile=tile))
                dt = measure(f, (vol, grid))
                print(f"pro      N={N} {dt*1e3:7.2f} ms (take-pad prologue)",
                      flush=True)
                continue
            if v == "profast":
                f = jax.jit(partial(prologue_fast, orders=o, bounds=b,
                                    max_disp=max_disp, tile=tile))
                f2 = jax.jit(partial(prologue, orders=o, bounds=b,
                                     max_disp=max_disp, tile=tile))
                ref = f2(vol, grid)
                out = f(vol, grid)
                err = max(float(jnp.abs(a - c).max())
                          for a, c in zip(ref, out))
                dt = measure(f, (vol, grid))
                print(f"profast  N={N} {dt*1e3:7.2f} ms  err={err:.2e}",
                      flush=True)
                continue
            if v in ("konly", "v4"):
                kf = _kernel_v3 if v == "konly" else _kernel_v4
                if v == "konly":
                    kern = make_kernel_call(
                        partial(kf, mul_dtype=jnp.float32),
                        (N, N, N), o, max_disp, tile)
                else:
                    kern = make_kernel_call(kf, (N, N, N), o, max_disp, tile)
                pre = jax.jit(partial(prologue, orders=o, bounds=b,
                                      max_disp=max_disp, tile=tile))
                vpad, g = pre(vol, grid)
                vpad, g = jax.block_until_ready(vpad), jax.block_until_ready(g)
                gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
                f = jax.jit(kern)
                ref3 = jax.jit(partial(pull_v3, orders=o, bounds=b,
                                       max_disp=max_disp, tile=tile))(
                                           vol, grid)
                out = f(gx, gy, gz, vpad)[:N, :N, :N]
                err = float(jnp.abs(out - ref3).max())
                dt = measure(f, (gx, gy, gz, vpad))
                print(f"{v:8s} N={N} {N**3/dt/1e9:7.3f} Gvox/s "
                      f"({dt*1e3:7.2f} ms) err={err:.2e}", flush=True)
                continue
            if v == "v3":
                f = jax.jit(partial(pull_v3, orders=o, bounds=b,
                                    max_disp=max_disp, tile=tile))
                dt = measure(f, (vol, grid))
                print(f"v3       N={N} {N**3/dt/1e9:7.3f} Gvox/s "
                      f"({dt*1e3:7.2f} ms)", flush=True)
                continue
            if v.startswith("v3md"):
                md = float(v[4:])
                f = jax.jit(partial(pull_v3, orders=o, bounds=b,
                                    max_disp=md, tile=tile))
                gr = jnp.asarray(
                    ident + rng.uniform(-md, md, ident.shape
                                        ).astype(np.float32))
                dt = measure(f, (vol, gr))
                print(f"{v:8s} N={N} {N**3/dt/1e9:7.3f} Gvox/s "
                      f"({dt*1e3:7.2f} ms)", flush=True)
                continue
            if v == "fma2bf":
                from tpu_kernel_lab import fma_probe2
                fma_probe2(dtype=jnp.bfloat16)
                continue
            if v == "mxu512":
                from tpu_kernel_lab import mxu_probe
                mxu_probe(reps=512)
                continue
            print(f"unknown variant {v}", flush=True)
        except Exception as e:
            msg = str(e)
            if len(msg) > 400:
                msg = msg[:200] + " ... " + msg[-200:]
            print(f"{v:8s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
