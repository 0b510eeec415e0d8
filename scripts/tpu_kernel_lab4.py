"""Kernel lab 4: adaptive per-tile window (prototype).

The production window kernel's cost is S^3 with S = order+1+~2*max_disp:
the *global* displacement bound prices every tile for the worst case.
Real registration warps are smooth — within an (8,8,128) tile the
displacement varies by << 1 voxel even when its magnitude is large.

Adaptive scheme: the XLA prologue computes a per-tile integer base
displacement b = round(mean(disp)) (3 int32s per tile, SMEM); the
kernel DMAs its box at a *dynamic* origin shifted by b (leading dim
exact; sublane/lane dims aligned down with the residue removed by a
dynamic roll), and runs the shift window over the residual
d - b in [-(s), s], so S_r = order+1+2*ceil(s+0.5) regardless of
max_disp.  Samples violating the residual contract lose taps
(graceful degradation, same failure mode as the max_disp contract).

Run: python scripts/tpu_kernel_lab4.py [N] [variants...]
variants: ref (v3 full window), ad (adaptive, spread=1)
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

from interpol_tpu.ops.splines import bspline_taps  # noqa: E402
from interpol_tpu.ops.window import (  # noqa: E402
    _pad_folded, window_range)
from interpol_tpu.ops import window as wd  # noqa: E402
from interpol_tpu.ops.pallas_warp import (  # noqa: E402
    _pad_grid_edge, _aligned, _coef_planes)


def _rup(n, a):
    return -(-n // a) * a


def _adaptive_kernel(bx_ref, by_ref, bz_ref, gx_ref, gy_ref, gz_ref,
                     vpad_hbm, out_ref, box, sem, *,
                     order, rngs, tile, box_shape, lo_full):
    TX, TY, TZ = tile
    (sx0, sx1), (sy0, sy1), (sz0, sz1) = rngs
    Sx, Sy, Sz = sx1 - sx0 + 1, sy1 - sy0 + 1, sz1 - sz0 + 1
    BXa, BYa, BZa = box_shape
    ix, iy, iz = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    x0, y0, z0 = ix * TX, iy * TY, iz * TZ
    bx = bx_ref[ix, iy, iz]
    by = by_ref[ix, iy, iz]
    bz = bz_ref[ix, iy, iz]

    # fetch origins in padded coords; y/z aligned down, residue rolled
    ox = x0 + lo_full[0] + bx + sx0
    oyr = y0 + lo_full[1] + by + sy0
    ozr = z0 + lo_full[2] + bz + sz0
    oy = (oyr // 8) * 8
    oz = (ozr // 128) * 128
    ry = oyr - oy
    rz = ozr - oz

    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(ox, BXa),
                    pl.ds(pl.multiple_of(oy, 8), BYa),
                    pl.ds(pl.multiple_of(oz, 128), BZa)],
        box, sem)
    cp.start()

    # residual coefficient planes: d0' = n0 - p - b
    shape = (TX, TY, TZ)
    def planes(g, origin, axis, b, smin, smax):
        n0f = jnp.floor(g - (order - 1) / 2)
        t = g - n0f
        w, _, _ = bspline_taps(t, order)
        p = origin + jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        d0 = n0f.astype(jnp.int32) - p - b
        d0min, d0max = smin, smax - order
        out = []
        for s in range(smin, smax + 1):
            acc = None
            for j in range(order + 1):
                if d0min <= s - j <= d0max:
                    tm = jnp.where(d0 == s - j, w[j], 0)
                    acc = tm if acc is None else acc + tm
            out.append(acc if acc is not None else jnp.zeros_like(g))
        return out

    cxs = planes(gx_ref[...], x0, 0, bx, sx0, sx1)
    cys = planes(gy_ref[...], y0, 1, by, sy0, sy1)
    czs = planes(gz_ref[...], z0, 2, bz, sz0, sz1)

    cp.wait()
    bval = box[...]
    # remove the alignment residues: roll rows/lanes so the window
    # origin sits at index 0 (dynamic rotate, f32)
    bval = pltpu.roll(bval, BYa - ry, 1)
    bval = pltpu.roll(bval, BZa - rz, 2)

    acc = jnp.zeros(shape, dtype=out_ref.dtype)
    for ky in range(Sy):
        ys = bval if ky == 0 else pltpu.roll(bval, BYa - ky, 1)
        ys = ys[:, 0:TY, :]
        zvals = [ys[:, :, kz:kz + TZ] for kz in range(Sz)]
        zc = [None] * Sx
        for kz in range(Sz):
            for kx in range(Sx):
                t = czs[kz] * zvals[kz][kx:kx + TX]
                zc[kx] = t if zc[kx] is None else zc[kx] + t
        for kx in range(Sx):
            acc = acc + (cxs[kx] * cys[ky]) * zc[kx]
    out_ref[...] = acc


def pull_adaptive(inp, grid, order, bounds, max_disp, spread,
                  tile=(8, 8, 128), adapt_axes=(True, True, False)):
    """Prototype: single channel (no C dim), extrapolate=1.

    ``spread`` is per-axis (sx, sy, sz): the residual displacement
    bound |d(p) - b_tile| per axis within a tile.  Axes with
    ``adapt_axes[d]`` False keep b=0 (their spread must then be the
    full max_disp) — the z tile extent is 128 lanes, over which smooth
    fields still vary too much for a single per-tile base, so z is
    re-centered only when the caller knows the field is z-smooth."""
    ishape = tuple(inp.shape)
    D = 3
    wdtype = jnp.float32
    if not isinstance(spread, (tuple, list)):
        spread = (spread,) * 3
    rngs = tuple(window_range(order, s) for s in spread)
    Ss = tuple(r[1] - r[0] + 1 for r in rngs)
    B = int(np.ceil(max_disp))
    lo = [B - r[0] for r in rngs]
    # fetch extents: y/z get alignment slop (up to 7 / 127 rows) on top
    need = (tile[0] + Ss[0] - 1,
            _rup(tile[1] + Ss[1] - 1 + 7, 8),
            _rup(tile[2] + Ss[2] - 1 + 127, 128))
    hi = [B + r[1] + (n - (t + s - 1))
          for n, t, s, r in zip(need, tile, Ss, rngs)]

    ishape_a = _aligned(ishape, tile)
    vpad = _pad_folded(inp.astype(wdtype)[None], ishape, bounds,
                       lo, hi, wdtype)[0]
    extra = [a - n for a, n in zip(ishape_a, ishape)]
    if any(extra):
        vpad = jnp.pad(vpad, [(0, e) for e in extra])
        grid = _pad_grid_edge(grid, ishape_a)
    ntiles = tuple(a // t for a, t in zip(ishape_a, tile))

    # per-tile integer base displacement (prologue, XLA)
    g = grid.astype(wdtype)
    bs = []
    for d in range(D):
        iota = jax.lax.broadcasted_iota(wdtype, g.shape[:-1], d)
        disp = g[..., d] - iota
        if adapt_axes[d]:
            m = disp.reshape(ntiles[0], tile[0], ntiles[1], tile[1],
                             ntiles[2], tile[2]).mean(axis=(1, 3, 5))
            bs.append(jnp.clip(jnp.round(m), -B, B).astype(jnp.int32))
        else:
            bs.append(jnp.zeros(ntiles, jnp.int32))

    kernel = partial(_adaptive_kernel, order=order, rngs=rngs,
                     tile=tuple(tile), box_shape=need,
                     lo_full=tuple(lo))
    gspec = pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=ntiles,
        in_specs=[sspec, sspec, sspec, gspec, gspec, gspec,
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(ishape_a, wdtype),
        scratch_shapes=[
            pltpu.VMEM(need, wdtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3),
    )(bs[0], bs[1], bs[2], g[..., 0], g[..., 1], g[..., 2], vpad)
    return out[:ishape[0], :ishape[1], :ishape[2]]


def smooth_grid(N, max_disp, seed=0, coarse=2):
    """Smooth dense warp: upsampled coarse displacement, |d| <= max_disp,
    per-tile spread << 1."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(-max_disp, max_disp, (coarse, coarse, coarse, 3))
    from scipy.ndimage import zoom
    f = N / coarse
    d = np.stack([zoom(c[..., i], f, order=3) for i in range(3)], -1)
    d = np.clip(d, -max_disp, max_disp)
    ident = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                     -1).astype(np.float32)
    return jnp.asarray((ident + d).astype(np.float32))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variants = sys.argv[2:] or ["ref", "ad"]
    order = 3
    o3, b3 = (order,) * 3, (3,) * 3
    print("health:", wait_healthy(), flush=True)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))

    for md in (2.0, 4.0):
        grid = smooth_grid(N, md)
        # exact reference on this grid (XLA full window)
        ref = jax.jit(lambda v, g: wd._pull_impl(
            v[None], g, o3, b3, 1, md)[0])(vol, grid)
        for v in variants:
            try:
                if v == "ref":
                    f = lambda c: (wd.pull_window(c[0], c[1], o3, b3, 1,
                                                  md), c[1])
                    out = jax.jit(lambda vv, g: wd.pull_window(
                        vv, g, o3, b3, 1, md))(vol[None], grid)[0]
                    err = float(jnp.abs(out - ref).max())
                    dt, _ = slope_time(f, (vol[None], grid))
                elif v == "ad":
                    spread = (1.0, 1.0, md)
                    fa = lambda c: (pull_adaptive(c[0], c[1], order, b3,
                                                  md, spread), c[1])
                    out = jax.jit(lambda vv, g: pull_adaptive(
                        vv, g, order, b3, md, spread))(vol, grid)
                    err = float(jnp.abs(out - ref).max())
                    dt, _ = slope_time(fa, (vol, grid))
                print(f"{v:4s} md={md} N={N}: {N**3/dt/1e9:7.3f} Gvox/s "
                      f"({dt*1e3:.2f} ms) err={err:.2e}", flush=True)
            except Exception as e:
                msg = str(e)
                if len(msg) > 300:
                    msg = msg[:150] + " ... " + msg[-150:]
                print(f"{v:4s} md={md} FAILED: {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
