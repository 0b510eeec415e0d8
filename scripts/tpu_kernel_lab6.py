"""Kernel lab 6: box-table build strategies (scattered tier).

The (NB, TAB) overlapping-box table build measured 12.1 ms at 256^3 /
box (8,8,16) — ~48% of the whole scattered pull.  Roofline is ~0.6 ms
(≈0.5 GB of traffic at 819 GB/s); the suspect is the 7-D transpose
with a 19-lane trailing dim.  A/B alternatives:

  A. round-3 production: per-axis strided-slice stacks + one transpose
  B. conv_general_dilated_patches (XLA patch extraction)
  C. gather-free two-stage: transpose before the z-stacking so the
     trailing dim stays the full padded z
  D. advanced-indexing gather (one big gather)

Run: nohup python scripts/tpu_kernel_lab6.py > log &
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import wait_healthy, slope_time  # noqa: E402
from interpol_tpu.ops import scattered as sc  # noqa: E402

N = 256
BOX = (8, 8, 16)
ORD = (3, 3, 3)
BND = (3, 3, 3)


def timeit(name, fn, vol):
    out = fn(vol)
    dt, _ = slope_time(
        lambda c: (c[0] + 1e-9 * fn(c[0])[0, 0, :1, None, None], c[1]),
        (vol, vol))
    print(f"  {name}: {dt*1e3:7.2f} ms   out={tuple(out.shape)}",
          flush=True)
    return dt


def build_A(vol):
    t, *_ = sc._build_tables(vol, (N,) * 3, ORD, BND, BOX, jnp.float32)
    return t


def build_B(vol):
    blo, ext, tab = sc.box_geometry(ORD, BOX)
    nb = tuple(-(-N // b) for b in BOX)
    lo = list(blo)
    hi = [nbd * bd - N + e - bd - bl
          for nbd, bd, e, bl in zip(nb, BOX, ext, blo)]
    from interpol_tpu.ops.window import _pad_folded
    v = _pad_folded(vol, (N,) * 3, BND, lo, hi, jnp.float32)
    p = jax.lax.conv_general_dilated_patches(
        v[:, None], filter_shape=ext, window_strides=BOX,
        padding="VALID", dimension_numbers=("NCXYZ", "OIXYZ", "NCXYZ"))
    # p: (C, prod(ext), NBx, NBy, NBz) -> (C, NB, TABraw)
    C = vol.shape[0]
    p = p.reshape(C, int(np.prod(ext)), -1).transpose(0, 2, 1)
    NB8 = -(-p.shape[1] // 8) * 8
    return jnp.pad(p, ((0, 0), (0, NB8 - p.shape[1]),
                       (0, tab - p.shape[2])))


def build_C(vol):
    blo, ext, tab = sc.box_geometry(ORD, BOX)
    nb = tuple(-(-N // b) for b in BOX)
    lo = list(blo)
    hi = [nbd * bd - N + e - bd - bl
          for nbd, bd, e, bl in zip(nb, BOX, ext, blo)]
    from interpol_tpu.ops.window import _pad_folded
    v = _pad_folded(vol, (N,) * 3, BND, lo, hi, jnp.float32)
    C = vol.shape[0]
    # stack x and y offsets, transpose boxes-first while z is STILL the
    # full padded axis (lane-friendly), then stack z offsets last
    segs = []
    for jx in range(ext[0]):
        segs.append(v[:, jx:jx + nb[0] * BOX[0]:BOX[0]])
    v = jnp.stack(segs, axis=2)          # (C, NBx, Ex, Ypad, Zpad)
    segs = []
    for jy in range(ext[1]):
        segs.append(v[..., jy:jy + nb[1] * BOX[1]:BOX[1], :])
    v = jnp.stack(segs, axis=4)          # (C, NBx, Ex, NBy, Ey, Zpad)
    v = v.transpose(0, 1, 3, 2, 4, 5)    # (C, NBx, NBy, Ex, Ey, Zpad)
    segs = []
    for jz in range(ext[2]):
        segs.append(v[..., jz:jz + nb[2] * BOX[2]:BOX[2]])
    v = jnp.stack(segs, axis=-1)         # (C,NBx,NBy,Ex,Ey,NBz,Ez)
    v = v.transpose(0, 1, 2, 5, 3, 4, 6)
    v = v.reshape(C, int(np.prod(nb)), int(np.prod(ext)))
    NB8 = -(-v.shape[1] // 8) * 8
    return jnp.pad(v, ((0, 0), (0, NB8 - v.shape[1]),
                       (0, tab - v.shape[2])))


def build_D(vol):
    blo, ext, tab = sc.box_geometry(ORD, BOX)
    nb = tuple(-(-N // b) for b in BOX)
    lo = list(blo)
    hi = [nbd * bd - N + e - bd - bl
          for nbd, bd, e, bl in zip(nb, BOX, ext, blo)]
    from interpol_tpu.ops.window import _pad_folded
    v = _pad_folded(vol, (N,) * 3, BND, lo, hi, jnp.float32)
    xi = (jnp.arange(nb[0]) * BOX[0])[:, None, None, None, None, None] \
        + jnp.arange(ext[0])[None, None, None, :, None, None]
    yi = (jnp.arange(nb[1]) * BOX[1])[None, :, None, None, None, None] \
        + jnp.arange(ext[1])[None, None, None, None, :, None]
    zi = (jnp.arange(nb[2]) * BOX[2])[None, None, :, None, None, None] \
        + jnp.arange(ext[2])[None, None, None, None, None, :]
    out = v[:, xi, yi, zi]
    C = vol.shape[0]
    out = out.reshape(C, int(np.prod(nb)), int(np.prod(ext)))
    NB8 = -(-out.shape[1] // 8) * 8
    return jnp.pad(out, ((0, 0), (0, NB8 - out.shape[1]),
                         (0, tab - out.shape[2])))


def main():
    print("health:", wait_healthy(), flush=True)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, N, N, N)).astype(np.float32))
    ref = np.asarray(build_A(vol))
    for name, fn in [("A strided+transpose", build_A),
                     ("C boxes-first", build_C),
                     ("B conv_patches", build_B),
                     ("D adv-index gather", build_D)]:
        try:
            out = np.asarray(fn(vol))
            err = float(np.abs(out - ref).max())
            print(f"  {name} parity: {err:.1e}", flush=True)
            timeit(name, fn, vol)
        except Exception as e:
            print(f"  {name} FAILED: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
