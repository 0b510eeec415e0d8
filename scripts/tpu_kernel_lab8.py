"""Lab 8 (round 4): scattered-tier NON-kernel phase A/Bs.

ROUND_NOTES r3 closed the kernel question (gather cascade at its
ceiling) but left the two XLA phases at measured, not proven, cost:

  A. table build 12.2 ms — "transpose-bound" per lab-6, but lab-6 only
     A/B'd *whole-build* formulations (strided+transpose 14.9 /
     boxes-first 15.1 / conv_patches 102 / gather 800).  Here we split
     the build per axis: the z-axis interleave (NBz, Ez) is the only
     step with 76-byte inner chunks — replace it with ONE one-hot
     matmul on the MXU (exact under HIGHEST: one-hot rows make every
     product 1.0*x, and bf16x3 represents f32 exactly), or an
     identity-kernel strided conv, and re-order the final transpose so
     its minor block is a batched 2-D (Ex*Ey, NBz*Ez) transpose
     (target TAB order (ez, ex, ey) — the kernel's flat-index formula
     is ours to permute).

  B. return epilogue ~8 ms — the r3d single-payload unsort
     (lax.sort (idx_s, slot_code)) vs a 1-D scatter
     `zeros.at[idx_s].set(slot_code, unique_indices=True)`: idx_s is a
     permutation of arange(P), which the sort cannot exploit but a
     unique-indices scatter can.  r3 rejected "P-scatter" for the
     *value planes*; the slot-code-only scatter was never measured.

Run detached (nohup python scripts/tpu_kernel_lab8.py > /tmp/lab8.log
2>&1 &) and poll; never CTRL-C a running client (queue poisoning).
"""
import sys
import os
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scripts_common import wait_healthy, slope_time, sync  # noqa: E402
from interpol_tpu.ops import scattered as sc  # noqa: E402
from interpol_tpu.ops.window import _pad_folded  # noqa: E402

HIGH = jax.lax.Precision.HIGHEST


def geom(N, box=(8, 8, 16), orders=(3, 3, 3)):
    ishape = (N, N, N)
    blo, ext, tab = sc.box_geometry(orders, box, ishape)
    nb = tuple(-(-n // b) for n, b in zip(ishape, box))
    lo = list(blo)
    hi = [nbd * bd - n + e - bd - bl
          for nbd, bd, n, e, bl in zip(nb, box, ishape, ext, blo)]
    return ishape, blo, ext, tab, nb, lo, hi


def pad(inp, N, bounds=(3, 3, 3)):
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    return _pad_folded(inp.astype(jnp.float32), ishape, bounds, lo, hi,
                       jnp.float32)


def zmat(N):
    """One-hot (PZ, NBz*Ez) windowing operator for the z axis."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    PZ = nb[2] * 16 + ext[2] - 16
    S = np.zeros((PZ, nb[2] * ext[2]), np.float32)
    for cz in range(nb[2]):
        for ez in range(ext[2]):
            S[cz * 16 + ez, cz * ext[2] + ez] = 1.0
    return jnp.asarray(S)


def stacks_xy(A1, N):
    """(C, PX, PY, NBz, Ez) -> (C, NBx, Ex, NBy, Ey, NBz, Ez) via
    strided-slice stacks (inner chunks NBz*Ez*4 = 1.2 KB and larger)."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    segs = [A1[:, :, j:j + nb[1] * 8:8] for j in range(ext[1])]
    A2 = jnp.stack(segs, axis=3)          # (C, PX, NBy, Ey, NBz, Ez)
    segs = [A2[:, j:j + nb[0] * 8:8] for j in range(ext[0])]
    return jnp.stack(segs, axis=2)        # (C, NBx, Ex, NBy, Ey, ...)


def build_t1(inp, N):
    """Current build (strided stacks x3 + one 7-D transpose)."""
    ishape, *_ = geom(N)
    v, *_ = sc._build_tables(inp, ishape, (3, 3, 3), (3, 3, 3),
                             (8, 8, 16), jnp.float32)
    return v


def build_t5(inp, N, S):
    """z via one-hot MXU matmul; same final TAB order (ex, ey, ez)."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    v = pad(inp, N)
    C, PX, PY, PZ = v.shape
    A1 = jnp.dot(v.reshape(C * PX * PY, PZ), S, precision=HIGH)
    A1 = A1.reshape(C, PX, PY, nb[2], ext[2])
    A3 = stacks_xy(A1, N)
    A3 = A3.transpose(0, 1, 3, 5, 2, 4, 6)
    NB = math.prod(nb)
    A3 = A3.reshape(C, NB, math.prod(ext))
    NB8 = -(-NB // 8) * 8
    return jnp.pad(A3, ((0, 0), (0, NB8 - NB), (0, tab - math.prod(ext))))


def build_t2(inp, N, S):
    """z-matmul + single transpose to TAB order (ez, ex, ey)."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    v = pad(inp, N)
    C, PX, PY, PZ = v.shape
    A1 = jnp.dot(v.reshape(C * PX * PY, PZ), S, precision=HIGH)
    A1 = A1.reshape(C, PX, PY, nb[2], ext[2])
    A3 = stacks_xy(A1, N)
    A3 = A3.transpose(0, 1, 3, 5, 6, 2, 4)   # (C,cx,cy,cz,Ez,Ex,Ey)
    NB = math.prod(nb)
    A3 = A3.reshape(C, NB, math.prod(ext))
    NB8 = -(-NB // 8) * 8
    return jnp.pad(A3, ((0, 0), (0, NB8 - NB), (0, tab - math.prod(ext))))


def build_t3(inp, N, S):
    """z-matmul + cheap swap + batched 2-D (Ex*Ey, NBz*Ez) transpose;
    TAB order (ez, ex, ey) like t2."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    v = pad(inp, N)
    C, PX, PY, PZ = v.shape
    A1 = jnp.dot(v.reshape(C * PX * PY, PZ), S, precision=HIGH)
    A1 = A1.reshape(C, PX, PY, nb[2], ext[2])
    A3 = stacks_xy(A1, N)
    B = A3.transpose(0, 1, 3, 2, 4, 5, 6)    # EX <-> cy (13 KB chunks)
    B = B.reshape(C, nb[0], nb[1], ext[0] * ext[1], nb[2] * ext[2])
    B = B.swapaxes(-1, -2)                   # batched 2-D transpose
    NB = math.prod(nb)
    B = B.reshape(C, NB, math.prod(ext))
    NB8 = -(-NB // 8) * 8
    return jnp.pad(B, ((0, 0), (0, NB8 - NB), (0, tab - math.prod(ext))))


def build_t6(inp, N):
    """z via identity-kernel strided conv (MXU, K=Ez not PZ); TAB order
    (ez, ex, ey) via the t3 finish."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    v = pad(inp, N)
    C, PX, PY, PZ = v.shape
    Ez = ext[2]
    lhs = v.reshape(C * PX * PY, 1, PZ)
    ker = jnp.eye(Ez, dtype=jnp.float32).reshape(Ez, 1, Ez)
    A1 = jax.lax.conv_general_dilated(
        lhs, ker, window_strides=(16,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NHC"),
        precision=HIGH)                      # (C*PX*PY, NBz, Ez)
    A1 = A1.reshape(C, PX, PY, nb[2], Ez)
    A3 = stacks_xy(A1, N)
    B = A3.transpose(0, 1, 3, 2, 4, 5, 6)
    B = B.reshape(C, nb[0], nb[1], ext[0] * ext[1], nb[2] * Ez)
    B = B.swapaxes(-1, -2)
    NB = math.prod(nb)
    B = B.reshape(C, NB, math.prod(ext))
    NB8 = -(-NB // 8) * 8
    return jnp.pad(B, ((0, 0), (0, NB8 - NB), (0, tab - math.prod(ext))))


def check_parity(N=64):
    """Exact-value check of every variant against t1 (small volume)."""
    ishape, blo, ext, tab, nb, lo, hi = geom(N)
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.standard_normal((1,) + ishape).astype(np.float32))
    S = zmat(N)
    t1 = np.asarray(jax.jit(partial(build_t1, N=N))(inp))
    NB = math.prod(nb)
    raw = math.prod(ext)

    def as_xyz(t, order):
        body = t[:, :NB, :raw].reshape((1, NB) + order)
        if order == (ext[2], ext[0], ext[1]):      # (ez, ex, ey)
            body = body.transpose(0, 1, 3, 4, 2)
        return body.reshape(1, NB, raw)

    t1b = as_xyz(t1, tuple(ext))
    for name, fn, order in [
            ("t5", partial(build_t5, N=N, S=S), tuple(ext)),
            ("t2", partial(build_t2, N=N, S=S),
             (ext[2], ext[0], ext[1])),
            ("t3", partial(build_t3, N=N, S=S),
             (ext[2], ext[0], ext[1])),
            ("t6", partial(build_t6, N=N),
             (ext[2], ext[0], ext[1]))]:
        tv = np.asarray(jax.jit(fn)(inp))
        d = np.abs(as_xyz(tv, order) - t1b).max()
        print(f"parity {name}: maxabs {d:.3e}", flush=True)
        assert d == 0.0, name


def time_builds(N=256):
    rng = np.random.default_rng(1)
    inp = jnp.asarray(rng.standard_normal((1, N, N, N)).astype(np.float32))
    S = zmat(N)
    for name, body in [
            ("t1", lambda c: (c[0] + 1e-6 * build_t1(c[0], N)[0, 0, :1].sum(),)),
            ("t5", lambda c: (c[0] + 1e-6 * build_t5(c[0], N, S)[0, 0, :1].sum(),)),
            ("t2", lambda c: (c[0] + 1e-6 * build_t2(c[0], N, S)[0, 0, :1].sum(),)),
            ("t3", lambda c: (c[0] + 1e-6 * build_t3(c[0], N, S)[0, 0, :1].sum(),)),
            ("t6", lambda c: (c[0] + 1e-6 * build_t6(c[0], N)[0, 0, :1].sum(),))]:
        h = wait_healthy()
        dt, ts = slope_time(body, (inp,))
        print(f"build {name}: {dt*1e3:.2f} ms (health {h}s)", flush=True)


def time_epilogue(P=1_000_000, NB8=16384, CAP=128, rows=2):
    """Unsort A/B: r3d sort vs unique-indices scatter; plus the shared
    plane gather both share (so the full-epilogue numbers are visible)."""
    rng = np.random.default_rng(2)
    SLOTS = NB8 * CAP
    idx = jnp.asarray(rng.permutation(P).astype(np.int32))
    code = jnp.asarray(rng.integers(0, 2 * SLOTS, P).astype(np.int32))
    flat = jnp.asarray(rng.standard_normal((rows, 2 * SLOTS + 1))
                       .astype(np.float32))

    def e0(c):
        su = jax.lax.sort((c[0], c[1]), num_keys=1)[1]
        return (c[0] + su[:1] % 2, c[1])

    def e1(c):
        su = jnp.zeros((P,), jnp.int32).at[c[0]].set(
            c[1], unique_indices=True, mode="drop")
        return (c[0] + su[:1] % 2, c[1])

    def g2(c):
        out = flat[:, c[0]]
        return (c[0] + (out[0, :1] > 0), c[1])

    for name, body, perturb in [("sort-unsort", e0, 1),
                                ("scatter-unsort", e1, 1),
                                (f"gather-{rows}planes", g2, 1)]:
        h = wait_healthy()
        dt, ts = slope_time(body, (idx, code), perturb=perturb)
        print(f"epi {name}: {dt*1e3:.2f} ms (health {h}s)", flush=True)


def time_epilogue_v2(P=1_000_000, NB8=16384, CAP=128):
    """E2 probes: (a) gather with MONOTONE indices (slot codes become
    globally nondecreasing once round-1/round-2 rows interleave per
    box) +- indices_are_sorted, at 2 and 4 row-slices; (b) unsort-sort
    at payload widths 2..6 (E2 carries the gathered planes through the
    sort instead of gathering in user order)."""
    rng = np.random.default_rng(3)
    SLOTS = NB8 * CAP
    idx = jnp.asarray(rng.permutation(P).astype(np.int32))
    code_m = jnp.asarray(np.sort(
        rng.integers(0, 2 * SLOTS, P)).astype(np.int32))
    for rows in (2, 4):
        flat = jnp.asarray(rng.standard_normal((rows, 2 * SLOTS + 1))
                           .astype(np.float32))

        def gm(c):
            out = flat[:, c[0]]
            return (c[0] + (out[0, :1] > 0), c[1])

        def gs(c):
            out = flat.at[:, c[0]].get(indices_are_sorted=True)
            return (c[0] + (out[0, :1] > 0), c[1])

        for name, body in [(f"gather-{rows}r-monotone", gm),
                           (f"gather-{rows}r-sortedflag", gs)]:
            h = wait_healthy()
            dt, ts = slope_time(body, (code_m, idx), perturb=1)
            print(f"epi2 {name}: {dt*1e3:.2f} ms (health {h}s)",
                  flush=True)
    vals = [jnp.asarray(rng.standard_normal(P).astype(np.float32))
            for _ in range(5)]
    for w in (2, 3, 4, 6):
        ops = (idx,) + tuple(vals[:w - 1])

        def sw(c):
            out = jax.lax.sort(c, num_keys=1)
            return (c[0] + (out[1][:1] > 0), *c[1:])

        h = wait_healthy()
        dt, ts = slope_time(sw, ops, perturb=1)
        print(f"epi2 sort-{w}wide: {dt*1e3:.2f} ms (health {h}s)",
              flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("all", "parity"):
        check_parity()
    if what in ("all", "builds"):
        time_builds()
    if what in ("all", "epi"):
        time_epilogue()
    if what in ("all", "epi2"):
        time_epilogue_v2()
    print("LAB8-DONE", flush=True)
