"""Scattered-grid sampling: probe a volume at an arbitrary point cloud
(landmark tracking, surface sampling, sparse loss evaluation).

The reference accelerates arbitrary grids only through its optional
external jitfields backend (reference interpol/jitfields.py:47-114); in
this framework the scattered native tier (``ops/scattered.py``) is
first-class: on TPU, point clouds of >= 32768 samples route through a
box-sorted Pallas kernel automatically (17x the XLA gather core,
exact to the last bit — out-of-volume and overflowing points take the
exact fallback), and repeated sampling of one volume can amortize the
box-table build with :func:`precompute_tables`.

Run:  python examples/scattered.py        (any backend; CPU uses the
                                           portable XLA core)
"""
import numpy as np
import jax
import jax.numpy as jnp

import interpol_tpu as itp


def main():
    rng = np.random.default_rng(0)
    shape = (48, 48, 64)
    vol = rng.standard_normal((1, 1) + shape).astype(np.float32)

    # a point cloud in voxel coordinates: grid_pull accepts ANY grid
    # shape (..., *points_shape, 3) — a (P, 3) list is just a "1-D
    # image of samples".  On TPU, large clouds dispatch to the
    # scattered Pallas tier automatically.
    pts = (rng.random((20000, 3)) *
           (np.asarray(shape) - 1)).astype(np.float32)
    vals = itp.grid_pull(vol, pts[None], interpolation=3, bound="dct2",
                         extrapolate=True, prefilter=True)
    print("sampled:", vals.shape, "mean", float(vals.mean()))

    # gradients w.r.t. the point positions flow through the same tier
    # (landmark registration: move points to brighten samples)
    def brightness(p):
        return itp.grid_pull(vol, p[None], interpolation=3,
                             bound="dct2", extrapolate=True).sum()
    g = jax.jit(jax.grad(brightness))(jnp.asarray(pts))
    print("d(sum)/d(points):", g.shape, "|g| mean",
          float(jnp.abs(g).mean()))

    # expert path: sampling the SAME volume repeatedly (iterative
    # landmark tracking) — build the box tables once and pass them in.
    # (interpret mode emulates the kernel on CPU; keep the cloud small
    # there)
    from interpol_tpu.ops import scattered as sc
    on_tpu = jax.default_backend() == "tpu"
    orders, bounds = (3, 3, 3), (3, 3, 3)          # cubic, dct2
    track = pts if on_tpu else pts[:512]
    # (the small explicit box keeps the CPU interpret-mode demo quick;
    # on TPU let auto_box size it to the cloud's density)
    box = sc.auto_box(shape, track.shape[0]) if on_tpu else (4, 4, 8)
    pre = sc.precompute_tables(jnp.asarray(vol[0, 0])[None], orders,
                               bounds, box)
    moved = jnp.asarray(track)
    for it in range(3):
        v = sc.pull_scattered(jnp.asarray(vol[0, 0])[None], moved,
                              orders, bounds, 1, box=box, pre=pre,
                              interpret=not on_tpu)
        dv = sc.grad_scattered(jnp.asarray(vol[0, 0])[None], moved,
                               orders, bounds, 1, box=box, pre=pre,
                               interpret=not on_tpu)
        moved = moved + 0.5 * dv[0]                # gradient ascent
        print(f"iter {it}: mean value {float(v.mean()):.4f}")


if __name__ == "__main__":
    main()
