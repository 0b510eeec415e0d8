"""On-chip verify: scattered tier with the overflow round + epilogue
restructure (round-3 fifth session).  Compiled (NOT interpret) parity
vs the XLA cores on a clustered cloud that forces the round-2 pass,
plus the standard dense grid_pull user flow.

Run detached: nohup python scripts/verify_scattered_r3.py > log &
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from scripts_common import wait_healthy  # noqa: E402

import interpol_tpu as itp  # noqa: E402
from interpol_tpu.ops import ndkernels as nd  # noqa: E402
from interpol_tpu.ops import scattered as sc  # noqa: E402


def main():
    print("health:", wait_healthy(), flush=True)
    print("devices:", jax.devices(), flush=True)

    # 1. standard dense user flow (unchanged code path, sanity)
    img = np.random.rand(1, 1, 64, 64).astype(np.float32)
    grid = itp.identity_grid((64, 64))[None] + 0.3
    out = itp.grid_pull(img, grid, interpolation=3, bound="dct2",
                        extrapolate=True, prefilter=True)
    print("dense pull:", out.shape, float(out.mean()), flush=True)

    # 2. scattered compiled parity with a clustered cloud: one (4,4,8)
    # box gets ~200 points (ranks 128+ -> the overflow round) and
    # another gets ~300 (ranks 256+ -> the exact fallback), plus 10%
    # out-of-volume points
    rng = np.random.default_rng(0)
    ish = (32, 32, 64)
    N = 40000
    vol = jnp.asarray(rng.standard_normal((2,) + ish).astype(np.float32))
    pts = np.concatenate([
        rng.uniform([4.0, 4.0, 8.0], [7.5, 7.5, 15.5], (200, 3)),
        rng.uniform([12.0, 12.0, 16.0], [15.5, 15.5, 23.5], (300, 3)),
        rng.uniform(-3.0, np.asarray(ish) + 2.0, (N // 10, 3)),
        rng.uniform(0, np.asarray(ish) - 1, (N, 3)),
    ]).astype(np.float32)
    pts = jnp.asarray(pts)
    o, b = (3,) * 3, (3,) * 3
    box = (4, 4, 8)

    ref = jax.jit(lambda v, p: nd.pull_core(v, p, o, b, 1))(vol, pts)
    got = jax.jit(lambda v, p: sc.pull_scattered(v, p, o, b, 1,
                                                 box=box))(vol, pts)
    e_pull = float(jnp.abs(got - ref).max())
    print(f"scattered pull maxabs: {e_pull:.3e}", flush=True)

    refg = jax.jit(lambda v, p: nd.grad_core(v, p, o, b, 1))(vol, pts)
    gotg = jax.jit(lambda v, p: sc.grad_scattered(v, p, o, b, 1,
                                                  box=box))(vol, pts)
    e_grad = float(jnp.abs(gotg - refg).max())
    print(f"scattered grad maxabs: {e_grad:.3e}", flush=True)

    vals = jnp.asarray(rng.standard_normal(
        (2, pts.shape[0])).astype(np.float32))
    refp = jax.jit(lambda v, p: nd.push_core(v, p, ish, o, b, 1)
                   )(vals, pts)
    gotp = jax.jit(lambda v, p: sc.push_scattered(v, p, ish, o, b, 1)
                   )(vals, pts)
    e_push = float((jnp.abs(gotp - refp).max()
                    / jnp.abs(refp).max()))
    print(f"scattered push rel: {e_push:.3e}", flush=True)

    # 3. custom VJPs through the overflow round (user training flow)
    def loss_sc(v, p):
        return (sc.pull_scattered(v, p, o, b, 1, box=box) ** 2).sum()

    def loss_nd(v, p):
        return (nd.pull_core(v, p, o, b, 1) ** 2).sum()

    dv_sc, dp_sc = jax.jit(jax.grad(loss_sc, argnums=(0, 1)))(vol, pts)
    dv_nd, dp_nd = jax.jit(jax.grad(loss_nd, argnums=(0, 1)))(vol, pts)
    e_dv = float(jnp.abs(dv_sc - dv_nd).max() / jnp.abs(dv_nd).max())
    e_dp = float(jnp.abs(dp_sc - dp_nd).max() / jnp.abs(dp_nd).max())
    print(f"vjp d_vol rel: {e_dv:.3e}  d_pts rel: {e_dp:.3e}",
          flush=True)

    tol = 2e-5
    ok = max(e_pull, e_grad, e_push, e_dv, e_dp) < tol
    print("VERIFY", "OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
