"""Benchmark harness: 3D cubic grid_pull throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Gvox/s", "vs_baseline": N,
     "parity_maxabs": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the round-1 driver-assigned north star: 70% of the HBM
roofline (20 B/voxel -> 41 Gvox/s at 819 GB/s, 0.7x = 28.7).  Round-2
measurements showed that model is WRONG for this op on this part: the
windowed cubic pull at max_disp=2 needs S^3 = 512 FMA/voxel (S = 8) and
time scales as S^3 across orders (BASELINE.md), i.e. the op is
VPU-compute-bound, not HBM-bound.  ``vs_compute_roofline`` reports the
honest model: fraction of the S^3-FMA VPU roofline
(sustained-FMA-rate / 512 FMA per voxel — see BASELINE.md "Roofline
re-foundation" for the peak calculation).  ``vs_baseline`` is kept
against 28.7 for cross-round comparability.

``parity_maxabs`` is the compiled-path correctness GATE: max |Pallas -
XLA| of pull/grad/push on the real chip (CI runs the kernels in
interpret mode only; this catches Mosaic lowering divergence).  If it
exceeds PARITY_TOL — or the gate itself fails to run — the JSON line
carries ``"ok": false`` and the process exits nonzero: a lowering
divergence must never ship a green-looking bench artifact.

Timing method: the device tunnel costs ~3 ms per dispatch and has a
large sync latency, so the op is applied in a data-dependent chain of R
applications *inside one jit* and timed at two chain lengths; the slope
(t_R2 - t_R1) / (R2 - R1) is the per-application time with dispatch and
sync overhead cancelled.  This measures the op, not the tunnel — in
production (local chips, many ops per jitted step) the dispatch floor
does not exist.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_GVOX = 28.7   # round-1 (mis-modeled) HBM north star, kept for
#                        cross-round comparability of vs_baseline
# Compute roofline for the windowed cubic pull at max_disp=2: S^3 = 512
# FMA/voxel at the measured sustained VPU FMA rate (1.0 T-FMA/s
# in-kernel, scripts/tpu_kernel_lab*.py; theoretical-peak discussion in
# BASELINE.md).
SUSTAINED_TFMA = 1.0
FMA_PER_VOXEL = 512
ROOFLINE_GVOX = SUSTAINED_TFMA * 1e12 / FMA_PER_VOXEL / 1e9   # ~1.95
PARITY_TOL = 1e-5


def _sync(x):
    # slice to a scalar ON DEVICE before fetching: materializing a full
    # array pulls it through the (slow) device tunnel
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def wait_healthy(limit=5.0, tries=30):
    """The device tunnel queues work across clients; gate measurements on
    a small round-trip so backlog from other sessions isn't billed to the
    op under test."""
    x = jnp.ones(8)
    h = None
    for _ in range(tries):
        t0 = time.time()
        _sync(x + 1)
        h = time.time() - t0
        if h < limit:
            return h
        time.sleep(30)
    return h


def slope_time(body, args, R1=2, R2=12, iters=3, perturb=1e-6):
    """Per-application wall time with the tunnel's three timing traps
    cancelled: (a) ~3 ms dispatch floor + large sync latency, (b)
    value-level result caching of bitwise-identical dispatch inputs
    (so every call perturbs its input by a bit-changing 1e-6, never an
    underflowing 1e-30), (c) remote-compile blowup of unrolled chains
    (so the op is chained with ``lax.fori_loop`` over a RUNTIME trip
    count — one compile serves every R).  Reported: the slope between
    two chain lengths.  ``body(carry) -> carry`` applies the op once."""

    @jax.jit
    def chain(r, *cur):
        return jax.lax.fori_loop(0, r, lambda i, c: body(c), cur)

    salt = [0]

    def run(R, n):
        out = None
        for _ in range(n):
            salt[0] += 1
            cur = (args[0] + salt[0] * perturb,) + tuple(args[1:])
            out = chain(R, *cur)
        _sync(jnp.ravel(out[0])[:1])

    ts = []
    for R in (R1, R2):
        run(R, 2)           # compile + settle
        t0 = time.time()
        run(R, iters)
        ts.append((time.time() - t0) / iters)
    return max((ts[1] - ts[0]) / (R2 - R1), 1e-9)


def _data(n, max_disp, C=1, seed=0):
    import interpol_tpu as itp
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.standard_normal((C, n, n, n)).astype(np.float32))
    grid = (itp.identity_grid((n, n, n), dtype=jnp.float32)
            + jnp.asarray(rng.uniform(-max_disp, max_disp,
                                      (n, n, n, 3)).astype(np.float32)))
    return vol, grid


def parity_gate(n=32, order=3, max_disp=2.0):
    """Compiled Pallas vs XLA window formulation, on-chip — the full
    dense-kernel family incl. the second-order adjoints (hess /
    pushgrad, round 5) that serve grad_window's VJP."""
    from interpol_tpu import backend
    from interpol_tpu.ops import window as wd

    vol, grid = _data(n, max_disp, C=2, seed=1)
    rng = np.random.default_rng(2)
    ct = jnp.asarray(rng.standard_normal(vol.shape + (3,))
                     .astype(np.float32))
    o, b = (order,) * 3, (3,) * 3
    outs = {}
    for be in ("pallas", "xla"):
        with backend.use_backend(be):
            p = jax.jit(lambda v, g: wd._pull_impl(v, g, o, b, 1,
                                                   max_disp))(vol, grid)
            gr = jax.jit(lambda v, g: wd._grad_impl(v, g, o, b, 1,
                                                    max_disp))(vol, grid)
            ps = jax.jit(lambda v, g: wd._push_impl(v, g, o, b, 1,
                                                    max_disp))(vol, grid)
            hs = jax.jit(lambda v, g: wd._hess_impl(v, g, o, b, 1,
                                                    max_disp))(vol, grid)
            pg = jax.jit(lambda c, g: wd._pushgrad_impl(c, g, o, b, 1,
                                                        max_disp))(ct,
                                                                   grid)
            outs[be] = tuple(np.asarray(x) for x in (p, gr, ps, hs, pg))
    return max(float(np.abs(a - c).max())
               for a, c in zip(outs["pallas"], outs["xla"]))


def parity_gate_scattered(n=48, P=60_000, order=3):
    """Compiled scattered gather (pull/grad) and splat (push) kernels vs
    the generic XLA cores, on-chip (round-4 verdict weak #4: interpret
    mode does not catch Mosaic lowering divergence — sublane-DMA
    alignment and MXU bf16-default precision were both on-chip-only
    failures).  Relative error against each output's own scale."""
    from interpol_tpu.ops import scattered as sc
    from interpol_tpu.ops import ndkernels as nd

    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.standard_normal((1, n, n, n)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, n - 1, (P, 3)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal((1, P)).astype(np.float32))
    o, b = (order,) * 3, (3,) * 3
    ish = (n,) * 3

    pairs = [
        (jax.jit(lambda v, p: sc.pull_scattered(v, p, o, b, 1))(vol, pts),
         jax.jit(lambda v, p: nd.pull_core(v, p, o, b, 1))(vol, pts)),
        (jax.jit(lambda v, p: sc.grad_scattered(v, p, o, b, 1))(vol, pts),
         jax.jit(lambda v, p: nd.grad_core(v, p, o, b, 1))(vol, pts)),
        (jax.jit(lambda v, p: sc.push_scattered(v, p, ish, o, b, 1))(
            vals, pts),
         jax.jit(lambda v, p: nd.push_core(v, p, ish, o, b, 1))(
             vals, pts)),
    ]
    return max(float(jnp.abs(a - c).max() / jnp.abs(c).max())
               for a, c in pairs)


def bench_pull(n=256, order=3, max_disp=2.0):
    from interpol_tpu.ops import window as wd

    vol, grid = _data(n, max_disp)
    o, b = (order,) * 3, (3,) * 3

    dt = slope_time(
        lambda c: (wd.pull_window(c[0], c[1], o, b, 1, max_disp), c[1]),
        (vol, grid))
    return n ** 3 / dt / 1e9


def bench_secondary(n=256, order=3, max_disp=2.0):
    """push / fused-grad / prefilter throughput at the headline config —
    cheap extra keys so a regression in any op family is visible between
    BENCH_SUITE refreshes (round-2 verdict, "weak" #7)."""
    from interpol_tpu.ops import window as wd
    from interpol_tpu.ops import coeff as cf

    vol, grid = _data(n, max_disp)
    o, b = (order,) * 3, (3,) * 3
    out = {}
    dt = slope_time(
        lambda c: (wd.push_window(c[0], c[1], o, b, 1, max_disp), c[1]),
        (vol, grid))
    out["push_gvox"] = round(n ** 3 / dt / 1e9, 4)
    dt = slope_time(
        lambda c: (wd.grad_window(c[0], c[1], o, b, 1, max_disp)[..., 0],
                   c[1]),
        (vol, grid))
    out["grad_gvox"] = round(n ** 3 / dt / 1e9, 4)
    # coeff is ~1 ms/app at 256^3: the default R2=12 chain leaves only
    # ~10 ms of contrast over the ~3 ms dispatch floor, so the recorded
    # value wandered 16-44 Gvox/s between artifacts (BENCH_r03 22.2 vs
    # suite 16.5 vs an earlier headline 44.4).  Widen the contrast the
    # way bench_suite's widened coeff chain does for this op.  The
    # body is self-normalizing (r4 advisor): the cubic inverse
    # prefilter gains ~27x per 3-D application, so the raw chain
    # overflows fp32 around iteration ~30 — damp by a constant ~1/27
    # so every iteration runs on finite data (timing is unaffected:
    # one fused scalar multiply, no data-dependent paths on TPU).
    dt = slope_time(
        lambda c: (cf.spline_coeff_nd(c[0], o, b, 3) * 0.0370, c[1]),
        (vol, grid), R1=2, R2=62)
    out["coeff_gvox"] = round(n ** 3 / dt / 1e9, 4)
    return out


def bench_scattered(P=1_000_000, n=256, order=3):
    """One-shot scattered pull (1M-point cloud into n^3, cubic) on the
    box-sorted native tier — the round-3 jitfields-parity closer; a
    headline key so tier regressions surface between BENCH_SUITE
    refreshes.  Doctrine #5: the chain perturbs BOTH the volume (so the
    box-table build is counted every iteration) and the points."""
    from interpol_tpu.ops import scattered as sc

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal((1, n, n, n)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, n - 1, (P, 3)).astype(np.float32))
    o, b = (order,) * 3, (3,) * 3

    def body(c):
        out = sc.pull_scattered(c[0], c[1], o, b, 1)
        return (c[0] + 1e-9 * out[0, 0],
                c[1].at[:, :].add(1e-9 * out[0, :, None]))

    dt = slope_time(body, (vol, pts))
    return P / dt / 1e9


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    wait_healthy()
    result = {
        "metric": f"3d_cubic_warp_pull_{n}cubed_fp32_window",
        "value": None, "unit": "Gvox/s", "vs_baseline": None,
        "ok": True,
    }
    # the parity gate GATES: run it first, fail loudly on violation or
    # on any gate exception (a broken kernel must not ship a
    # green-looking artifact)
    try:
        parity = parity_gate()
        result["parity_maxabs"] = float(f"{parity:.3e}")
        if not (parity < PARITY_TOL):
            result["ok"] = False
            result["error"] = (f"parity gate FAILED: max|Pallas - XLA| "
                               f"= {parity:.3e} >= {PARITY_TOL:g}")
    except Exception as e:
        result["ok"] = False
        result["error"] = f"parity gate did not run: {str(e)[:200]}"
    try:
        sp = parity_gate_scattered()
        result["parity_scattered_rel"] = float(f"{sp:.3e}")
        if not (sp < PARITY_TOL):
            result["ok"] = False
            result["error_scattered"] = (
                f"scattered parity gate FAILED: rel|Pallas - core| "
                f"= {sp:.3e} >= {PARITY_TOL:g}")
    except Exception as e:
        result["ok"] = False
        result["error_scattered"] = \
            f"scattered parity gate did not run: {str(e)[:200]}"
    if not result["ok"]:
        print(json.dumps(result))
        sys.exit(1)

    gvox = bench_pull(n=n)
    result["value"] = round(gvox, 4)
    result["vs_baseline"] = round(gvox / BASELINE_GVOX, 5)
    result["vs_compute_roofline"] = round(gvox / ROOFLINE_GVOX, 5)
    try:
        result.update(bench_secondary(n=n))
    except Exception as e:   # secondary keys are informative, not gating
        result["secondary_error"] = str(e)[:200]
    try:
        result["scattered_pull_gpt"] = round(bench_scattered(n=n), 4)
    except Exception as e:   # distinct key: must not mask secondary_error
        result["scattered_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
