"""Tests for the tools/ measurement + reporting layer (CPU-runnable parts).

The bandwidth probes need the real chip, but the parts that rot silently
are testable locally: summarize_results (generates the judge-facing
RESULTS.md tables), the probes' argument validation (bad tile quanta must
fail fast, not ZeroDivisionError mid-run on the chip), and the shared
timed-loop methodology helper in tools/_probe_common.

A full parity_report smoke run is gated behind ADAPROX_SLOW_TESTS=1 (it is
minutes of f64 CPU solves).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


def test_summarize_results_tables(tmp_path, monkeypatch):
    """Family grouping, best-variant selection, pseudo-record optimum, data
    source label, and the fast-tree wall-clock pairing (exact-name and the
    resident-sweep prefix-pairing branch)."""
    from tools import summarize_results

    eng = tmp_path / "results"
    fast = tmp_path / "results_fast"
    rows = [
        {"data_source": "synthetic"},
        # pseudo-record with the known optimum (method-less row)
        {"objective": 1.0},
        {"method": "AdaPGM (Ours)", "it": 5, "norm_res": 1e-4, "objective": 1.6},
        {"method": "AdaPGM (Ours)", "it": 10, "norm_res": 1e-8, "objective": 1.5},
        {"method": "AdaPGM (MM)", "it": 10, "norm_res": 1e-6, "objective": 1.7},
        {"method": "aGRAAL", "it": 10, "norm_res": 3e-3, "objective": 2.0},
        {"wall_s": {"AdaPGM (Ours)": 2.0, "AdaPGM (MM)": 3.0,
                    "AdaPDM t-sweep (engine)": 4.0},
         "fast_path": "default", "fast_methods": []},
    ]
    _write_jsonl(str(eng / "lasso" / "lasso_100x300.jsonl"), rows)
    fast_rows = [
        {"data_source": "synthetic"},
        {"method": "AdaPGM (Ours)", "it": 10, "norm_res": 1e-8, "objective": 1.5},
        {"wall_s": {"AdaPGM (Ours)": 0.5,
                    "AdaPDM t-sweep (resident)": 0.25},
         "fast_path": "resident",
         "fast_methods": ["AdaPGM (Ours)", "AdaPDM t-sweep (resident)"]},
    ]
    _write_jsonl(str(fast / "lasso" / "lasso_100x300.jsonl"), fast_rows)

    out = tmp_path / "RESULTS.md"
    _run_main(summarize_results,
              ["--results", str(eng), "--fast", str(fast), "--out", str(out)],
              monkeypatch)
    text = out.read_text()

    assert "SYNTHETIC fallback data" in text
    # best variant within the AdaPGM family = smallest final residual
    assert "| AdaPGM | AdaPGM (Ours) | 10 | 1.00e-08 | 5.00e-01 |" in text
    # gap uses the pseudo-record optimum (1.5 - 1.0), not the family min
    assert "| aGRAAL | aGRAAL | 10 | 3.00e-03 | 1.00e+00 |" in text
    # exact-name wall-clock pairing
    assert "| AdaPGM (Ours) | 2.00 | 0.50 | 4.00x | resident |" in text
    # resident sweeps rename the method row -> prefix pairing
    assert ("| AdaPGM t-sweep" not in text)
    assert ("AdaPDM t-sweep (resident) vs AdaPDM t-sweep (engine) | 4.00 | "
            "0.25 | 16.00x" in text)


def test_summarize_results_optimum_fallback(tmp_path, monkeypatch):
    """With no pseudo-record row the optimum falls back to the best finite
    objective seen across methods (reference find_best semantics)."""
    from tools import summarize_results

    eng = tmp_path / "results"
    rows = [
        {"method": "PGM", "it": 3, "norm_res": 1e-2, "objective": 5.0},
        {"method": "AdaPGM (Ours)", "it": 3, "norm_res": 1e-3,
         "objective": 4.0},
    ]
    _write_jsonl(str(eng / "nwc" / "nwc.jsonl"), rows)
    out = tmp_path / "R.md"
    _run_main(summarize_results, ["--results", str(eng), "--out", str(out)],
              monkeypatch)
    text = out.read_text()
    # gap vs the 4.0 fallback optimum: PGM 1.0, best row 0.0
    assert "| PGM | PGM | 3 | 1.00e-02 | 1.00e+00 |" in text
    assert "| AdaPGM | AdaPGM (Ours) | 3 | 1.00e-03 | 0.00e+00 |" in text


@pytest.mark.parametrize("argv", [
    ["--bm", "4"],                     # not a sublane multiple
    ["--bm", "64", "--bn", "1000"],    # not a lane multiple
    ["--m", "8190"],                   # bm does not divide m
    ["--bm", "8", "--bn", "128"],      # byte_factor 1: equal-bytes control
    ["--bm", "8", "--bn", "512"],      # byte_factor 4: still < 8x
])
def test_bcsr_floor_probe_rejects_bad_tiles(argv, monkeypatch):
    """Tile-quanta / byte-factor validation fires at arg-parse time (before
    any jax import or chip work) — these were live failure modes: bm=4
    raised ZeroDivisionError mid-probe, bn=128 silently inverted the
    traversal-vs-bytes diagnosis."""
    from tools import bcsr_floor_probe

    with pytest.raises(SystemExit):
        _run_main(bcsr_floor_probe, argv, monkeypatch)


def test_probe_common_timed_loop():
    """The shared methodology helper: K carry-fed reps inside one jit,
    operands passed as jit arguments, result is a sane per-rep time."""
    import jax
    import jax.numpy as jnp

    from tools._probe_common import make_timed_loop

    timed_loop = make_timed_loop(jax, jnp, K=4)
    a = jnp.arange(8.0, dtype=jnp.float32)

    calls = []

    def step(c, arr):
        calls.append(1)  # trace-time only: jit must trace ONCE
        return jnp.sum(arr) * jnp.float32(1e-6) + c * 0

    secs = timed_loop(step, a)
    assert secs > 0
    assert len(calls) == 1  # one trace; reps happen inside the fori_loop


@pytest.mark.skipif(not os.environ.get("ADAPROX_SLOW_TESTS"),
                    reason="minutes of f64 CPU solves; set ADAPROX_SLOW_TESTS=1")
def test_parity_report_fast_smoke(tmp_path):
    """parity_report --fast end-to-end on CPU: writes a report containing
    every section and no unmet residual criterion rows."""
    out = tmp_path / "PARITY_SMOKE.md"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "parity_report.py"),
         "--fast", "--out", str(out)],
        cwd=ROOT, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    text = out.read_text()
    for section in ("## Lasso", "## Sparse logistic regression",
                    "## Cubic-regularized subproblem",
                    "## Nesterov worst case", "## Primal-dual residual"):
        assert section in text


def test_bench_timing_helpers():
    """bench.py's calibration helpers, off-chip: interleaved best/median
    with dispatch subtraction, and the device->bandwidth table lookup."""
    import time as _time

    import bench

    calls = []

    def make(delay):
        def fn():
            calls.append(delay)
            _time.sleep(delay)
            return 0.0
        return fn

    import jax.numpy as jnp

    # monkeypatch-free: _sync accepts any pytree with a leaf
    orig_sync = bench._sync
    bench._sync = lambda out: None
    try:
        timed = bench.time_interleaved(
            {"fast": make(0.001), "slow": make(0.004)}, rounds=3,
            dispatch_s=0.0005)
        (fb, fm), (sb, sm) = timed["fast"], timed["slow"]
        assert fb < sb           # ordering preserved
        assert fm >= fb and sm >= sb  # median >= best
        assert fb >= 1e-9        # dispatch subtraction floors at epsilon
        # 3 rounds x 2 runners (+1 compile pass each)
        assert len(calls) == 8
    finally:
        bench._sync = orig_sync

    class Dev:
        device_kind = "TPU v5 lite"

    assert bench.chip_bandwidth_gbps(Dev()) == 819.0
    Dev.device_kind = "TPU v6e something"
    assert bench.chip_bandwidth_gbps(Dev()) == 1640.0
    Dev.device_kind = "unknown"
    assert bench.chip_bandwidth_gbps(Dev()) == 800.0
