"""Wall-clock timing + device profiling (SURVEY §5: the reference's cost
model is oracle calls only; the TPU build adds throughput instrumentation).

* ``timed(run)`` — wall-clock a jitted solve honestly: forces a device->host
  sync of a result leaf per repetition (async dispatch can return before
  execution completes, especially on remote backends).
* ``trace(logdir)`` — context manager around ``jax.profiler`` for Perfetto/
  TensorBoard device traces of the solver loop.
* ``throughput_report(...)`` — iterations/s + achieved HBM bandwidth vs the
  chip roofline for matvec-bound solvers (the BASELINE.json figure of
  merit).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["timed", "trace", "throughput_report", "HBM_GBPS", "chip_bandwidth_gbps"]

HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v5": 819.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def chip_bandwidth_gbps(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for k, v in sorted(HBM_GBPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return 800.0


def timed(run, reps: int = 3):
    """Best-of-``reps`` wall time of ``run()`` with forced completion.
    Returns (seconds, last_output); the first (compile) call is excluded."""
    out = run()
    float(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        float(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace of the enclosed block (view in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput_report(seconds: float, iters: int, bytes_per_iter: float,
                      device=None) -> dict:
    roofline = chip_bandwidth_gbps(device)
    ips = iters / seconds
    gbps = bytes_per_iter * ips / 1e9
    return {
        "iters_per_sec": ips,
        "achieved_gbps": gbps,
        "roofline_gbps": roofline,
        "frac_roofline": gbps / (roofline or 1.0),
    }
