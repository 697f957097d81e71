"""Benchmark: AdaPGM hot-loop throughput on the synthetic known-optimum lasso.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no wall-clock numbers (BASELINE.md) — its figure of
merit is convergence vs oracle calls, which tests/test_solvers.py asserts.
The throughput target from BASELINE.json is ">=95% of roofline matvec
throughput per chip": each AdaPGM iteration streams the data matrix twice
(A@x in the f-eval, A'res in the pullback), so the roofline iterations/s on
an HBM-bound problem is  BW / (2 * m * n * bytes).  ``vs_baseline`` reports
the achieved fraction of that roofline.
"""

import json
import os
import sys
import time

import numpy as np

# default to f32 on accelerators; tests use f64 on cpu
os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp


# Peak HBM bandwidth per chip, GB/s (public figures; fallback 800)
_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def chip_bandwidth_gbps(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in _HBM_GBPS.items():
        if kind.startswith(k):
            return v
    return 800.0


def main():
    m = int(os.environ.get("BENCH_M", 4096))
    n = int(os.environ.get("BENCH_N", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 300))
    dtype = jnp.float32

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    dev = jax.devices()[0]
    prob = random_lasso(m=min(m, 2048), n=min(n, 2048), pfactor=10, seed=0)
    # tile up to the bench size so generation stays fast but the matvec is big
    reps_r = -(-m // prob.a.shape[0])
    reps_c = -(-n // prob.a.shape[1])
    a = np.tile(prob.a, (reps_r, reps_c))[:m, :n] / reps_c
    b = np.tile(prob.b, reps_r)[:m]
    a_j = jnp.asarray(a, dtype)
    b_j = jnp.asarray(b, dtype)
    x0 = jnp.zeros(n, dtype)

    f = LeastSquares(a=a_j, b=b_j)
    g = ap.L1Norm(lam=jnp.asarray(1.0, dtype))
    gamma0 = 1.0 / (np.linalg.norm(a[: min(m, 512)], 2) ** 2 * (m / min(m, 512)))

    def run(x0):
        res = ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=jnp.asarray(gamma0, dtype)),
            tol=0.0, maxit=iters, history=False,
        )
        return res.x, res.norm_res

    # warm-up / compile
    x_out, nr = run(x0)
    jax.block_until_ready(x_out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        x_out, nr = run(x0)
        jax.block_until_ready(x_out)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    iters_per_sec = iters / dt
    bytes_per_iter = 2.0 * m * n * np.dtype(np.float32).itemsize
    achieved_gbps = bytes_per_iter * iters_per_sec / 1e9
    roofline = chip_bandwidth_gbps(dev)
    vs_baseline = achieved_gbps / roofline

    # convergence sanity on the un-tiled known-optimum problem (f32)
    f_small = LeastSquares(a=jnp.asarray(prob.a, dtype), b=jnp.asarray(prob.b, dtype))
    res = ap.adaptive_proxgrad(
        jnp.zeros(prob.a.shape[1], dtype), f=f_small, g=g,
        rule=ap.AdaPGMRule(gamma=jnp.asarray(1e-3, dtype)), tol=1e-4, maxit=2000,
    )
    gap = float(f_small.value(res.x) + g(res.x)) - prob.optimum

    print(json.dumps({
        "metric": f"lasso_adapgm_iters_per_sec_{m}x{n}_f32",
        "value": round(iters_per_sec, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 4),
        "achieved_gbps": round(achieved_gbps, 1),
        "roofline_gbps": roofline,
        "device": getattr(dev, "device_kind", str(dev)),
        "convergence_gap_f32": float(gap),
        "numit_to_1e-4": int(res.numit),
    }))


if __name__ == "__main__":
    sys.exit(main())
