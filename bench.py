"""Benchmark: AdaPGM hot-loop throughput on synthetic lasso, on-chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no wall-clock numbers (BASELINE.md); its figure of
merit is convergence vs oracle calls (asserted by tests/test_solvers.py).
The throughput target from BASELINE.json is ">=95% of roofline matvec
throughput per chip". An AdaPGM iteration needs A@x (f-eval) and A'res
(pullback):

  * XLA path: two HBM passes over A per iteration.
  * Fused Pallas path (ops.kernels.fused_ls_value_grad): ONE pass — each row
    tile is used for both products while resident in VMEM.

``vs_baseline`` = achieved HBM bandwidth / chip roofline, accounting one
pass per iteration for the fused path and two for the XLA path. Timing
forces a device->host transfer per measurement (async dispatch on this
backend returns before execution completes).
"""

import json
import os
import sys
import time

import numpy as np


_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v5": 819.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def chip_bandwidth_gbps(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in sorted(_HBM_GBPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return 800.0


def time_solve(run, reps=3):
    import jax

    best = float("inf")
    out = run()
    float(jax.tree_util.tree_leaves(out)[0])  # compile + settle
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        float(jax.tree_util.tree_leaves(out)[0])  # force completion
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    m = int(os.environ.get("BENCH_M", 16384))
    n = int(os.environ.get("BENCH_N", 16384))
    iters = int(os.environ.get("BENCH_ITERS", 200))

    import jax

    # persistent compile cache: repeat bench runs (and future rounds) reuse
    # executables instead of re-queueing the remote compiler
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    dtype = jnp.float32
    dev = jax.devices()[0]

    # large on-device problem for throughput (no host transfer of A)
    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype) * float(1.0 / np.sqrt(n))
    b = jax.random.normal(jax.random.PRNGKey(1), (m,), dtype)
    x0 = jnp.zeros(n, dtype)
    g = ap.L1Norm(lam=jnp.asarray(0.01, dtype))
    gamma0 = jnp.asarray(1e-3, dtype)

    a_bf16 = a.astype(jnp.bfloat16)

    def make_run(fused, bf16=False):
        f = LeastSquares(a=a_bf16 if bf16 else a, b=b, fused=fused)

        def run():
            res = ap.adaptive_proxgrad(
                x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=gamma0),
                tol=0.0, maxit=iters, history=False,
            )
            return res.norm_res, res.numit

        return run

    roofline = chip_bandwidth_gbps(dev)
    results = {}

    # attainable-stream calibration under the SAME run conditions: K
    # back-to-back passes inside one kernel launch (tools/roofline_probe.py
    # methodology). The nominal spec is not achievable; this is the honest
    # denominator for the kernel numbers below.
    stream_gbps = None
    try:
        from adaprox_tpu.ops.kernels import hbm_read_reduce

        reps = 20

        def run_stream():
            return hbm_read_reduce(a, block_rows=128, repeats=reps)

        dt_s, _ = time_solve(run_stream)
        stream_gbps = reps * m * n * 4 / dt_s / 1e9
        results["stream_ceiling"] = {
            "gbps": round(stream_gbps, 1),
            "frac_nominal": round(stream_gbps / roofline, 4),
        }
    except Exception as e:
        results["stream_ceiling"] = {"error": str(e)[:200]}
    # (name, fused, bf16-storage, HBM passes per iter, bytes/elem)
    variants = [("xla", False, False, 2, 4), ("fused", True, False, 1, 4),
                ("fused_bf16", True, True, 1, 2)]
    for name, fused, bf16, passes, nbytes in variants:
        try:
            dt, out = time_solve(make_run(fused, bf16))
            numit = int(out[1])
            assert numit == iters, f"early exit: {numit} != {iters}"
            iters_per_sec = iters / dt
            gbps = passes * m * n * nbytes * iters_per_sec / 1e9
            results[name] = {
                "iters_per_sec": round(iters_per_sec, 2),
                "achieved_gbps": round(gbps, 1),
                "frac_roofline": round(gbps / roofline, 4),
            }
        except Exception as e:  # a variant must never take down the benchmark
            results[name] = {"error": str(e)[:200], "iters_per_sec": 0.0}

    # headline metric: best FULL-f32 variant; bf16 storage stays in detail
    best_name = max(("xla", "fused"), key=lambda k: results[k]["iters_per_sec"])
    best = results[best_name]

    # reference-benchmark-size solve via the VMEM-resident whole-solve kernel
    try:
        from adaprox_tpu.ops.resident import resident_adapgm_l1

        prob_r = random_lasso(m=4000, n=1000, pfactor=10, seed=0)
        a_r = jnp.asarray(np.pad(prob_r.a, ((0, 96), (0, 24))), dtype)
        b_r = jnp.asarray(np.pad(prob_r.b, (0, 96)), dtype)
        lf_r = float(np.linalg.norm(prob_r.a, 2) ** 2)

        def run_resident():
            x, numit, nres, conv = resident_adapgm_l1(
                a_r, b_r, jnp.zeros(1024, dtype), 1 / lf_r, 1.0, 1e-4, 4000
            )
            return nres, numit

        dt_r, out_r = time_solve(run_resident)
        results["resident_reference_size"] = {
            "solve_ms": round(dt_r * 1e3, 2),
            "numit": int(out_r[1]),
            "iters_per_sec": round(int(out_r[1]) / dt_r, 1),
        }
    except Exception as e:
        results["resident_reference_size"] = {"error": str(e)[:200]}

    # batched multi-problem solves on the ENGINE path (the documented
    # workaround for the resident kernel's SMEM vmap limitation): a
    # 16-value regularization path at the reference's largest size, one
    # vmapped kernel vs the sequential loop
    try:
        from adaprox_tpu.solvers.batch import regularization_path

        prob_b = random_lasso(m=4000, n=1000, pfactor=10, seed=0)
        a_b = jnp.asarray(prob_b.a, dtype)
        b_b = jnp.asarray(prob_b.b, dtype)
        f_b = LeastSquares(a=a_b, b=b_b)
        lf_b = float(np.linalg.norm(prob_b.a, 2) ** 2)
        lams = jnp.asarray(np.geomspace(0.05, 5.0, 16), dtype)
        it_b = 300

        def run_batched():
            res = regularization_path(
                jnp.zeros(1000, dtype), f=f_b, lams=lams,
                gamma=jnp.asarray(1 / lf_b, dtype), tol=0.0, maxit=it_b)
            return jnp.sum(res.norm_res)  # scalar for the timing sync

        def run_sequential():
            outs = []
            for i in range(lams.shape[0]):
                outs.append(ap.adaptive_proxgrad(
                    jnp.zeros(1000, dtype), f=f_b,
                    g=ap.L1Norm(lam=lams[i]),
                    rule=ap.AdaPGMRule(gamma=jnp.asarray(1 / lf_b, dtype)),
                    tol=0.0, maxit=it_b).norm_res)
            return jnp.stack(outs).sum()

        dt_bat, _ = time_solve(run_batched)
        dt_seq, _ = time_solve(run_sequential)
        results["batched_regpath_16x4000x1000"] = {
            "batched_s": round(dt_bat, 4),
            "sequential_s": round(dt_seq, 4),
            "speedup": round(dt_seq / dt_bat, 2),
        }
    except Exception as e:
        results["batched_regpath_16x4000x1000"] = {"error": str(e)[:200]}

    # fused one-pass PD path (sqrt-lasso-shaped: f = 0, the A traffic IS the
    # iteration) vs the two-pass engine at the same size
    try:
        iters_pd = max(20, iters // 4)
        yv = jax.random.normal(jax.random.PRNGKey(5), (m,), dtype)
        h = ap.Translate(inner=ap.L2Norm(lam=jnp.asarray(1.0, dtype)), b=-yv)
        g_pd = ap.L1Norm(lam=jnp.asarray(0.01, dtype))
        na = float(jnp.sqrt(jnp.sum(a * a)))
        rule_pd = ap.AdaPGMRule.make(t=1.0, norm_a=na)
        y0_pd = jnp.zeros(m, dtype)

        def run_pd_xla():
            res = ap.adaptive_primal_dual(
                x0, y0_pd, f=ap.ZeroSmooth(), g=g_pd, h=h,
                A=ap.DenseOperator(a=a), rule=rule_pd,
                tol=0.0, maxit=iters_pd, history=False)
            return res.norm_res, res.numit

        def run_pd_fused():
            res = ap.fused_adaptive_primal_dual(
                x0, y0_pd, f=ap.ZeroSmooth(), g=g_pd, h=h, A=a, rule=rule_pd,
                tol=0.0, maxit=iters_pd, history=False)
            return res.norm_res, res.numit

        def run_pd_fused_bf16():
            res = ap.fused_adaptive_primal_dual(
                x0, y0_pd, f=ap.ZeroSmooth(), g=g_pd, h=h,
                A=a.astype(jnp.bfloat16), rule=rule_pd,
                tol=0.0, maxit=iters_pd, history=False)
            return res.norm_res, res.numit

        dt_x, _ = time_solve(run_pd_xla)
        dt_f, _ = time_solve(run_pd_fused)
        dt_fb, _ = time_solve(run_pd_fused_bf16)
        results["pd_xla"] = {
            "iters_per_sec": round(iters_pd / dt_x, 2),
            "achieved_gbps": round(2 * m * n * 4 * iters_pd / dt_x / 1e9, 1),
        }
        results["pd_fused"] = {
            "iters_per_sec": round(iters_pd / dt_f, 2),
            "achieved_gbps": round(m * n * 4 * iters_pd / dt_f / 1e9, 1),
            "speedup_vs_xla": round(dt_x / dt_f, 2),
        }
        results["pd_fused_bf16"] = {
            "iters_per_sec": round(iters_pd / dt_fb, 2),
            "speedup_vs_xla": round(dt_x / dt_fb, 2),
        }
    except Exception as e:
        results["pd_fused"] = {"error": str(e)[:200]}

    # convergence sanity on the known-optimum problem (f32, small)
    prob = random_lasso(m=1024, n=2048, pfactor=10, seed=0)
    f_small = LeastSquares(a=jnp.asarray(prob.a, dtype), b=jnp.asarray(prob.b, dtype))
    g1 = ap.L1Norm(lam=jnp.asarray(1.0, dtype))
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    res = ap.adaptive_proxgrad(
        jnp.zeros(2048, dtype), f=f_small, g=g1,
        rule=ap.AdaPGMRule(gamma=jnp.asarray(1 / lf, dtype)), tol=1e-5, maxit=4000,
    )
    gap = float(f_small.value(res.x) + g1(res.x)) - prob.optimum

    payload = {
        "metric": f"lasso_adapgm_iters_per_sec_{m}x{n}_f32_{best_name}",
        "value": best["iters_per_sec"],
        "unit": "iter/s",
        "vs_baseline": best["frac_roofline"],
        "roofline_gbps": roofline,
        "device": getattr(dev, "device_kind", str(dev)),
        "detail": results,
        "convergence_gap_f32": gap,
        "numit_to_1e-5": int(res.numit),
    }
    if stream_gbps and "achieved_gbps" in best:
        # fraction of the bandwidth this chip can actually deliver, measured
        # in the same run (the nominal-roofline fraction stays in
        # vs_baseline for cross-round comparability). On a co-tenanted
        # window the bare stream probe can land BELOW the solve loop —
        # then the solve loop itself is the best observed ceiling.
        frac = best["achieved_gbps"] / stream_gbps
        payload["frac_attainable"] = round(min(frac, 1.0), 4)
        if frac > 1.0:
            payload["stream_note"] = (
                f"stream probe ({stream_gbps:.0f} GB/s) below solve-loop "
                "bandwidth (chip co-tenancy); solve loop is the observed "
                "ceiling")
    print(json.dumps(payload))


if __name__ == "__main__":
    sys.exit(main())
