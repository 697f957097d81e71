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
    # single source of truth: utils/profiling.py's table (adding a new
    # device kind there must reach the bench headline); the local copy
    # exists only for the watchdog phase before the package can import
    try:
        from adaprox_tpu.utils.profiling import chip_bandwidth_gbps as _pkg

        return _pkg(device)
    except Exception:
        pass
    kind = getattr(device, "device_kind", "")
    for k, v in sorted(_HBM_GBPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return 800.0


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])


def time_solve(run, reps=3):
    best = float("inf")
    out = run()
    _sync(out)  # compile + settle
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        _sync(out)  # force completion
        best = min(best, time.perf_counter() - t0)
    return best, out


def measure_dispatch_latency(reps=8):
    """Best-of round-trip latency of a trivial dispatched op. On this
    remote-relay backend a single dispatch costs ~25 ms regardless of the
    program (CLAUDE.md) — a pure additive bias on every timed launch that
    must be subtracted before converting times to bandwidth (it read the
    BENCH_r02 stream probe 40% low: 20 reps = 31 ms of work behind 25 ms
    of latency)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda s: s + 1.0)
    x = jnp.zeros(())
    float(tiny(x))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(tiny(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_interleaved(runners, rounds=4, dispatch_s=0.0):
    """Round-robin timing: compile every runner, then time them interleaved
    for ``rounds`` passes, returning per-runner (best, median) seconds with
    the relay dispatch latency subtracted.

    On this shared chip the co-tenant load drifts on a minutes scale, so
    back-to-back sequential measurements of different variants are NOT
    comparable (BENCH_r02 recorded a 24% fused-vs-pd_fused "gap" whose
    dominant terms were a per-solve 1 GB transpose + warm-up amortized over
    a 4x shorter pd run, plus window drift — tools/pd_bw_probe2.py measured
    the true same-window kernel gap at 2.3%). Interleaving puts every
    variant through the same load profile; best-of rejects transient
    spikes."""
    import statistics

    for name, fn in runners.items():
        _sync(fn())  # compile + settle
    times = {name: [] for name in runners}
    for _ in range(rounds):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            _sync(fn())
            times[name].append(max(time.perf_counter() - t0 - dispatch_s, 1e-9))
    return {name: (min(ts), statistics.median(ts)) for name, ts in times.items()}


def _arm_outage_watchdog(budget_s, payload):
    """Backend init on this image blocks INSIDE the C++ PJRT client when
    the axon relay is down (observed: a plain ``jax.devices()`` hung ~27
    min before raising UNAVAILABLE), so a Python-level timeout around it
    cannot fire. This daemon timer bounds the whole init+warmup phase: if
    it expires, one well-formed JSON line records the outage and the
    process exits 0 — the artifact is the point. Cancel it once the first
    device round-trip succeeds."""
    import threading

    def _bail():
        # once-guard: Timer.cancel() cannot stop an already-running
        # callback, so without this a main-thread failure print racing the
        # timer could emit TWO JSON lines (the artifact contract is ONE)
        if not _PRINTED_ONCE.acquire(blocking=False):
            return
        print(json.dumps(payload))
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(budget_s, _bail)
    t.daemon = True
    t.start()
    return t


import threading as _threading

# exactly ONE JSON line prints per main() invocation (the watchdog thread
# and the main thread race on it); re-armed at each main() entry so
# in-process re-invocations (tests) get a fresh guard
_PRINTED_ONCE = _threading.Lock()


def main():
    global _PRINTED_ONCE
    _PRINTED_ONCE = _threading.Lock()
    m = int(os.environ.get("BENCH_M", 16384))
    n = int(os.environ.get("BENCH_N", 16384))
    iters = int(os.environ.get("BENCH_ITERS", 200))

    # metric name matches the healthy headline (BENCH_r02: ..._f32_fused)
    # so outage rows land in the same time series, visibly degraded
    outage_payload = {
        "metric": f"lasso_adapgm_iters_per_sec_{m}x{n}_f32_fused",
        "value": 0.0,
        "unit": "iter/s",
        "vs_baseline": 0.0,
        "error": "tpu_backend_unavailable",
        "detail": {},
    }
    budget_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 900))
    watchdog = None
    if budget_s > 0:
        outage_payload["detail"]["probe"] = (
            f"backend init/warmup exceeded {budget_s:g}s (relay down?)")
        watchdog = _arm_outage_watchdog(budget_s, dict(outage_payload))

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

    # first device round-trip: proves the backend is live (cancels the
    # watchdog), absorbs the 60-100 s first-dispatch relay stall outside
    # every timed row (CLAUDE.md), and retries fast-erroring init a couple
    # of times — transient relay blips recover within the budget
    dev = None
    err = ""
    wait_s = max(1.0, min(120.0, budget_s / 5)) if budget_s > 0 else 1.0
    for attempt in range(3):
        if attempt:
            time.sleep(wait_s)
        try:
            dev = jax.devices()[0]
            float(jnp.zeros(()) + 1.0)
            break
        except Exception as e:  # init raised (fast outage path)
            dev = None
            err = str(e)[:300]
    if dev is None:
        if watchdog is not None:
            watchdog.cancel()
        outage_payload["detail"]["probe"] = err
        if _PRINTED_ONCE.acquire(blocking=False):  # watchdog may have won
            print(json.dumps(outage_payload))
        return 0  # the JSON line IS the artifact; rc 0 so it's recorded
    if watchdog is not None:
        watchdog.cancel()

    # large on-device problem for throughput (no host transfer of A)
    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), dtype) * float(1.0 / np.sqrt(n))
    b = jax.random.normal(jax.random.PRNGKey(1), (m,), dtype)
    x0 = jnp.zeros(n, dtype)
    g = ap.L1Norm(lam=jnp.asarray(0.01, dtype))
    gamma0 = jnp.asarray(1e-3, dtype)

    a_bf16 = a.astype(jnp.bfloat16)

    def make_run(fused, bf16=False, n_it=None):
        f = LeastSquares(a=a_bf16 if bf16 else a, b=b, fused=fused)
        n_it = iters if n_it is None else n_it

        def run():
            res = ap.adaptive_proxgrad(
                x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=gamma0),
                tol=0.0, maxit=n_it, history=False,
            )
            return res.norm_res, res.numit

        return run

    roofline = chip_bandwidth_gbps(dev)
    results = {}

    # ---- same-window interleaved calibration (VERDICT r2 items 1-2) ------
    # All bandwidth-comparable measurements — the attainable-stream probe,
    # the LS engine variants, and the PD engine variants — are timed
    # ROUND-ROBIN in one tight window with best-of-N per runner, so the
    # stream ceiling and every solve loop see the same co-tenant load and
    # their ratios are defensible from this artifact alone.
    from adaprox_tpu.ops.kernels import hbm_dma_read, hbm_read_reduce

    # every runner targets >= ~0.3 s of device work so the (subtracted)
    # dispatch latency and any residual per-launch cost are noise
    stream_reps = max(iters, 200)

    def run_stream():
        return hbm_read_reduce(a, block_rows=128, repeats=stream_reps)

    # independent ceiling probes IN THE SAME WINDOW (r3 verdict #1): a pure
    # manual-DMA read (no pipeline machinery, 3-deep buffering) and XLA's
    # own reduce. If either beat the pallas stream, the ceiling was
    # probe-limited; tools/ceiling_probe.py has the full tile/depth sweep.
    def run_stream_dma():
        return hbm_dma_read(a, chunk_rows=128, depth=3, repeats=stream_reps)

    import jax as _jax

    @_jax.jit
    def _xla_sum_loop(a_arg):  # `a` as ARGUMENT (closure capture wedges the
        return _jax.lax.fori_loop(  # remote compiler for tens of minutes)
            0, stream_reps,
            lambda i, c: c * 1e-30 + jnp.sum(a_arg * (1.0 + 1e-30 * c)),
            jnp.float32(0.0))

    def run_stream_xla():
        return _xla_sum_loop(a)

    iters_pd = iters
    yv = jax.random.normal(jax.random.PRNGKey(5), (m,), dtype)
    h = ap.Translate(inner=ap.L2Norm(lam=jnp.asarray(1.0, dtype)), b=-yv)
    g_pd = ap.L1Norm(lam=jnp.asarray(0.01, dtype))
    na = float(jnp.sqrt(jnp.sum(a * a)))
    rule_pd = ap.AdaPGMRule.make(t=1.0, norm_a=na)
    y0_pd = jnp.zeros(m, dtype)
    # the fused engine streams A' — materialize it ONCE; passing it per
    # solve keeps the per-call transpose out of the measurement, as a real
    # sweep/driver would
    at_f32 = a.T
    at_bf16 = a_bf16.T

    def make_run_pd(a_mat, at_mat, n_it, fused):
        if fused:
            def run():
                res = ap.fused_adaptive_primal_dual(
                    x0, y0_pd, f=ap.ZeroSmooth(), g=g_pd, h=h, A=a_mat,
                    at=at_mat, rule=rule_pd, tol=0.0, maxit=n_it,
                    history=False)
                return res.norm_res, res.numit
        else:
            def run():
                res = ap.adaptive_primal_dual(
                    x0, y0_pd, f=ap.ZeroSmooth(), g=g_pd, h=h,
                    A=ap.DenseOperator(a=a_mat), rule=rule_pd,
                    tol=0.0, maxit=n_it, history=False)
                return res.norm_res, res.numit
        return run

    # name -> (runner, passes-over-A per iter, bytes/elem, iters); bf16
    # variants run 2x the iterations to equalize wall time per measurement
    spec = {
        "stream": (run_stream, 1, 4, stream_reps),
        "stream_dma": (run_stream_dma, 1, 4, stream_reps),
        "stream_xla": (run_stream_xla, 1, 4, stream_reps),
        "xla": (make_run(False), 2, 4, iters),
        "fused": (make_run(True), 1, 4, iters),
        "fused_bf16": (make_run(True, bf16=True, n_it=2 * iters), 1, 2, 2 * iters),
        "pd_xla": (make_run_pd(a, None, iters_pd, False), 2, 4, iters_pd),
        "pd_fused": (make_run_pd(a, at_f32, iters_pd, True), 1, 4, iters_pd),
        "pd_fused_bf16": (make_run_pd(a_bf16, at_bf16, 2 * iters_pd, True),
                          1, 2, 2 * iters_pd),
    }
    runners = {}
    for name, (fn, _, _, reps_n) in spec.items():
        try:
            out = fn()  # compile; drop runners that cannot build
            _sync(out)
            if isinstance(out, tuple) and len(out) == 2:
                # solve runners return (norm_res, numit): a NaN residual
                # exits the while_loop early (NaN > 0 is False) and would
                # silently inflate iters_per_sec — reject it here
                numit = int(out[1])
                if numit != reps_n:
                    raise RuntimeError(
                        f"early exit: numit={numit}, expected {reps_n}")
            runners[name] = fn
        except Exception as e:
            results[name] = {"error": str(e)[:200], "iters_per_sec": 0.0}

    dispatch_s = measure_dispatch_latency()
    results["dispatch_latency_ms"] = round(dispatch_s * 1e3, 2)
    timed = time_interleaved(runners, rounds=4, dispatch_s=dispatch_s)
    stream_gbps = None
    probe_rows = {}
    for name, (best_s, med_s) in timed.items():
        _, passes, nbytes, reps_n = spec[name]
        gbps = passes * m * n * nbytes * reps_n / best_s / 1e9
        entry = {
            "iters_per_sec": round(reps_n / best_s, 2),
            "achieved_gbps": round(gbps, 1),
            "frac_roofline": round(gbps / roofline, 4),
            # spread across the interleaved rounds: the honest error bar on
            # this shared chip (median/best - 1)
            "spread": round(med_s / best_s - 1, 4),
        }
        if name.startswith("stream"):
            probe_rows[name] = {"gbps": round(gbps, 1),
                                "spread": entry["spread"]}
        else:
            results[name] = entry
    if probe_rows:
        # the ceiling is the MAX over independent probes measured in this
        # same window: the pallas pipeline stream, the manual-DMA read, and
        # XLA's own reduce (r3 verdict #1 — one probe alone could be
        # probe-limited; three agreeing within spread is ceiling evidence;
        # the full tile/depth/width sweep lives in tools/ceiling_probe.py
        # + docs/PERFORMANCE.md)
        best_probe = max(probe_rows, key=lambda k: probe_rows[k]["gbps"])
        stream_gbps = probe_rows[best_probe]["gbps"]
        results["stream_ceiling"] = {
            "gbps": stream_gbps,
            "frac_nominal": round(stream_gbps / roofline, 4),
            "spread": probe_rows[best_probe]["spread"],
            "probe": best_probe,
            "probe_sweep": probe_rows,
        }
    # per-ITERATION speedups: the bf16 runner executes 2x the iterations to
    # equalize wall time, so raw wall ratios would understate it 2x
    def _s_per_iter(name):
        return timed[name][0] / spec[name][3]

    if "pd_fused" in results and "pd_xla" in timed and "pd_fused" in timed:
        results["pd_fused"]["speedup_vs_xla"] = round(
            _s_per_iter("pd_xla") / _s_per_iter("pd_fused"), 2)
    if "pd_fused_bf16" in results and "pd_fused_bf16" in timed and "pd_xla" in timed:
        results["pd_fused_bf16"]["speedup_vs_xla"] = round(
            _s_per_iter("pd_xla") / _s_per_iter("pd_fused_bf16"), 2)

    # headline metric: best FULL-f32 variant; bf16 storage stays in detail.
    # The metric NAME is pinned to the fused series regardless of which
    # variant won — a transient fused build failure must degrade the same
    # time series (like the outage payload does), not fork a new one;
    # detail.variant records what actually ran.
    best_name = max(("xla", "fused"), key=lambda k: results[k].get("iters_per_sec", 0.0))
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
        # subtract the measured relay dispatch latency like every
        # interleaved row above — at this ~10 ms solve scale an
        # uncorrected ~25 ms launch would understate the kernel 3x.
        # Floor at 1e-6, not 1e-9: in a light window the measured dispatch
        # latency can exceed this launch's actual latency and a 1e-9 floor
        # would report an absurd ~1e12 iters/s row (same fix as run_res)
        dt_r = max(dt_r - dispatch_s, 1e-6)
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
        # one launch each (the sequential loop's dispatches pipeline behind
        # the first); subtract the same measured latency as the other rows
        dt_bat = max(dt_bat - dispatch_s, 1e-9)
        dt_seq = max(dt_seq - dispatch_s, 1e-9)
        results["batched_regpath_16x4000x1000"] = {
            "batched_s": round(dt_bat, 4),
            "sequential_s": round(dt_seq, 4),
            "speedup": round(dt_seq / dt_bat, 2),
        }
    except Exception as e:
        results["batched_regpath_16x4000x1000"] = {"error": str(e)[:200]}

    # ---- bf16 honesty: time-to-residual (r3 verdict #5) ------------------
    # The per-iteration bf16 speedups above say nothing about SOLUTION time:
    # bf16 iterate/operand storage can inflate iterations-to-residual. This
    # measures wall-clock to a fixed residual (1e-4) for f32 vs bf16 storage
    # on the same 16384^2 lasso (fused engine) and on the reference-size
    # resident solve — iterations may differ; that is the point.
    try:
        def run_to_tol(a_mat, n_max=20_000):
            f_t = LeastSquares(a=a_mat, b=b, fused=True)

            def run():
                res = ap.adaptive_proxgrad(
                    x0, f=f_t, g=g, rule=ap.AdaPGMRule(gamma=gamma0),
                    tol=1e-4, maxit=n_max, history=False)
                return res.norm_res, res.numit

            dt_s, out = time_solve(run, reps=2)
            dt_s = max(dt_s - dispatch_s, 1e-9)
            return {"secs": round(dt_s, 3), "numit": int(out[1]),
                    "final_res": float(out[0])}

        t32 = run_to_tol(a)
        tbf = run_to_tol(a_bf16)
        ttr = {"target_res": 1e-4, "fused_f32": t32, "fused_bf16": tbf}
        if t32["secs"] > 0:
            ttr["bf16_solution_time_speedup"] = round(
                t32["secs"] / max(tbf["secs"], 1e-9), 2)

        from adaprox_tpu.ops.resident import resident_adapgm_l1 as _res_l1

        prob_t = random_lasso(m=4000, n=1000, pfactor=10, seed=0)
        a_t32 = jnp.asarray(np.pad(prob_t.a, ((0, 96), (0, 24))), dtype)
        b_t = jnp.asarray(np.pad(prob_t.b, (0, 96)), dtype)
        lf_t = float(np.linalg.norm(prob_t.a, 2) ** 2)

        def run_res(a_mat):
            def run():
                x_r, numit, nres, conv = _res_l1(
                    a_mat, b_t, jnp.zeros(1024, dtype), 1 / lf_t, 1.0,
                    1e-4, 20_000)
                return nres, numit

            dt_s, out = time_solve(run, reps=2)
            # the resident solve is a few ms — in a light window the
            # measured dispatch latency can exceed this launch's actual
            # latency, and 4-decimal rounding floored the row to 0.0
            # (silently dropping the speedup field); keep microsecond
            # resolution and a sane floor
            dt_s = max(dt_s - dispatch_s, 1e-6)
            return {"secs": round(dt_s, 6), "numit": int(out[1]),
                    "final_res": float(out[0])}

        ttr["resident_f32"] = run_res(a_t32)
        ttr["resident_bf16"] = run_res(a_t32.astype(jnp.bfloat16))
        ttr["resident_bf16_solution_time_speedup"] = round(
            ttr["resident_f32"]["secs"]
            / max(ttr["resident_bf16"]["secs"], 1e-9), 2)
        results["time_to_res"] = ttr
    except Exception as e:
        results["time_to_res"] = {"error": str(e)[:200]}

    # ---- live-telemetry overhead (r5): plain history=False solve vs the
    # --live chunked solve on the SAME problem, back-to-back (the full
    # multi-config A/B lives in tools/live_ab_probe.py; this row keeps the
    # headline number in the bench artifact)
    try:
        from adaprox_tpu.utils.live import live_solve, logstep_boundaries

        f_live = LeastSquares(a=a, b=b, fused=True)
        # the overhead is ~10 ms of relay cost per echo boundary, so the
        # fraction only means something on a live-mode-scale solve (the
        # bench's default iters is a couple hundred — not the use case)
        live_iters = max(iters, 2000)

        def live_solve_fn(maxit, resume_state, it_cap):
            return ap.adaptive_proxgrad(
                x0, f=f_live, g=g, rule=ap.AdaPGMRule(gamma=gamma0),
                tol=0.0, maxit=maxit, resume_state=resume_state,
                it_cap=it_cap)

        def wall_plain():
            t0 = time.perf_counter()
            _sync(live_solve_fn(live_iters, None, None).norm_res)
            return time.perf_counter() - t0

        def wall_live():
            t0 = time.perf_counter()
            res_l, _ = live_solve(live_solve_fn, live_iters,
                                  method="AdaPGM", out=lambda s_: None)
            _sync(res_l.norm_res)
            return time.perf_counter() - t0

        wall_plain(); wall_live()  # compile + settle
        # interleaved best-of-2 (the bench's same-window policy): on this
        # shared chip back-to-back blocks drift and the overhead fraction
        # could come out negative or overstated
        pw = lw = float("inf")
        for _ in range(2):
            pw = min(pw, wall_plain())
            lw = min(lw, wall_live())
        results["live_telemetry"] = {
            "iters": live_iters,
            "plain_s": round(pw, 3), "live_s": round(lw, 3),
            "boundaries": len(logstep_boundaries(live_iters)),
            "overhead_frac": round((lw - pw) / max(pw, 1e-9), 4),
        }
    except Exception as e:
        results["live_telemetry"] = {"error": str(e)[:200]}

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
        "metric": f"lasso_adapgm_iters_per_sec_{m}x{n}_f32_fused",
        "value": best.get("iters_per_sec", 0.0),
        "unit": "iter/s",
        "vs_baseline": best.get("frac_roofline", 0.0),
        "variant": best_name,
        "roofline_gbps": roofline,
        "device": getattr(dev, "device_kind", str(dev)),
        "detail": results,
        "convergence_gap_f32": gap,
        "numit_to_1e-5": int(res.numit),
    }
    if stream_gbps and "achieved_gbps" in best:
        # fraction of the bandwidth this chip can actually deliver, measured
        # INTERLEAVED with the stream probe in the same window (best-of-N
        # round-robin; the nominal-roofline fraction stays in vs_baseline
        # for cross-round comparability). Reported unclamped: > 1.0 means
        # the solve loop out-streamed the probe within measurement spread.
        payload["frac_attainable"] = round(best["achieved_gbps"] / stream_gbps, 4)
        payload["calibration"] = "interleaved best-of-4 (see time_interleaved)"
        if "pd_fused" in results and "achieved_gbps" in results.get("pd_fused", {}):
            payload["pd_vs_ls_same_window"] = round(
                results["pd_fused"]["achieved_gbps"] / best["achieved_gbps"], 4)
    if _PRINTED_ONCE.acquire(blocking=False):
        print(json.dumps(payload))


if __name__ == "__main__":
    sys.exit(main())
