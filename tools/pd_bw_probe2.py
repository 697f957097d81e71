"""Probe 2: separate KERNEL cost from ENGINE cost in one interleaved window.

BENCH_r03 trial (light load, interleaved): ls engine 674 GB/s, pd engine
485, stream probe 374 (below everything). pd_bw_probe ran in a heavily
co-tenanted window (everything capped ~470) where ratios were compressed,
so it could not separate kernel from engine. This probe times, round-robin:

  - hbm_read_reduce at block_rows 64/128/256 (is the probe itself slow?)
  - bare fused LS kernel in a fori_loop      (kernel-only, no engine)
  - bare fused PD kernel in a fori_loop      (kernel-only, no engine)
  - the LS engine (adaptive_proxgrad, fused oracle)
  - the PD engine (fused_adaptive_primal_dual)

Usage: python tools/pd_bw_probe2.py [--iters 120]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--m", type=int, default=16384)
    ap_.add_argument("--n", type=int, default=16384)
    ap_.add_argument("--iters", type=int, default=120)
    ap_.add_argument("--rounds", type=int, default=4)
    args = ap_.parse_args()

    import jax

    from tools._probe_common import setup_jax_cache

    setup_jax_cache(jax)

    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.ops.kernels import fused_ls_value_grad, hbm_read_reduce
    from adaprox_tpu.ops.pd_kernels import fused_pd_primal_update

    m, n, iters = args.m, args.n, args.iters
    dt = jnp.float32
    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), dt) / float(n) ** 0.5
    at = a.T
    b0 = jax.random.normal(jax.random.PRNGKey(4), (m,), dt)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (m,), dt)
    x0 = jnp.zeros(n, dt)
    g0 = jax.random.normal(jax.random.PRNGKey(3), (n,), dt)
    gb = m * n * 4 / 1e9

    @jax.jit
    def kern_ls(a_, b_, x_):
        def body(_, xx):
            f, grad = fused_ls_value_grad(a_, b_, xx)
            return 0.5 * xx + 1e-3 * grad
        return jax.lax.fori_loop(0, iters, body, x_)

    @jax.jit
    def kern_pd(at_, y_, x_, g_):
        def body(_, c):
            yy, xx = c
            aty, v, xn, axn = fused_pd_primal_update(at_, yy, xx, g_, 0.01, 0.7, 0.0)
            return (0.5 * yy + 1e-3 * axn, 0.5 * xx + 0.5 * xn)
        return jax.lax.fori_loop(0, iters, body, (y_, x_))

    g_l1 = ap.L1Norm(lam=jnp.asarray(0.01, dt))
    rule = ap.AdaPGMRule(gamma=jnp.asarray(1e-3, dt))
    f_ls = LeastSquares(a=a, b=b0, fused=True)

    def eng_ls():
        res = ap.adaptive_proxgrad(x0, f=f_ls, g=g_l1, rule=rule,
                                   tol=0.0, maxit=iters, history=False)
        return res.norm_res

    yv = jax.random.normal(jax.random.PRNGKey(5), (m,), dt)
    h = ap.Translate(inner=ap.L2Norm(lam=jnp.asarray(1.0, dt)), b=-yv)
    na = float(jnp.sqrt(jnp.sum(a * a)))
    rule_pd = ap.AdaPGMRule.make(t=1.0, norm_a=na)

    def eng_pd():
        res = ap.fused_adaptive_primal_dual(
            x0, jnp.zeros(m, dt), f=ap.ZeroSmooth(), g=g_l1, h=h, A=a,
            rule=rule_pd, tol=0.0, maxit=iters, history=False)
        return res.norm_res

    runners = {
        "stream_64": lambda: hbm_read_reduce(a, block_rows=64, repeats=iters),
        "stream_128": lambda: hbm_read_reduce(a, block_rows=128, repeats=iters),
        "stream_256": lambda: hbm_read_reduce(a, block_rows=256, repeats=iters),
        "kern_ls": lambda: kern_ls(a, b0, x0),
        "kern_pd": lambda: kern_pd(at, y0, x0, g0),
        "eng_ls": eng_ls,
        "eng_pd": eng_pd,
    }

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])

    for name, fn in runners.items():
        t0 = time.perf_counter()
        sync(fn())
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    times = {k: [] for k in runners}
    for _ in range(args.rounds):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            sync(fn())
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        best = min(ts)
        out[name] = {
            "gbps": round(iters * gb / best, 1),
            "ms_per_iter": round(best / iters * 1e3, 3),
            "spread": round(statistics.median(ts) / best - 1, 4),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
