"""Same-window A/B probe for the fused PD kernel variants (round 3).

Times, inside ONE process/window on the real chip:
  - the attainable-stream calibration kernel (hbm_read_reduce),
  - the fused LS kernel (the 648 GB/s control from BENCH_r02),
  - the shipping fused PD kernel at several tile sizes,
  - the resident-vector MXU variant (tools/pd_kernel_variants.py),
interleaved K rounds, reporting best-of for each. Only same-window ratios
are meaningful on this shared chip (CLAUDE.md).

Measurement rules (CLAUDE.md, learned the hard way): K reps inside one
jitted lax.fori_loop with a carry dependence; the 1 GB matrix passed as a
jit ARGUMENT (closure capture wedges the remote compiler); float() per
measurement to force the device->host sync.

Usage:  python tools/pd_bw_probe.py [--m 16384] [--n 16384] [--reps 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--m", type=int, default=16384)
    ap_.add_argument("--n", type=int, default=16384)
    ap_.add_argument("--reps", type=int, default=40)
    ap_.add_argument("--rounds", type=int, default=3)
    args = ap_.parse_args()

    import jax

    from tools._probe_common import setup_jax_cache

    setup_jax_cache(jax)

    import jax.numpy as jnp

    from adaprox_tpu.ops.kernels import fused_ls_value_grad, hbm_read_reduce
    from adaprox_tpu.ops.pd_kernels import (fused_pd_primal_update,
                                            pd_primal_update_xla)
    from tools.pd_kernel_variants import fused_pd_resident_mxu

    m, n, reps = args.m, args.n, args.reps
    dt = jnp.float32
    key = jax.random.PRNGKey(0)
    at = jax.random.normal(key, (n, m), dt) * (1.0 / float(n) ** 0.5)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (m,), dt)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (n,), dt)
    g0 = jax.random.normal(jax.random.PRNGKey(3), (n,), dt)
    b0 = jax.random.normal(jax.random.PRNGKey(4), (m,), dt)
    gbytes = m * n * 4 / 1e9

    # ---- correctness gate for the new variant (vs highest-precision XLA)
    ref = pd_primal_update_xla(at[:512, :512], y0[:512], x0[:512], g0[:512],
                               0.01, 0.7, 0.0)
    got = fused_pd_resident_mxu(at[:512, :512], y0[:512], x0[:512], g0[:512],
                                0.01, 0.7, 0.0)
    import numpy as np
    errs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(ref, got)]
    print(f"resident_mxu max-abs err vs XLA-highest (512^2): {errs}")
    # the gate must GATE: the docstring promises the winner gets folded into
    # ops/pd_kernels.py, and wrong math is often faster — abort rather than
    # post a promotion-candidate number for a numerically broken variant
    if max(errs) > 1e-4:
        raise SystemExit(
            f"fused_pd_resident_mxu fails the correctness gate (max err "
            f"{max(errs):.3e} > 1e-4) — not benchmarking a wrong kernel")

    # ---- looped runners: carry dependence through x (and y)
    def loop_pd(kernel_fn, **kw):
        @jax.jit
        def run(at_, y_, x_, g_):
            def body(_, c):
                yy, xx = c
                aty, v, xn, axn = kernel_fn(at_, yy, xx, g_, 0.01, 0.7, 0.0,
                                            **kw)
                # bounded feedback keeps values sane across reps
                return (0.5 * yy + 1e-3 * axn, 0.5 * xx + 0.5 * xn)
            return jax.lax.fori_loop(0, reps, body, (y_, x_))
        return run

    def loop_ls():
        @jax.jit
        def run(a_, b_, x_):
            def body(_, xx):
                f, grad = fused_ls_value_grad(a_, b_, xx)
                return 0.5 * xx + 1e-3 * grad
            return jax.lax.fori_loop(0, reps, body, x_)
        return run

    variants = {
        "stream": lambda: hbm_read_reduce(at, block_rows=128, repeats=reps),
        "ls_fused": lambda r=loop_ls(): r(at, x0, y0),  # (n, m) as the data
        "pd_cur_128": lambda r=loop_pd(fused_pd_primal_update,
                                       block_rows=128): r(at, y0, x0, g0),
        "pd_cur_64": lambda r=loop_pd(fused_pd_primal_update,
                                      block_rows=64): r(at, y0, x0, g0),
        "pd_cur_256": lambda r=loop_pd(fused_pd_primal_update,
                                       block_rows=256): r(at, y0, x0, g0),
        "pd_mxu_128": lambda r=loop_pd(fused_pd_resident_mxu,
                                       block_rows=128): r(at, y0, x0, g0),
        "pd_mxu_256": lambda r=loop_pd(fused_pd_resident_mxu,
                                       block_rows=256): r(at, y0, x0, g0),
    }

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])

    # compile everything first
    for name, fn in variants.items():
        t0 = time.perf_counter()
        sync(fn())
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    best = {k: float("inf") for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn())
            dt_s = time.perf_counter() - t0
            best[name] = min(best[name], dt_s)

    res = {name: round(reps * gbytes / t, 1) for name, t in best.items()}
    print(json.dumps({"gbps_best_of": res,
                      "ratio_pd_vs_ls": {k: round(res[k] / res["ls_fused"], 3)
                                         for k in res if k.startswith("pd")}},
                     indent=2))


if __name__ == "__main__":
    main()
