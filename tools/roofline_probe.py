"""Calibrate the HBM roofline and tune the fused kernels (VERDICT r1 item 2).

Measures, on the real chip:

  1. pure read-reduce stream bandwidth (ops.kernels.hbm_read_reduce) over a
     1 GB array at several row-tile sizes -> the ATTAINABLE ceiling;
  2. XLA's own jnp.sum over the same array (what the compiler achieves);
  3. the fused one-pass LS oracle at several block_rows -> pick the best;
  4. the fused PD primal-update kernel (ops.pd_kernels) vs its two-pass XLA
     equivalent.

Usage: python tools/roofline_probe.py [--m 16384] [--n 16384]
Writes one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=5):
    fn()  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(out)  # force device->host
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16384)
    p.add_argument("--n", type=int, default=16384)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from adaprox_tpu.ops import kernels, pd_kernels
    from bench import chip_bandwidth_gbps

    m, n = args.m, args.n
    dev = jax.devices()[0]
    nominal = chip_bandwidth_gbps(dev)
    nbytes = m * n * 4

    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 1e-3
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(3), (m,), jnp.float32)

    def emit(name, secs, passes=1, extra=None):
        gbps = passes * nbytes / secs / 1e9
        row = {"probe": name, "secs": round(secs * 1e3, 3), "gbps": round(gbps, 1),
               "frac_nominal": round(gbps / nominal, 4)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)
        return gbps

    # 1. stream ceiling at several tiles
    best_stream = 0.0
    for tm in (64, 128, 256, 512, 1024):
        if m % tm:
            continue
        secs = timeit(lambda tm=tm: kernels.hbm_read_reduce(a, block_rows=tm))
        best_stream = max(best_stream, emit(f"stream_read_reduce_tm{tm}", secs))

    # 2. XLA reduce
    xla_sum = jax.jit(jnp.sum)
    secs = timeit(lambda: xla_sum(a))
    emit("stream_xla_sum", secs)

    # 3. fused LS oracle across block_rows
    best_fused = (0.0, None)
    for tm in (32, 64, 128, 256, 512):
        if m % tm:
            continue
        try:
            secs = timeit(
                lambda tm=tm: kernels.fused_ls_value_grad(a, b, x, block_rows=tm)[0])
            g = emit(f"fused_ls_tm{tm}", secs)
            if g > best_fused[0]:
                best_fused = (g, tm)
        except Exception as e:
            print(json.dumps({"probe": f"fused_ls_tm{tm}", "error": str(e)[:150]}),
                  flush=True)

    # 4. fused PD kernel vs XLA two-pass
    secs = timeit(lambda: pd_kernels.fused_pd_primal_update(
        a, y, x, jnp.zeros_like(x), 1e-3, 0.01, 0.0, prox_kind="l1")[3][0])
    pd_fused_gbps = emit("fused_pd_primal_update", secs)
    secs = timeit(lambda: pd_kernels.pd_primal_update_xla(
        a, y, x, jnp.zeros_like(x), 1e-3, 0.01, 0.0, prox_kind="l1")[3][0])
    emit("pd_xla_two_pass", secs, passes=2,
         extra={"fused_speedup": round(secs * pd_fused_gbps * 1e9 / (2 * nbytes), 3)})

    print(json.dumps({
        "probe": "summary",
        "stream_ceiling_gbps": round(best_stream, 1),
        "best_fused_ls_gbps": round(best_fused[0], 1),
        "best_fused_ls_tm": best_fused[1],
        "fused_vs_ceiling": round(best_fused[0] / best_stream, 4) if best_stream else None,
        "nominal_gbps": nominal,
    }), flush=True)


if __name__ == "__main__":
    main()
