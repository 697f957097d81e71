"""Calibrate the HBM roofline and tune the fused kernels (VERDICT r1 item 2).

Measures, on the real chip:

  1. pure read-reduce stream bandwidth (ops.kernels.hbm_read_reduce) over a
     1 GB array at several row-tile sizes -> the ATTAINABLE ceiling;
  2. XLA's own reduce over the same array;
  3. the fused one-pass LS oracle at several block_rows -> pick the best;
  4. the fused PD primal-update kernel (ops.pd_kernels) vs its two-pass XLA
     equivalent.

Timing methodology: every kernel is repeated K times INSIDE one jitted
``lax.fori_loop`` (with a data dependence through the carry so nothing is
DCE'd) and the whole loop is timed with a forced device->host sync. A
single dispatched op on this remote backend carries ~25 ms of relay
latency — 10x the kernel itself at 1 GB — so single-dispatch timing
measures the relay, not the chip (this probe's first version did exactly
that).

Usage: python tools/roofline_probe.py [--m 16384] [--n 16384] [--reps 50]
Writes one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16384)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    import jax

    from tools._probe_common import setup_jax_cache

    setup_jax_cache(jax)
    import jax.numpy as jnp

    from adaprox_tpu.ops import kernels, pd_kernels
    from bench import chip_bandwidth_gbps

    m, n, K = args.m, args.n, args.reps
    dev = jax.devices()[0]
    nominal = chip_bandwidth_gbps(dev)
    nbytes = m * n * 4

    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 1e-3
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(3), (m,), jnp.float32)

    def timed_loop(step, timeit_reps=3, operand=None):
        """Local extension of tools/_probe_common.make_timed_loop (adds
        best-of-N and a per-step operand) — any fix to the shared
        methodology (carry form, sync rule) must be mirrored here.

        step: (operand, carry_scalar) -> scalar; K iterations inside ONE
        jit. The carry MUST feed a (cheap) input of the kernel each
        iteration — otherwise XLA hoists the loop-invariant call out of the
        fori_loop and the "measurement" is one execution amortized K times
        (this probe's second version read 2.6x the chip's roofline that
        way). ``operand`` is passed as the jit ARGUMENT (closure capture of
        a 1 GB array ships it to the remote compiler; CLAUDE.md)."""
        operand = a if operand is None else operand

        @jax.jit
        def loop(op):
            return jax.lax.fori_loop(
                0, K, lambda i, c: c * 1e-30 + step(op, c), jnp.float32(0.0))

        float(loop(operand))  # compile + settle
        best = float("inf")
        for _ in range(timeit_reps):
            t0 = time.perf_counter()
            out = loop(operand)
            float(out)
            best = min(best, time.perf_counter() - t0)
        return best / K

    def emit(name, secs, passes=1, extra=None):
        gbps = passes * nbytes / secs / 1e9
        row = {"probe": name, "ms_per_pass": round(secs * 1e3, 3),
               "gbps": round(gbps, 1), "frac_nominal": round(gbps / nominal, 4)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)
        return gbps

    # 1a. TRUE stream ceiling: K back-to-back passes inside ONE kernel
    # launch (grid repetition — no loop-carry serialization, no dispatch)
    best_stream = 0.0
    for tm in (64, 128, 256, 512):
        if m % tm or 2 * tm * n * 4 > 100 * 1024 * 1024:
            continue

        def one(a, c, tm=tm):
            return kernels.hbm_read_reduce(
                a, scale=1.0 + 1e-30 * c, block_rows=tm, repeats=K)

        @jax.jit
        def rep(a, one=one):
            return one(a, jnp.float32(0.0))

        float(rep(a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rep(a))
            best = min(best, time.perf_counter() - t0)
        best_stream = max(best_stream,
                          emit(f"stream_gridrep_tm{tm}", best / K))

    # 1b. the same kernel through a fori_loop (shows the loop-carry cost)
    for tm in (256,):
        secs = timed_loop(
            lambda a, c, tm=tm: kernels.hbm_read_reduce(
                a, scale=1.0 + 1e-30 * c, block_rows=tm))
        emit(f"stream_foriloop_tm{tm}", secs)

    # 2. XLA reduce (scalar multiply fuses into the reduce — no extra pass)
    secs = timed_loop(lambda a, c: jnp.sum(a * (1.0 + 1e-30 * c)))
    emit("stream_xla_sum", secs)

    # 3. fused LS oracle across block_rows
    best_fused = (0.0, None)
    for tm in (32, 64, 128, 256, 512):
        if m % tm or 2 * tm * n * 4 > 100 * 1024 * 1024:
            continue
        try:
            secs = timed_loop(
                lambda a, c, tm=tm: kernels.fused_ls_value_grad(
                    a, b, x * (1.0 + 1e-30 * c), block_rows=tm)[0])
            g = emit(f"fused_ls_tm{tm}", secs)
            if g > best_fused[0]:
                best_fused = (g, tm)
        except Exception as e:
            print(json.dumps({"probe": f"fused_ls_tm{tm}", "error": str(e)[:150]}),
                  flush=True)

    # XLA two-pass LS for reference (2 HBM passes; consume BOTH outputs —
    # returning only f lets XLA dead-code the pullback dot entirely)
    def xla_ls(a, c):
        f_v, grad = kernels.ls_value_grad_xla(a, b, x * (1.0 + 1e-30 * c))
        return f_v + grad[0]

    secs = timed_loop(xla_ls)
    emit("ls_xla_two_pass", secs, passes=2)

    # 4. fused PD kernel vs XLA two-pass. Both kernels take the TRANSPOSED
    # coupling matrix at (n, m) — materialized once, outside the timing
    # (the engine hoists it the same way via its at= argument).
    # NB: y must be loop-variant too, else XLA hoists the A'y dot out of
    # the loop and the "two-pass" comparison is really one pass
    at_mat = jax.block_until_ready(jnp.asarray(a.T))

    def pd_fused_step(at_op, c):
        out = pd_kernels.fused_pd_primal_update(
            at_op, y * (1.0 + 1e-30 * c), x, jnp.zeros_like(x), 1e-3, 0.01,
            0.0, prox_kind="l1")
        return out[0][0] + out[3][0]

    def pd_xla_step(at_op, c):
        out = pd_kernels.pd_primal_update_xla(
            at_op, y * (1.0 + 1e-30 * c), x, jnp.zeros_like(x), 1e-3, 0.01,
            0.0, prox_kind="l1")
        return out[0][0] + out[3][0]

    secs_f = timed_loop(pd_fused_step, operand=at_mat)
    emit("fused_pd_primal_update", secs_f)
    secs_x = timed_loop(pd_xla_step, operand=at_mat)
    emit("pd_xla_two_pass", secs_x, passes=2,
         extra={"fused_speedup": round(secs_x / secs_f, 3)})

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
