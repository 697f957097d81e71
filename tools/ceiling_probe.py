"""HBM ceiling-probe SUITE (r3 verdict #1): independent evidence for the
chip's true attainable stream bandwidth.

BENCH_r03 reports the fused LS kernel at 740.9 GB/s = 0.905 of the 819 GB/s
nominal roofline, defended by a single gridded read-reduce probe reading
752.9 (0.92 of nominal). This suite attacks the ceiling from every angle
available on this part, all timed ROUND-ROBIN in one window with the relay
dispatch latency subtracted (bench.time_interleaved):

  1. gridded read-reduce (hbm_read_reduce) at row tiles 64..1024 — the
     incumbent probe, double-buffered by the Pallas pipeline;
  2. pure manual-DMA read (hbm_dma_read) at depths 2/3/4 and several chunk
     sizes — NO pipeline machinery, no per-tile reduction: if deeper
     buffering or bigger chunks could beat the pipeline, this shows it;
  3. bf16 read-reduce over the same BYTE count — element width effect;
  4. read+write copy streams: Pallas gridded copy and the XLA copy loop —
     the combined R+W ceiling (2 passes per repeat);
  5. XLA's own reduce (jnp.sum) — the compiler's best single-pass read.

Outcome A: some probe exceeds the incumbent -> the ceiling was
probe-limited; retune the fused kernels toward the new number.
Outcome B: nothing beats it after this sweep -> "0.92 of nominal is this
part's measured streaming maximum" is defensible, and frac_attainable is
the honest roofline fraction.

Usage: python tools/ceiling_probe.py [--m 16384] [--n 16384] [--reps 120]
       [--rounds 4] [--quick]
One JSON line per probe + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runners(jnp, jax, kernels, a, a_bf16, reps):
    """name -> (runner, bytes_per_rep). Every runner is loop-carry clean:
    repeats happen INSIDE one launch (grid repetition or in-kernel fori),
    so there is no per-pass dispatch or loop-carry serialization."""
    m, n = a.shape
    f32_bytes = m * n * 4
    runners = {}

    for tm in (64, 128, 256, 512, 1024):
        if m % tm or 2 * tm * n * 4 > 100 * 1024 * 1024:
            continue
        runners[f"grid_reduce_tm{tm}"] = (
            (lambda tm=tm: kernels.hbm_read_reduce(
                a, block_rows=tm, repeats=reps)),
            f32_bytes,
        )

    for tm in (64, 128, 256, 512):
        for depth in (2, 3, 4):
            if m % tm or depth * tm * n * 4 > 100 * 1024 * 1024:
                continue
            runners[f"dma_read_tm{tm}_d{depth}"] = (
                (lambda tm=tm, depth=depth: kernels.hbm_dma_read(
                    a, chunk_rows=tm, depth=depth, repeats=reps)),
                f32_bytes,
            )

    # bf16 at the SAME byte count (2x the rows): element-width effect on
    # the read stream, and the honest ceiling for the bf16 storage mode
    if a_bf16 is not None:
        runners["grid_reduce_bf16_tm128"] = (
            lambda: kernels.hbm_read_reduce(a_bf16, block_rows=128,
                                            repeats=reps),
            a_bf16.shape[0] * a_bf16.shape[1] * 2,
        )

    # read+write streams: 2 passes per repeat. Fewer repeats (the copy
    # writes a full 1 GB output per pass — same wall target per runner).
    cw_reps = max(1, reps // 2)
    for tm in (128, 256):
        if m % tm:
            continue
        runners[f"pallas_copy_tm{tm}"] = (
            (lambda tm=tm: kernels.hbm_copy(
                a, block_rows=tm, repeats=cw_reps)),
            2 * f32_bytes,
        )
    # XLA copy loop: K iterations of arr -> arr * s (1 GB read + 1 GB write
    # each); the scalar read arr[0,0] forces the chain. NB `a` MUST be a jit
    # ARGUMENT — closure capture of a 1 GB array ships it to the remote
    # compiler and wedges the compile for tens of minutes (CLAUDE.md; this
    # probe's first version did exactly that and timed out at 50 min)
    @jax.jit
    def xla_copy(a_arg):
        def body(i, arr):
            return arr * (1.0 + 1e-30 * arr[0, 0])
        return jax.lax.fori_loop(0, cw_reps, body, a_arg)[0, 0]

    runners["xla_copy_loop"] = (lambda: xla_copy(a), 2 * f32_bytes)

    # XLA single-pass reduce, repeats inside one fori_loop with carry
    @jax.jit
    def xla_sum(a_arg):
        return jax.lax.fori_loop(
            0, reps,
            lambda i, c: c * 1e-30 + jnp.sum(a_arg * (1.0 + 1e-30 * c)),
            jnp.float32(0.0))

    runners["xla_sum_loop"] = (lambda: xla_sum(a), f32_bytes)

    # copy runners stream 2 passes per rep and run cw_reps reps (their
    # byte counts were already constructed as 2 * f32_bytes above)
    reps_map = {name: (cw_reps if "copy" in name else reps)
                for name in runners}
    return runners, reps_map


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16384)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--reps", type=int, default=120)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--quick", action="store_true",
                   help="subset: one config per family (fast sanity run)")
    args = p.parse_args()

    import jax

    from tools._probe_common import setup_jax_cache

    setup_jax_cache(jax)
    import jax.numpy as jnp

    from adaprox_tpu.ops import kernels
    from bench import chip_bandwidth_gbps, measure_dispatch_latency, \
        time_interleaved

    m, n, reps = args.m, args.n, args.reps
    dev = jax.devices()[0]
    nominal = chip_bandwidth_gbps(dev)

    a = jax.random.normal(jax.random.PRNGKey(0), (m, n), jnp.float32)
    a_bf16 = jax.random.normal(
        jax.random.PRNGKey(1), (2 * m, n), jnp.bfloat16)

    runners, reps_map = build_runners(jnp, jax, kernels, a, a_bf16, reps)
    if args.quick:
        keep = ("grid_reduce_tm128", "dma_read_tm128_d3", "pallas_copy_tm128",
                "xla_sum_loop", "grid_reduce_bf16_tm128")
        runners = {k: v for k, v in runners.items() if k in keep}

    import time as _time

    live = {}
    for name, (fn, nbytes) in runners.items():
        t0 = _time.perf_counter()
        try:
            out = fn()
            float(jnp.asarray(out).ravel()[0])
            live[name] = (fn, nbytes)
            print(json.dumps({"probe": name, "compile_s":
                              round(_time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)

    dispatch_s = measure_dispatch_latency()
    print(json.dumps({"probe": "dispatch_latency_ms",
                      "value": round(dispatch_s * 1e3, 2)}), flush=True)
    timed = time_interleaved({k: v[0] for k, v in live.items()},
                             rounds=args.rounds, dispatch_s=dispatch_s)

    best = (0.0, None)
    rows = []
    for name, (best_s, med_s) in sorted(timed.items()):
        nbytes = live[name][1]
        k = reps_map[name]
        gbps = nbytes * k / best_s / 1e9
        row = {"probe": name, "gbps": round(gbps, 1),
               "frac_nominal": round(gbps / nominal, 4),
               "ms_per_pass": round(best_s / k * 1e3, 3),
               "spread": round(med_s / best_s - 1, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if gbps > best[0]:
            best = (gbps, name)

    print(json.dumps({
        "probe": "summary",
        "ceiling_gbps": round(best[0], 1),
        "ceiling_probe": best[1],
        "frac_nominal": round(best[0] / nominal, 4),
        "nominal_gbps": nominal,
        "n_probes": len(rows),
    }), flush=True)


if __name__ == "__main__":
    main()
