"""Out-of-HBM feasibility probe (VERDICT r4 next-round #3).

The reference's only scale axis is host RAM (dense Julia arrays,
src/AdaProx.jl:327,358); this framework's single-chip ceiling is HBM
(~16 GB on v5e). A >HBM dense problem would need a streaming LeastSquares
oracle: per iteration, re-stream A from host RAM to the chip in chunks,
double-buffering ``device_put`` against the on-chip fused compute.

This probe measures the host->HBM transfer bandwidth that design would
ride, three ways in one window:

  seq       chunk-at-a-time: device_put then consume (reduce) it, serial
  pipe2     two chunks in flight: enqueue device_put(i+1) BEFORE consuming
            chunk i (the streaming oracle's actual access pattern)
  putonly   pure device_put enqueue rate (no consume), upper bound

Go/no-go rule (VERDICT): the fused on-chip iteration streams A at
750-756 GB/s (proven ceiling). A streamed iteration is bounded by the
host->HBM rate, so slowdown >= 750 / host_gbps. If that is >= 10x, record
the no-go and stop; if < 10x, design the streaming oracle next.

NB on this backend the "device" sits behind the axon network relay —
device_put pays the tunnel. That IS the deployment topology being
benchmarked, and the number is recorded as such.

Usage: python tools/host_stream_probe.py [--chunk-mb 256] [--chunks 8]
       [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._probe_common import setup_jax_cache  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk-mb", type=int, default=256)
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    setup_jax_cache(jax)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    rows = args.chunk_mb * 1024 * 1024 // (4 * 1024)
    host_chunks = [np.random.default_rng(i).standard_normal(
        (rows, 1024)).astype(np.float32) for i in range(args.chunks)]
    gb = args.chunks * rows * 1024 * 4 / 1e9

    @jax.jit
    def consume(a, c):
        # a structured reduce (the cheapest full consumption of the chunk)
        return c + jnp.sum(a[:, :128], axis=0)[0] * 1e-30 + jnp.sum(a) * 1e-30

    # warm: compile + first-dispatch relay session establishment
    w = jax.device_put(host_chunks[0], dev)
    float(consume(w, jnp.float32(0.0)))
    del w

    results = {}

    def record(name, secs):
        best = results.get(name, float("inf"))
        results[name] = min(best, secs)
        print(json.dumps({"mode": name, "secs": round(secs, 3),
                          "host_gbps": round(gb / secs, 2)}), flush=True)

    for _ in range(args.rounds):
        # --- seq: put, consume, SYNC, repeat (truly serial baseline —
        # without the per-chunk sync both loops enqueue identical async
        # schedules and the seq/pipe2 distinction measures nothing) -------
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for h in host_chunks:
            a = jax.device_put(h, dev)
            c = consume(a, c)
            float(c)  # host sync per chunk
        record("seq", time.perf_counter() - t0)

        # --- pipe2: next put enqueued before consuming current ----------
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        cur = jax.device_put(host_chunks[0], dev)
        for i in range(1, args.chunks + 1):
            nxt = (jax.device_put(host_chunks[i], dev)
                   if i < args.chunks else None)
            c = consume(cur, c)
            cur = nxt
        float(c)
        record("pipe2", time.perf_counter() - t0)

        # --- putonly: enqueue all, sync once -----------------------------
        t0 = time.perf_counter()
        bufs = [jax.device_put(h, dev) for h in host_chunks]
        for bbuf in bufs:
            bbuf.block_until_ready()
        # forced element transfer per CLAUDE.md timing rule
        float(bufs[-1][0, 0])
        record("putonly", time.perf_counter() - t0)
        del bufs

    on_chip = 750.0  # proven attainable read ceiling (ceiling_probe r4)
    best = max(gb / s for s in results.values())
    verdict = {
        "gb_per_round": round(gb, 2),
        "best_host_gbps": round(best, 2),
        "streamed_iteration_slowdown_vs_fused": round(on_chip / best, 1),
        "go": bool(on_chip / best < 10.0),
        "modes": {k: round(gb / v, 2) for k, v in results.items()},
        "stamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps({"verdict": verdict}), flush=True)


if __name__ == "__main__":
    main()
