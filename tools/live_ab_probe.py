"""Same-window A/B: live telemetry overhead on an HBM-bound solve
(VERDICT r4 next-round #2 — the --live chunking must cost <1% throughput
at 16384^2).

Three walls, round-robin in one window (same compiled executables):

  plain       one uninterrupted history=False solve (it_cap=None)
  live_scan   live_solve with the history=True scan prefix covering the
              first two echo decades (one transfer for all early rows) +
              depth-4 pipelined while_loop chunks after — the production
              --live configuration
  live4       no scan prefix, pipeline depth 4
  live0       depth 0, no prefix (fully synchronous worst case)

tol=0 so every variant runs exactly --maxit iterations; the overhead
fraction is (live - plain)/plain on the best-of-rounds walls.

Usage: python tools/live_ab_probe.py [--size 16384] [--maxit 2000]
       [--rounds 3] [--fused] [--cpu]
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
    p.add_argument("--size", type=int, default=16384)
    p.add_argument("--maxit", type=int, default=2000)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--fused", action="store_true",
                   help="fused one-pass LS oracle (the flagship path)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    setup_jax_cache(jax)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.utils.live import live_solve, logstep_boundaries

    n = args.size
    rng = np.random.default_rng(0)
    # NB: big arrays as jit ARGUMENTS via the oracle pytree (closure
    # capture ships them to the remote compiler — CLAUDE.md)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    f = LeastSquares(a=a, b=b, fused=args.fused)
    g = ap.L1Norm(lam=1.0)
    # a cheap safe stepsize (power iteration would add a window-polluting
    # compile); the trajectory does not matter for the wall A/B
    lf = float(n) * 4.0
    rule = ap.AdaPGMRule.make(gamma=1.0 / lf)
    x0 = jnp.zeros(n, jnp.float32)

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=rule, tol=0.0, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    def obj(x):
        return f.value(x) + g(x)

    def wall_plain():
        t0 = time.perf_counter()
        res = solve(args.maxit, None, None)
        float(res.norm_res)
        return time.perf_counter() - t0

    def hist_solve(maxit):
        return ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=rule, tol=0.0, maxit=maxit, history=True)

    def wall_live(depth, scan=False):
        t0 = time.perf_counter()
        res, rows = live_solve(solve, args.maxit, method="AdaPGM",
                               objective=obj, out=lambda s: None,
                               pipeline=depth,
                               hist_solve_fn=hist_solve if scan else None)
        float(res.norm_res)
        assert len(rows) == len(logstep_boundaries(args.maxit))
        return time.perf_counter() - t0

    def wall_live_prefix(prefix):
        t0 = time.perf_counter()
        res, rows = live_solve(solve, args.maxit, method="AdaPGM",
                               objective=obj, out=lambda s: None,
                               pipeline=4, hist_solve_fn=hist_solve,
                               scan_prefix=prefix)
        float(res.norm_res)
        return time.perf_counter() - t0

    # compile + settle every executable before the timed window
    wall_plain()
    wall_live(4, scan=True)
    wall_live(4)
    if args.maxit >= 10000:
        wall_live_prefix(1000)

    best = {"plain": float("inf"), "live_scan": float("inf"),
            "live_scan1k": float("inf"),
            "live4": float("inf"), "live0": float("inf")}
    modes = [("plain", wall_plain),
             ("live_scan", lambda: wall_live(4, scan=True)),
             ("live4", lambda: wall_live(4)),
             ("live0", lambda: wall_live(0))]
    if args.maxit >= 10000:
        modes.insert(2, ("live_scan1k", lambda: wall_live_prefix(1000)))
    for r in range(args.rounds):
        for name, fn in modes:
            s = fn()
            best[name] = min(best[name], s)
            print(json.dumps({"round": r, "mode": name,
                              "wall_s": round(s, 3),
                              "it_per_s": round(args.maxit / s, 1)}),
                  flush=True)

    overhead = (best["live_scan"] - best["plain"]) / best["plain"]
    print(json.dumps({"summary": {
        "size": n, "maxit": args.maxit, "fused": bool(args.fused),
        "boundaries": len(logstep_boundaries(args.maxit)),
        "plain_s": round(best["plain"], 3),
        "live_scan_s": round(best["live_scan"], 3),
        "live_scan1k_s": (round(best["live_scan1k"], 3)
                          if best["live_scan1k"] < float("inf") else None),
        "scan1k_overhead_frac": (round(
            (best["live_scan1k"] - best["plain"]) / best["plain"], 4)
            if best["live_scan1k"] < float("inf") else None),
        "live4_s": round(best["live4"], 3),
        "live0_s": round(best["live0"], 3),
        "live_overhead_frac": round(overhead, 4),
        "nopfx_overhead_frac": round(
            (best["live4"] - best["plain"]) / best["plain"], 4),
        "depth0_overhead_frac": round(
            (best["live0"] - best["plain"]) / best["plain"], 4),
        "meets_1pct": bool(overhead < 0.01),
        "stamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }}), flush=True)


if __name__ == "__main__":
    main()
