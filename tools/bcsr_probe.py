"""Same-window on-chip probe for the BCSR kernels (VERDICT r2 item 6).

Interleaves, round-robin inside ONE process/window on the real chip:

  - the attainable-stream calibration kernel (hbm_read_reduce),
  - the dense matvec control (same padded shape, XLA dot),
  - the round-2 scalar-prefetch BCSR kernel (bcsr_matvec, 81 GB/s in r2),
  - the slab-streamed kernel (bcsr_matvec_slab) at several slab sizes,
  - the XLA gather+segment_sum fallback (bcsr_matvec_xla),

reporting best-of-N effective GB/s on STORED-tile bytes, plus the
sparse-vs-dense wall ratio (the user-visible figure of merit) and the
implied dense-crossover block density.

Measurement rules (CLAUDE.md): K reps inside one jitted lax.fori_loop with
a carry dependence through x; big arrays passed as jit ARGUMENTS; float()
per measurement to force the device->host sync; only same-window ratios
are trusted on this shared chip.

Usage: python tools/bcsr_probe.py [--m 8192] [--n 16384] [--density 0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8192)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--density", type=float, default=0.1)
    p.add_argument("--bm", type=int, default=64)
    p.add_argument("--bn", type=int, default=1024)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    import jax

    from tools._probe_common import make_timed_loop, setup_jax_cache

    setup_jax_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from adaprox_tpu.ops import bcsr, kernels

    m, n, K = args.m, args.n, args.reps
    bm, bn = args.bm, args.bn
    rng = np.random.default_rng(0)
    nbr, nbc = m // bm, n // bn
    mask = rng.random((nbr, nbc)) < args.density
    dense = np.zeros((m, n), np.float32)
    for i, c in zip(*np.nonzero(mask)):
        dense[i * bm:(i + 1) * bm, c * bn:(c + 1) * bn] = rng.standard_normal(
            (bm, bn), np.float32)

    vals, cols, rowptr, _ = bcsr.bcsr_from_dense(dense, bm=bm, bn=bn)
    rows = np.repeat(np.arange(nbr, dtype=np.int32), np.diff(rowptr))
    max_bpr = int(np.diff(rowptr).max())
    nnzb = vals.shape[0]
    stored_bytes = nnzb * bm * bn * 4
    dense_bytes = m * n * 4
    print(json.dumps({"probe": "setup", "nnzb": int(nnzb),
                      "block_density": round(nnzb / (nbr * nbc), 4),
                      "stored_mb": round(stored_bytes / 2**20, 1),
                      "max_bpr": max_bpr}), flush=True)

    a_dev = jnp.asarray(dense)
    vals_d = jnp.asarray(vals)
    cols_d = jnp.asarray(cols)
    rowptr_d = jnp.asarray(rowptr)
    rows_d = jnp.asarray(rows)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3)

    timed_loop = make_timed_loop(jax, jnp, K)

    runners = {}
    runners["stream_1gb"] = (
        lambda c, a: kernels.hbm_read_reduce(a, scale=1.0 + 1e-30 * c,
                                             block_rows=256),
        (a_dev,), dense_bytes)
    runners["dense_matvec"] = (
        lambda c, a, xx: jnp.sum(a @ (xx * (1.0 + 1e-30 * c))),
        (a_dev, x), dense_bytes)
    runners["bcsr_prefetch"] = (
        lambda c, v, co, rp, xx: jnp.sum(bcsr.bcsr_matvec(
            v, co, rp, max_bpr, xx * (1.0 + 1e-30 * c))),
        (vals_d, cols_d, rowptr_d, x), stored_bytes)
    for slab in (4, 8, 16, 32):
        runners[f"bcsr_slab{slab}"] = (
            lambda c, v, co, ro, xx, slab=slab: jnp.sum(bcsr.bcsr_matvec_slab(
                v, co, ro, nbr, xx * (1.0 + 1e-30 * c), slab=slab)),
            (vals_d, cols_d, rows_d, x), stored_bytes)
    runners["bcsr_xla"] = (
        lambda c, v, co, ro, xx: jnp.sum(bcsr.bcsr_matvec_xla(
            v, co, ro, xx * (1.0 + 1e-30 * c), nbr)),
        (vals_d, cols_d, rows_d, x), stored_bytes)

    best = {k: float("inf") for k in runners}
    failed = set()
    for r in range(args.rounds):
        for name, (step, arrs, _) in runners.items():
            if name in failed:
                continue
            try:
                secs = timed_loop(step, *arrs)
            except Exception as e:  # noqa: BLE001 - report and continue
                # skip only THIS runner's future rounds: a transient error
                # must not cost the other runners their round samples, and
                # any best already measured stays in the summary
                print(json.dumps({"probe": name, "error": str(e)[:200]}),
                      flush=True)
                failed.add(name)
                continue
            best[name] = min(best[name], secs)
        print(json.dumps({"round": r, **{
            k: round(v * 1e3, 3) for k, v in best.items()
            if v < float("inf")}}), flush=True)

    out = {}
    for name, (_, _, nbytes) in runners.items():
        secs = best[name]
        if secs == float("inf"):
            continue  # never measured successfully
        out[name] = {"ms": round(secs * 1e3, 3),
                     "gbps": round(nbytes / secs / 1e9, 1)}
    dense_ms = out.get("dense_matvec", {}).get("ms")
    slab_rows = [(v["ms"], k) for k, v in out.items() if "slab" in k]
    slab_best = min(slab_rows) if slab_rows else None
    # crossover: density where slab wall == dense wall (wall scales ~ bytes)
    crossover = None
    if dense_ms and slab_best:
        crossover = round(args.density * dense_ms / slab_best[0], 4)
    print(json.dumps({"probe": "summary", **out,
                      "best_slab": slab_best[1] if slab_best else None,
                      "speedup_vs_dense": round(dense_ms / slab_best[0], 2)
                      if dense_ms and slab_best else None,
                      "crossover_density": crossover}), flush=True)


if __name__ == "__main__":
    main()
