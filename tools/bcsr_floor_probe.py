"""Decompose the BCSR ~1 ms/invocation floor (round-4 roadmap item).

Round-3 measured every BCSR kernel variant (scalar-prefetch, slab DMA,
MXU-dot, XLA gather) sitting on a ~1 ms per-invocation floor that neither
DMA style nor index-map style moved by more than 25%. This probe asks WHAT
the floor is by varying ONE axis at a time, round-robin in one window:

  - full:        the real kernel at (bm, bn) blocks, density d  -> bytes B
  - tinyblocks:  same LOGICAL density but 8x128 blocks on a 1/64-scaled
                 matrix: ~the same block COUNT (structure traversal) with
                 1/64 the data. If its time ~ full's, the kernel is
                 traversal/launch-bound; if it drops ~64x, bytes-bound.
  - noop:        a Pallas kernel with the same grid count that only zeroes
                 its tile (pure Mosaic launch + grid stepping)
  - dense:       XLA dense matvec on the same shape (bandwidth control)
  - xla_gather:  the gather+segment_sum default path

Measurement rules (CLAUDE.md): K reps inside one jitted lax.fori_loop with
a carry dependence (x perturbed by 1e-30*c so nothing is hoisted), arrays
as jit ARGUMENTS, float() per measurement, best-of-R rounds round-robin —
only same-window ratios are meaningful on this shared chip.

Usage: python tools/bcsr_floor_probe.py [--m 8192] [--n 16384] [--density 0.1]
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
    if args.bm % 8 or args.bn % 128 or args.m % args.bm or args.n % args.bn:
        p.error("--bm must be a multiple of 8 dividing --m; --bn a multiple "
                "of 128 dividing --n (Mosaic tile quanta)")
    # the tinyblocks control scales bytes by (bm/8)*(bn/128) at matched
    # block count; with no real reduction its time ratio is an equal-bytes
    # control and the traversal-vs-bytes diagnosis below would be inverted
    byte_factor = (args.bm // 8) * (args.bn // 128)
    if byte_factor < 8:
        p.error(f"--bm/--bn give a tinyblocks byte reduction of only "
                f"1/{byte_factor}; need >= 8x for the diagnosis to separate "
                "traversal-bound from bytes-bound")

    import jax

    from tools._probe_common import make_timed_loop, setup_jax_cache

    setup_jax_cache(jax)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from adaprox_tpu.ops import bcsr

    m, n, K = args.m, args.n, args.reps
    bm, bn = args.bm, args.bn
    rng = np.random.default_rng(0)

    def build(mm, nn, bbm, bbn):
        nbr_, nbc_ = mm // bbm, nn // bbn
        mask = rng.random((nbr_, nbc_)) < args.density
        dense = np.zeros((mm, nn), np.float32)
        for i, c in zip(*np.nonzero(mask)):
            dense[i*bbm:(i+1)*bbm, c*bbn:(c+1)*bbn] = (
                rng.standard_normal((bbm, bbn)).astype(np.float32))
        vals_, cols_, rowptr_, _shape = bcsr.bcsr_from_dense(
            dense, bm=bbm, bn=bbn)
        rows_ = np.repeat(np.arange(nbr_, dtype=np.int32),
                          np.diff(rowptr_))
        return ((vals_, cols_, rowptr_, rows_, int(np.diff(rowptr_).max())),
                dense, int(mask.sum()))

    (vals, cols, rowptr, rows, max_bpr), dense_np, nblk = build(m, n, bm, bn)
    # 1/byte_factor-bytes structure: 8x128 blocks on a scaled-down matrix
    # keeps the block-grid (and thus traversal steps) the same scale as
    # full's (byte_factor >= 8 validated at arg parse)
    m2, n2 = m // (bm // 8), n // (bn // 128)
    (vals2, cols2, rowptr2, rows2, max_bpr2), _, nblk2 = build(m2, n2, 8, 128)

    a_dev = jnp.asarray(dense_np)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3)
    x2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32) * 1e-3)
    vals_d, cols_d, rowptr_d, rows_d = (jnp.asarray(v) for v in
                                        (vals, cols, rowptr, rows))
    vals2_d, cols2_d, rowptr2_d, rows2_d = (jnp.asarray(v) for v in
                                            (vals2, cols2, rowptr2, rows2))

    nbr = m // bm

    def noop_kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:]

    def noop(xx):
        return pl.pallas_call(
            noop_kernel,
            grid=(nbr,),
            in_specs=[pl.BlockSpec((bm, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        )(jnp.broadcast_to(xx[:128], (m, 128)))

    timed_loop = make_timed_loop(jax, jnp, K)

    stored = nblk * bm * bn * 4
    stored2 = nblk2 * 8 * 128 * 4
    runners = {
        "full": (lambda c, v, co, rp, xx: jnp.sum(bcsr.bcsr_matvec(
            v, co, rp, max_bpr, xx * (1.0 + 1e-30 * c))),
            (vals_d, cols_d, rowptr_d, x), stored),
        "tinyblocks": (lambda c, v, co, rp, xx: jnp.sum(bcsr.bcsr_matvec(
            v, co, rp, max_bpr2, xx * (1.0 + 1e-30 * c))),
            (vals2_d, cols2_d, rowptr2_d, x2), stored2),
        "noop": (lambda c, xx: jnp.sum(noop(xx * (1.0 + 1e-30 * c))),
                 (x,), 0),
        "dense": (lambda c, a, xx: jnp.sum(a @ (xx * (1.0 + 1e-30 * c))),
                  (a_dev, x), m * n * 4),
        "xla_gather": (lambda c, v, co, ro, xx: jnp.sum(bcsr.bcsr_matvec_xla(
            v, co, ro, xx * (1.0 + 1e-30 * c), nbr)),
            (vals_d, cols_d, rows_d, x), stored),
    }

    best = {k: float("inf") for k in runners}
    for rnd in range(args.rounds):
        for name, (step, arrs, _) in runners.items():
            best[name] = min(best[name], timed_loop(step, *arrs))
    out = {}
    for name, (_, _, nbytes) in runners.items():
        ms = best[name] * 1e3
        gbs = nbytes / best[name] / 1e9 if nbytes else 0.0
        out[name] = {"ms_per_inv": round(ms, 4), "eff_gbs": round(gbs, 1)}
        print(f"{name:12s} best {ms:8.3f} ms/inv   {gbs:8.1f} GB/s stored")
    ratio = out["tinyblocks"]["ms_per_inv"] / out["full"]["ms_per_inv"]
    print(f"\nblock-count-matched 1/{byte_factor}-bytes time ratio: "
          f"{ratio:.2f} "
          f"({'traversal/launch-bound' if ratio > 0.6 else 'bytes-scaled'})")
    print(f"noop grid launch: {out['noop']['ms_per_inv']:.3f} ms "
          f"({out['noop']['ms_per_inv']/out['full']['ms_per_inv']:.2f} of full)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
