"""Same-window A/B on the fused LS kernel's last ~2% (VERDICT r4 #6).

The fused one-pass kernel sits at 0.979-0.982 of the PROVEN attainable
read ceiling (tools/ceiling_probe.py: 750-756 GB/s across 20 probes). The
residual gap is hypothesized to be compute/DMA overlap at tile
boundaries: each grid step accumulates into the SAME (1, n) grad block
and the SAME SMEM f scalar, a serial chain that could delay the next
step's compute behind the previous step's epilogue.

Variants, all computing identical (f, grad) and measured round-robin in
ONE window (only same-window ratios are meaningful on this co-tenant
chip):

  base       ops.kernels.fused_ls_value_grad (tm=64 default, r4 optimum)
  split      grad accumulated into a (2, n) VMEM scratch, even/odd grid
             steps touching DIFFERENT rows (halves the serial accumulator
             chain); merged on the last step
  fvec       f partials into a (1, 128) VMEM lane vector instead of the
             SMEM scalar (full-tile-to-SMEM reductions serialize in
             Mosaic; this one is only (tm, 1) -> scalar, but measure it)
  split+fvec both

Decision rule (VERDICT): promote a variant only if it wins >= 1% in its
own window; otherwise write the close-out in PERFORMANCE.md and stop
re-litigating the ceiling.

Usage: python tools/fused_epilogue_probe.py [--m 16384] [--n 16384]
       [--k 40] [--rounds 4] [--tm 64] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._probe_common import make_timed_loop, setup_jax_cache  # noqa: E402


def _variant_kernel(a_ref, x_ref, b_ref, f_ref, grad_ref, gacc_ref, facc_ref,
                    *, acc_dtype, split, fvec):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    a_tile = a_ref[:].astype(acc_dtype)
    res = jnp.sum(a_tile * x_ref[:], axis=1, keepdims=True) - b_ref[:]

    @pl.when(i == 0)
    def _():
        gacc_ref[:] = jnp.zeros_like(gacc_ref)
        if fvec:
            facc_ref[:] = jnp.zeros_like(facc_ref)
        else:
            f_ref[0, 0] = jnp.zeros((), acc_dtype)

    if fvec:
        # Mosaic rejects scalar stores to VMEM ("Cannot store scalars to
        # VMEM", measured on-chip; interpret mode allows them) — broadcast
        # the partial across the lane vector instead (every lane carries
        # the full running sum; the last step reads lane 0)
        facc_ref[:] = facc_ref[:] + 0.5 * jnp.sum(res * res)
    else:
        f_ref[0, 0] += 0.5 * jnp.sum(res * res)
    g = jnp.sum(a_tile * res, axis=0, keepdims=True)
    if split:
        @pl.when(i % 2 == 0)
        def _():
            gacc_ref[0:1, :] += g

        @pl.when(i % 2 == 1)
        def _():
            gacc_ref[1:2, :] += g
    else:
        gacc_ref[0:1, :] += g

    @pl.when(i == nsteps - 1)
    def _():
        grad_ref[:] = gacc_ref[0:1, :] + (gacc_ref[1:2, :] if split else 0.0)
        if fvec:
            # lane-0 read through a (1,1) slice reduce (scalar VMEM loads
            # share the store restriction)
            f_ref[0, 0] = jnp.sum(facc_ref[0:1, 0:1])


def make_variant(split, fvec, tm, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @functools.partial(jax.jit, static_argnames=())
    def run(a, b2, x2):
        m, n = a.shape
        acc = x2.dtype
        f_out, grad_out = pl.pallas_call(
            functools.partial(_variant_kernel, acc_dtype=acc, split=split,
                              fvec=fvec),
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((tm, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), acc),
                jax.ShapeDtypeStruct((1, n), acc),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, n), acc),
                pltpu.VMEM((1, 128), acc),
            ],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=4 * m * n, bytes_accessed=m * n * a.dtype.itemsize,
                transcendentals=0),
        )(a, x2, b2)
        return f_out[0, 0], grad_out[0]

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16384)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--k", type=int, default=40)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--tm", type=int, default=64)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    import jax

    setup_jax_cache(jax)
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from adaprox_tpu.ops.kernels import fused_ls_value_grad

    rng = np.random.default_rng(0)
    m, n = args.m, args.n
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b2 = b.reshape(m, 1)
    x2 = x.reshape(1, n)
    gb = m * n * 4 / 1e9

    variants = {
        "base": lambda a, b2, x2: fused_ls_value_grad(
            a, b2[:, 0], x2[0], block_rows=args.tm,
            interpret=args.interpret),
        "split": make_variant(True, False, args.tm, args.interpret),
        "fvec": make_variant(False, True, args.tm, args.interpret),
        "split+fvec": make_variant(True, True, args.tm, args.interpret),
    }

    # correctness first (every variant must produce the base's numbers)
    f0, g0 = variants["base"](a, b2, x2)
    for name, fn in variants.items():
        fv, gv = fn(a, b2, x2)
        err = float(jnp.max(jnp.abs(gv - g0)) / jnp.max(jnp.abs(g0)))
        ferr = abs(float(fv) - float(f0)) / abs(float(f0))
        print(json.dumps({"variant": name, "grad_rel_err": err,
                          "f_rel_err": ferr}), flush=True)
        assert err < 1e-6 and ferr < 1e-6, (name, err, ferr)
    if args.interpret:
        print(json.dumps({"note": "interpret mode: correctness only"}))
        return

    timed_loop = make_timed_loop(jax, jnp, args.k)

    def step_of(fn):
        def step(c, a, b2, x2):
            # the carry MUST feed the kernel's inputs: a loop-invariant
            # pallas_call gets hoisted out of the fori_loop and the
            # "measurement" is one execution amortized K times (first
            # version of this probe read 1740 GB/s — 2.3x the PROVEN
            # ceiling — exactly this hoist)
            f, g = fn(a, b2, x2 * (1.0 + c * 1e-30))
            return f * 1e-30 + g[0] * 1e-30 + c
        return step

    best = {name: float("inf") for name in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            s = timed_loop(step_of(fn), a, b2, x2)
            best[name] = min(best[name], s)
            print(json.dumps({"round": r, "variant": name,
                              "s_per_call": round(s, 6),
                              "gbps": round(gb / s, 1)}), flush=True)
    base = best["base"]
    out = {name: {"gbps": round(gb / s, 1),
                  "vs_base": round(base / s, 4)}
           for name, s in best.items()}
    print(json.dumps({"summary": out, "m": m, "n": n, "tm": args.tm,
                      "k": args.k, "rounds": args.rounds,
                      "stamp": time.strftime("%Y-%m-%d %H:%M:%S")}),
          flush=True)


if __name__ == "__main__":
    main()
