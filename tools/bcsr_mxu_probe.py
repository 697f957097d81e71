"""BCSR bandwidth hunt, round 3b: is the bound the LANE REDUCTION?

Both shipped kernels (scalar-prefetch and slab-streamed) measured ~55 GB/s
on stored tiles in the same window where the dense stream ran 352-360 and
even XLA's gather+segment_sum did 62 (tools/bcsr_probe.py). The per-tile
work is `jnp.sum(tile * x, axis=1)` — a cross-lane reduce over 1024 lanes
per (64, 1024) tile. This probe tests MXU formulations (the systolic array
does the lane contraction natively) against the VPU reduce, same-window:

  - vpu:        shipped slab kernel (control)
  - mxu_tile:   slab kernel, per-tile dot_general (64,1024)x(1024,1)
  - mxu_batch:  slab kernel, ONE batched dot_general (k,64,1024)x(k,1024,1)

All with x/y VMEM-resident and per-slab contiguous DMA. f32,
precision=HIGHEST (the default MXU path is bf16 — ops/kernels.py measured
2.6e-3 error; HIGHEST is full f32).

Usage: python tools/bcsr_mxu_probe.py
"""

from __future__ import annotations

import argparse
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    nnzb = vals.shape[0]
    stored_bytes = nnzb * bm * bn * 4
    print(json.dumps({"probe": "setup", "nnzb": int(nnzb),
                      "stored_mb": round(stored_bytes / 2**20, 1)}), flush=True)

    # ---- kernel variants -------------------------------------------------
    def _mk_slab_kernel(mode, k):
        def kern(cols_ref, rows_ref, vals_ref, x_ref, y_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)

            if mode == "mxu_batch":
                xs = jnp.stack([x_ref[cols_ref[i * k + kk]][0]
                                for kk in range(k)])          # (k, bn)
                prod = jax.lax.dot_general(
                    vals_ref[:], xs[:, :, None],
                    (((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST)       # (k, bm, 1)
                for kk in range(k):
                    y_ref[rows_ref[i * k + kk]] += prod[kk]
            else:
                for kk in range(k):
                    f = i * k + kk
                    xt = x_ref[cols_ref[f]]                    # (1, bn)
                    tile = vals_ref[kk]
                    if mode == "mxu_tile":
                        contrib = jax.lax.dot_general(
                            tile, xt.T, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)  # (bm, 1)
                    else:  # vpu control
                        contrib = jnp.sum(tile * xt, axis=1, keepdims=True)
                    y_ref[rows_ref[f]] += contrib
        return kern

    @functools.partial(jax.jit, static_argnames=("mode", "slab"))
    def slab_mv(vals_d, cols_d, rows_d, x, mode, slab=8):
        nz, bm_, bn_ = vals_d.shape
        pad = (-nz) % slab
        if pad:
            vals_d = jnp.concatenate(
                [vals_d, jnp.zeros((pad, bm_, bn_), vals_d.dtype)])
            cols_d = jnp.concatenate([cols_d, jnp.zeros((pad,), cols_d.dtype)])
            rows_d = jnp.concatenate([rows_d, jnp.zeros((pad,), rows_d.dtype)])
        nsteps = (nz + pad) // slab
        x3 = x.reshape(-1, 1, bn_)
        y = pl.pallas_call(
            _mk_slab_kernel(mode, slab),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nsteps,),
                in_specs=[
                    pl.BlockSpec((slab, bm_, bn_), lambda i, *pref: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(x3.shape, lambda i, *pref: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((nbr, bm_, 1), lambda i, *pref: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nbr, bm_, 1), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(cols_d, rows_d, vals_d, x3)
        return y.reshape(-1)

    vals_d = jnp.asarray(vals)
    cols_d = jnp.asarray(cols)
    rows_d = jnp.asarray(rows)
    a_dev = jnp.asarray(dense)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3)

    # correctness check first (cheap, on-chip)
    want = np.asarray(a_dev @ x)
    for mode in ("vpu", "mxu_tile", "mxu_batch"):
        got = np.asarray(slab_mv(vals_d, cols_d, rows_d, x, mode))
        err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30))
        print(json.dumps({"check": mode, "rel_err": f"{err:.2e}"}), flush=True)

    timed_loop = make_timed_loop(jax, jnp, K)

    runners = {"stream_1gb": (
        lambda c, a: kernels.hbm_read_reduce(a, scale=1.0 + 1e-30 * c,
                                             block_rows=256), (a_dev,))}
    for mode in ("vpu", "mxu_tile", "mxu_batch"):
        for slab in (8, 32):
            runners[f"{mode}_s{slab}"] = (
                lambda c, v, co, ro, xx, mode=mode, slab=slab: jnp.sum(
                    slab_mv(v, co, ro, xx * (1.0 + 1e-30 * c), mode, slab)),
                (vals_d, cols_d, rows_d, x))

    best = {k: float("inf") for k in runners}
    for r in range(args.rounds):
        for name, (step, arrs) in list(runners.items()):
            try:
                best[name] = min(best[name], timed_loop(step, *arrs))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"probe": name, "error": str(e)[:160]}),
                      flush=True)
                del runners[name]
        print(json.dumps({"round": r, **{k: round(v * 1e3, 3)
                                         for k, v in best.items()
                                         if v < float("inf")}}), flush=True)

    out = {}
    # summarize from `best`, not `runners`: a transient error in a later
    # round deletes the runner, but any best already measured stays in the
    # summary (same fix as tools/bcsr_probe.py)
    for name, b in best.items():
        if b == float("inf"):
            continue
        nbytes = m * n * 4 if name == "stream_1gb" else stored_bytes
        out[name] = {"ms": round(b * 1e3, 3),
                     "gbps": round(nbytes / b / 1e9, 1)}
    print(json.dumps({"probe": "summary", **out}), flush=True)


if __name__ == "__main__":
    main()
