"""Lasso experiment (reference experiments/lasso/runme.jl).

Synthetic problem with a known optimum by construction (runme.jl:45-77);
runs fixed PG, backtracking PG (xi in {1, 1.5, 2}), fixed + backtracking
Nesterov, AdaPGM-MM, AdaPGM-Ours, and aGRAAL; sizes (m, n, pfactor) in
{(100,300,10), (500,1000,10), (4000,1000,10)}, maxit 2000, tol 1e-7
(runme.jl:191-211). Plot: F(x_k) - F* vs (grad_f_evals + f_evals).

TPU fast paths (VERDICT r2 item 3 — the flagship kernels must drive the
reference grid, not just bench.py):

* ``--fused``:    every solver's LS oracle becomes the one-pass Pallas
                  kernel (ops.kernels.fused_ls_value_grad) on a zero-padded
                  tile-aligned A — trajectory-identical, ~2x HBM economy.
* ``--resident``: EVERY solver row (fixed PG/Nesterov, AdaPGM MM/Ours,
                  the three backtracking-xi variants, backtracking Nesterov,
                  and aGRAAL) runs as a whole-solve VMEM-resident kernel
                  with record-mode per-iteration histories
                  (ops.resident / ops.resident_bt) — same JSONL.

Per-method wall-clock is emitted as a ``wall_s`` meta row either way, so
RESULTS.md can carry a speedup column on the reference's own grid.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

import numpy as np

from .common import Sink, group_rows, pad_tiles, pick_platform, plot_lines, run_timed


def run_random_lasso(m, n, pfactor, sink, tol=1e-7, maxit=2000, seed=0, dtype=None,
                     fused=False, resident=False):
    import jax
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    prob = random_lasso(m=m, n=n, pfactor=pfactor, seed=seed, lam=1.0)
    dtype = dtype or jnp.asarray(prob.a).dtype
    a = jnp.asarray(prob.a, dtype)
    b = jnp.asarray(prob.b, dtype)
    if fused or resident:
        # tile alignment for the Pallas paths — exact (see pad_tiles)
        a, b = pad_tiles(a, b)
    n_run = a.shape[1]
    f = LeastSquares(a=a, b=b, fused=fused)
    lam = jnp.asarray(prob.lam, dtype)
    g = ap.L1Norm(lam=lam)

    # pseudo-record with the analytic optimum (runme.jl:79)
    sink.emit_pseudo({"method": None, "it": 1, "objective": prob.optimum})

    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    gam = 1.0 / lf
    x0 = jnp.zeros(n_run, dtype)
    kw = dict(f=f, g=g, tol=tol, maxit=maxit, history=True)
    times = {}

    from adaprox_tpu.ops.resident import resident_adapgm, resident_records, resident_supported
    from adaprox_tpu.ops.resident_bt import (
        resident_agraal, resident_agraal_records, resident_backtracking,
        resident_bt_records)

    use_resident = resident and resident_supported(a)
    if resident and not use_resident:
        print(f"  [resident] unsupported shape/size {tuple(a.shape)} "
              f"({a.dtype}); falling back to the engine")
    interp = jax.default_backend() not in ("tpu", "axon")

    def add(name, fn):
        sink.add(run_timed(times, name, fn))

    def add_resident(name, rule_kind, momentum=False):
        def solve():
            x, numit, nres, conv, hg, hr, ho = resident_adapgm(
                a, b, x0, gam, tol, maxit, prox_kind="l1", p1=float(lam),
                rule_kind=rule_kind, momentum=momentum, record=True,
                interpret=interp)
            recs = resident_records(numit, hg, hr, ho, maxit=maxit,
                                    momentum=momentum)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name, solve))

    def add_resident_bt(name, xi=1.0, nesterov=False):
        def solve():
            x, numit, nres, conv, lsf, hg, hr, ho, ht = \
                resident_backtracking(
                    a, b, x0, gam, tol, maxit, xi=xi, nesterov=nesterov,
                    prox_kind="l1", p1=float(lam), record=True,
                    interpret=interp)
            recs = resident_bt_records(numit, hg, hr, ho, ht, maxit=maxit,
                                       nesterov=nesterov)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name, solve))

    def add_resident_agraal(name):
        # the engine's default companion point: x1 + PRNGKey(0) noise at the
        # UNPADDED width, zero-padded — padded coordinates then stay exactly
        # 0 (zero A-columns + l1 shrink), so this row reproduces the
        # unpadded engine/reference trajectory
        noise = jax.random.normal(jax.random.PRNGKey(0), (n,), x0.dtype)
        x0p = x0.at[:n].add(noise)

        def solve():
            x, numit, nres, conv, hg, hr, ho = resident_agraal(
                a, b, x0, x0p, gam, tol, maxit, prox_kind="l1",
                p1=float(lam), record=True, interpret=interp)
            recs = resident_agraal_records(numit, hg, hr, ho, maxit=maxit)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name, solve))

    if use_resident:
        add_resident("PGM (fixed)", "fixed")
        for xi in (1.0, 1.5, 2.0):
            add_resident_bt(f"PGM (backtracking)-(xi={xi})", xi=xi)
        add_resident_bt("Nesterov (backtracking)", nesterov=True)
        add_resident("Nesterov (fixed)", "fixed", momentum=True)
        add_resident("AdaPGM (MM)", "mm")
        add_resident("AdaPGM (Ours)", "adapgm")
        add_resident_agraal("aGRAAL")
    else:
        add("PGM (fixed)", lambda: ap.fixed_proxgrad(x0, gamma=gam, name="PGM (fixed)", **kw))
        for xi in (1.0, 1.5, 2.0):
            add(f"PGM (backtracking)-(xi={xi})",
                lambda xi=xi: ap.backtracking_proxgrad(
                    x0, gamma0=gam, xi=xi, name=f"PGM (backtracking)-(xi={xi})", **kw))
        add("Nesterov (backtracking)",
            lambda: ap.backtracking_nesterov(x0, gamma0=gam, name="Nesterov (backtracking)", **kw))
        add("Nesterov (fixed)", lambda: ap.fixed_nesterov(x0, gamma=gam, name="Nesterov (fixed)", **kw))
        add("AdaPGM (MM)", lambda: ap.adaptive_proxgrad(
            x0, rule=ap.MalitskyMishchenkoRule(gamma=gam), name="AdaPGM (MM)", **kw))
        add("AdaPGM (Ours)", lambda: ap.adaptive_proxgrad(
            x0, rule=ap.AdaPGMRule(gamma=gam), name="AdaPGM (Ours)", **kw))
        add("aGRAAL", lambda: ap.agraal(x0, gamma0=gam, name="aGRAAL", **kw))
    # which timed methods actually took a fast path (the summarizer pairs
    # only these — engine-vs-engine rows are compile/co-tenancy noise)
    if fused:  # the fused oracle feeds EVERY engine method
        fast_methods = sorted(times)
    elif use_resident:
        fast_methods = sorted(times)  # every row is on-core now
    else:
        fast_methods = []
    sink.emit_meta(wall_s=times, fast_path=(
        "resident" if use_resident else "fused" if fused else "default"),
        fast_methods=fast_methods)
    return prob.optimum


def plot_convergence(path):
    from ..utils.logging import read_jsonl

    rows = read_jsonl(path)
    optimum = min(r["objective"] for r in rows if "objective" in r)
    groups = group_rows(rows)
    series = [
        (name, [r["grad_f_evals"] + r["f_evals"] for r in rs],
         [r["objective"] - optimum for r in rs])
        for name, rs in groups.items()
    ]
    return plot_lines(path, series, f"Lasso ({os.path.basename(path)})",
                      "calls to A, A'", "F(x_k) - F*")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="results/lasso")
    p.add_argument("--maxit", type=int, default=2000)
    p.add_argument("--tol", type=float, default=1e-7)
    p.add_argument("--sizes", default="100x300x10,500x1000x10,4000x1000x10")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="f64 on the accelerator (reference-regime parity)")
    p.add_argument("--fused", action="store_true",
                   help="one-pass fused LS oracle (Pallas) for every solver")
    p.add_argument("--resident", action="store_true",
                   help="whole-solve VMEM-resident kernels for the menu solvers")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    for spec in args.sizes.split(","):
        m, n, pf = (int(v) for v in spec.split("x"))
        path = os.path.join(args.outdir, f"lasso_{m}_{n}_{pf}.jsonl")
        sink = Sink(path)
        opt = run_random_lasso(m, n, pf, sink, tol=args.tol, maxit=args.maxit,
                               fused=args.fused, resident=args.resident)
        print(f"{path}: optimum={opt:.8f}")
        if not args.no_plot:
            plot_convergence(path)


if __name__ == "__main__":
    main()
