"""Lasso experiment (reference experiments/lasso/runme.jl).

Synthetic problem with a known optimum by construction (runme.jl:45-77);
runs fixed PG, backtracking PG (xi in {1, 1.5, 2}), fixed + backtracking
Nesterov, AdaPGM-MM, AdaPGM-Ours, and aGRAAL; sizes (m, n, pfactor) in
{(100,300,10), (500,1000,10), (4000,1000,10)}, maxit 2000, tol 1e-7
(runme.jl:191-211). Plot: F(x_k) - F* vs (grad_f_evals + f_evals).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .common import Sink, group_rows, pick_platform, plot_lines


def run_random_lasso(m, n, pfactor, sink, tol=1e-7, maxit=2000, seed=0, dtype=None):
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    prob = random_lasso(m=m, n=n, pfactor=pfactor, seed=seed, lam=1.0)
    dtype = dtype or jnp.asarray(prob.a).dtype
    a = jnp.asarray(prob.a, dtype)
    b = jnp.asarray(prob.b, dtype)
    f = LeastSquares(a=a, b=b)
    g = ap.L1Norm(lam=jnp.asarray(prob.lam, dtype))

    # pseudo-record with the analytic optimum (runme.jl:79)
    sink.emit_pseudo({"method": None, "it": 1, "objective": prob.optimum})

    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    gam = 1.0 / lf
    x0 = jnp.zeros(n, dtype)
    kw = dict(f=f, g=g, tol=tol, maxit=maxit, history=True)

    sink.add(ap.fixed_proxgrad(x0, gamma=gam, name="PGM (fixed)", **kw))
    for xi in (1.0, 1.5, 2.0):
        sink.add(ap.backtracking_proxgrad(
            x0, gamma0=gam, xi=xi, name=f"PGM (backtracking)-(xi={xi})", **kw))
    sink.add(ap.backtracking_nesterov(x0, gamma0=gam, name="Nesterov (backtracking)", **kw))
    sink.add(ap.fixed_nesterov(x0, gamma=gam, name="Nesterov (fixed)", **kw))
    sink.add(ap.adaptive_proxgrad(
        x0, rule=ap.MalitskyMishchenkoRule(gamma=gam), name="AdaPGM (MM)", **kw))
    sink.add(ap.adaptive_proxgrad(
        x0, rule=ap.AdaPGMRule(gamma=gam), name="AdaPGM (Ours)", **kw))
    sink.add(ap.agraal(x0, gamma0=gam, name="aGRAAL", **kw))
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
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    for spec in args.sizes.split(","):
        m, n, pf = (int(v) for v in spec.split("x"))
        path = os.path.join(args.outdir, f"lasso_{m}_{n}_{pf}.jsonl")
        sink = Sink(path)
        opt = run_random_lasso(m, n, pf, sink, tol=args.tol, maxit=args.maxit)
        print(f"{path}: optimum={opt:.8f}")
        if not args.no_plot:
            plot_convergence(path)


if __name__ == "__main__":
    main()
