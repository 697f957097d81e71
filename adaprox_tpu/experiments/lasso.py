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

from .common import (Sink, group_rows, pad_tiles, pick_platform,
                     plot_lines, route_menu_sweep, run_menu, run_timed)


def run_random_lasso(m, n, pfactor, sink, tol=1e-7, maxit=2000, seed=0, dtype=None,
                     fused=False, resident=False, live=False):
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
    times = {}

    from adaprox_tpu.ops.resident import resident_records, resident_supported
    from adaprox_tpu.ops.resident_bt import (
        resident_agraal, resident_agraal_records, resident_bt_records)

    use_resident = resident and resident_supported(a)
    if live and use_resident:
        print("  [live] resident kernels echo post-hoc; --live applies to "
              "the engine path only")
    if resident and not use_resident:
        print(f"  [resident] unsupported shape/size {tuple(a.shape)} "
              f"({a.dtype}); falling back to the engine")
    interp = jax.default_backend() not in ("tpu", "axon")

    def add(name, fn):
        sink.add(run_timed(times, name, fn))

    menu_path = "default"

    if use_resident:
        # THREE kernel launches for all nine method rows: the rule menu
        # (fixed PG/Nesterov, MM, Ours) as one dynamic-rule sweep, the four
        # backtracking rows as one dynamic-nesterov sweep, and aGRAAL —
        # per-row wall at these sizes is dominated by once-per-process
        # executable loads, so collapsing the menu into shared executables
        # is the win. wall_s carries per-row amortized shares + the grid
        # totals in grid_total_s.
        from adaprox_tpu.ops.resident import resident_rule_sweep, rule_rows
        from adaprox_tpu.ops.resident_bt import resident_bt_sweep

        from .common import sync_wall

        bt_names = [f"PGM (backtracking)-(xi={xi})" for xi in (1.0, 1.5, 2.0)]
        bt_rows = np.asarray([[gam, 1.0, 0.0], [gam, 1.5, 0.0],
                              [gam, 2.0, 0.0], [gam, 1.0, 1.0]])
        (xb, itb, _, _, _, bt_hists), bt_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_bt_sweep, a, b, x0, bt_rows, tol, maxit,
                prox_kind="l1", p1=float(lam), interpret=interp))

        rule_names = ["PGM (fixed)", "Nesterov (fixed)", "AdaPGM (MM)",
                      "AdaPGM (Ours)"]
        specs = [(gam, "fixed", False), (gam, "fixed", True),
                 (gam, "mm", False), (gam, "adapgm", False)]
        (xr, itr, _, _, rule_hists), rule_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_rule_sweep, a, b, x0,
                rule_rows(specs, tol=tol, maxit=maxit), tol, maxit,
                prox_kind="l1", p1=float(lam), interpret=interp))

        noise = jax.random.normal(jax.random.PRNGKey(0), (n,), x0.dtype)
        x0p = x0.at[:n].add(noise)
        (xa, ita, nra, conva, hga, hra, hoa), ag_wall = sync_wall(
            lambda: resident_agraal(
                a, b, x0, x0p, gam, tol, maxit, prox_kind="l1",
                p1=float(lam), record=True, interpret=interp))

        # emit rows in the reference order
        sink.add(SimpleNamespace(records=resident_records(
            itr[0], *(h[0] for h in rule_hists), maxit=maxit),
            name="PGM (fixed)", x=xr[0]))
        for j, name in enumerate(bt_names + ["Nesterov (backtracking)"]):
            sink.add(SimpleNamespace(records=resident_bt_records(
                itb[j], *(h[j] for h in bt_hists), maxit=maxit,
                nesterov=(j == 3)), name=name, x=xb[j]))
        for j, name in enumerate(rule_names[1:], start=1):
            sink.add(SimpleNamespace(records=resident_records(
                itr[j], *(h[j] for h in rule_hists), maxit=maxit,
                momentum=(name == "Nesterov (fixed)")), name=name, x=xr[j]))
        sink.add(SimpleNamespace(records=resident_agraal_records(
            ita, hga, hra, hoa, maxit=maxit), name="aGRAAL", x=xa))

        for name in bt_names + ["Nesterov (backtracking)"]:
            times[name] = round(bt_wall / 4, 4)
        for name in rule_names:
            times[name] = round(rule_wall / 4, 4)
        times["aGRAAL"] = round(ag_wall, 4)
        sink.emit_meta(grid_total_s={"bt sweep": round(bt_wall, 4),
                                     "rule sweep": round(rule_wall, 4)})
    else:
        # companion point noise only on the first n coordinates: under
        # --fused x0 is padded (n_run > n) and agraal's internal draw would
        # perturb the zero-padded coords (breaking pad-exactness AND the
        # default-path trajectory, whose draw is normal(key, (n,)))
        noise = jax.random.normal(jax.random.PRNGKey(0), (n,), x0.dtype)
        x0_ag = x0.at[:n].add(noise)
        base = dict(f=f, g=g, tol=tol)
        menu = [
            ("PGM (fixed)", maxit, lambda **o: ap.fixed_proxgrad(
                x0, gamma=gam, name="PGM (fixed)", **base, **o)),
        ] + [
            (f"PGM (backtracking)-(xi={xi})", maxit,
             lambda xi=xi, **o: ap.backtracking_proxgrad(
                 x0, gamma0=gam, xi=xi,
                 name=f"PGM (backtracking)-(xi={xi})", **base, **o))
            for xi in (1.0, 1.5, 2.0)
        ] + [
            ("Nesterov (backtracking)", maxit,
             lambda **o: ap.backtracking_nesterov(
                x0, gamma0=gam, name="Nesterov (backtracking)", **base, **o)),
            ("Nesterov (fixed)", maxit, lambda **o: ap.fixed_nesterov(
                x0, gamma=gam, name="Nesterov (fixed)", **base, **o)),
            ("AdaPGM (MM)", maxit, lambda **o: ap.adaptive_proxgrad(
                x0, rule=ap.MalitskyMishchenkoRule(gamma=gam),
                name="AdaPGM (MM)", **base, **o)),
            ("AdaPGM (Ours)", maxit, lambda **o: ap.adaptive_proxgrad(
                x0, rule=ap.AdaPGMRule(gamma=gam), name="AdaPGM (Ours)",
                **base, **o)),
            ("aGRAAL", maxit, lambda **o: ap.agraal(
                x0, x0=x0_ag, gamma0=gam, name="aGRAAL", **base, **o)),
        ]
        # the reference's in-flight console echo (emission inside the
        # loop at src/AdaProx.jl:351, log-decimated at
        # experiments/logging.jl:13-17) when --live; record solves
        # otherwise (common.run_menu — shared wiring + fast_path label)
        menu_path = run_menu(sink, times, menu, live=live,
                             objective=lambda x: f.value(x) + g(x))
    # which timed methods actually took a fast path (the summarizer pairs
    # only these — engine-vs-engine rows are compile/co-tenancy noise)
    if fused:  # the fused oracle feeds EVERY engine method
        fast_methods = sorted(times)
    elif use_resident:
        fast_methods = sorted(times)  # every row is on-core now
    else:
        fast_methods = []
    sink.emit_meta(wall_s=times, fast_path=(
        "resident" if use_resident else "fused" if fused else menu_path),
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
    p.add_argument("--live", action="store_true",
                   help="early-exit solves with in-flight log-spaced echo "
                        "(reference-style live telemetry; JSONL gets the "
                        "log-spaced rows)")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    for spec in args.sizes.split(","):
        m, n, pf = (int(v) for v in spec.split("x"))
        path = os.path.join(args.outdir, f"lasso_{m}_{n}_{pf}.jsonl")
        sink = Sink(path)
        opt = run_random_lasso(m, n, pf, sink, tol=args.tol, maxit=args.maxit,
                               fused=args.fused, resident=args.resident,
                               live=args.live)
        print(f"{path}: optimum={opt:.8f}")
        if not args.no_plot:
            plot_convergence(path)


if __name__ == "__main__":
    main()
