"""Nesterov worst-case quadratic experiment
(experiments/nesterov_worst_case/runme.jl).

WorstQuadratic(k, L) with known optimum (L/8)(1/(k+1) - 1) (runme.jl:53);
k = n = 100, L = 100, tol 1e-6, maxit 10_000. Sanity check that adaptive
methods degrade gracefully against accelerated ones. Plot: F - F* vs
grad_f_evals.
"""

from __future__ import annotations

import argparse
import os

from .common import (Sink, group_rows, pick_platform, plot_lines, run_menu,
                     route_menu_sweep, run_timed)


def run_nesterov_worst_case(sink, k=100, n=100, lip=100.0, tol=1e-6, live=False,
                            maxit=10_000, resident=False):
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import WorstQuadratic

    assert n >= k
    f = WorstQuadratic(k=k, lip=jnp.asarray(lip))
    g = ap.Zero()
    optimum = (lip / 8) * (1 / (k + 1) - 1)
    sink.emit_pseudo({"method": None, "it": 1, "objective": optimum})

    x0 = jnp.zeros(n)
    times = {}

    def add(name, fn):
        sink.add(run_timed(times, name, fn))

    if resident:
        # whole-solve on-core: the worst-case objective is the quadratic
        # f = 0.5 x'Qx + q'x with Q = (L/4) tridiag(-1,2,-1) on the first k
        # coordinates and q = -(L/4) e1 — exactly the resident cubic model
        # with c = 0 (dense Q at n ~ 100 is VMEM-trivial; padded
        # coordinates of Q/q are zero so they stay exactly 0)
        import numpy as np
        import jax
        from types import SimpleNamespace

        from adaprox_tpu.ops.resident import resident_records
        from adaprox_tpu.ops.resident_bt import resident_bt_records

        interp = jax.default_backend() not in ("tpu", "axon")
        dt = x0.dtype
        n_pad = -(-n // 128) * 128
        t_np = np.zeros((n_pad, n_pad))
        for i in range(k):
            t_np[i, i] = 2.0
            if i + 1 < k:
                t_np[i, i + 1] = t_np[i + 1, i] = -1.0
        q_mat = jnp.asarray(lip / 4 * t_np, dt)
        q_vec = jnp.zeros(n_pad, dt).at[0].set(-lip / 4)
        x0_pad = jnp.zeros(n_pad, dt)

        # TWO launches for all six rows: the rule menu as one dynamic-rule
        # sweep, the two backtracking rows as one dynamic-nesterov sweep
        from adaprox_tpu.ops.resident import resident_rule_sweep, rule_rows
        from adaprox_tpu.ops.resident_bt import resident_bt_sweep

        from .common import sync_wall

        skw = dict(prox_kind="zero", obj_kind="cubic", cube_c=0.0,
                   interpret=interp)
        bt_rows = np.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
        (xb, itb, _, _, _, bt_hists), bt_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_bt_sweep, q_mat, q_vec, x0_pad, bt_rows, tol,
                maxit, **skw))

        specs = [(1 / lip, "fixed", False), (1 / lip, "fixed", True),
                 (1 / lip, "mm", False), (1 / lip, "adapgm", False)]
        (xr, itr, _, _, rule_hists), rule_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_rule_sweep, q_mat, q_vec, x0_pad,
                rule_rows(specs, tol=tol, maxit=maxit), tol, maxit, **skw))

        rule_names = ["Fixed stepsize PGM", "Fixed Nesterov", "AdaPGM (MM)",
                      "AdaPGM"]
        bt_names = ["Backtracking PG", "Backtracking Nesterov"]

        def add_rule_row(j):
            recs = resident_records(
                itr[j], *(h[j] for h in rule_hists), maxit=maxit,
                momentum=(j == 1))
            sink.add(SimpleNamespace(records=recs, name=rule_names[j],
                                     x=xr[j]))

        add_rule_row(0)
        sink.add(SimpleNamespace(records=resident_bt_records(
            itb[0], *(h[0] for h in bt_hists), maxit=maxit),
            name=bt_names[0], x=xb[0]))
        add_rule_row(1)
        sink.add(SimpleNamespace(records=resident_bt_records(
            itb[1], *(h[1] for h in bt_hists), maxit=maxit, nesterov=True),
            name=bt_names[1], x=xb[1]))
        add_rule_row(2)
        add_rule_row(3)

        for name in bt_names:
            times[name] = round(bt_wall / 2, 4)
        for name in rule_names:
            times[name] = round(rule_wall / 4, 4)
        sink.emit_meta(grid_total_s={"bt sweep": round(bt_wall, 4),
                                     "rule sweep": round(rule_wall, 4)})
        if live:
            print("  [live] resident kernels echo post-hoc; --live "
                  "applies to the engine path only")
        sink.emit_meta(wall_s=times, fast_path="resident",
                       fast_methods=sorted(times))
        return optimum

    base = dict(f=f, g=g, tol=tol)
    menu = [
        ("Fixed stepsize PGM", maxit, lambda **o: ap.fixed_proxgrad(
            x0, gamma=1 / lip, name="Fixed stepsize PGM", **base, **o)),
        ("Backtracking PG", maxit, lambda **o: ap.backtracking_proxgrad(
            x0, gamma0=1.0, name="Backtracking PG", **base, **o)),
        ("Fixed Nesterov", maxit, lambda **o: ap.fixed_nesterov(
            x0, gamma=1 / lip, name="Fixed Nesterov", **base, **o)),
        ("Backtracking Nesterov", maxit,
         lambda **o: ap.backtracking_nesterov(
             x0, gamma0=1.0, name="Backtracking Nesterov", **base, **o)),
        ("AdaPGM (MM)", maxit, lambda **o: ap.adaptive_proxgrad(
            x0, rule=ap.MalitskyMishchenkoRule(gamma=1 / lip),
            name="AdaPGM (MM)", **base, **o)),
        ("AdaPGM", maxit, lambda **o: ap.adaptive_proxgrad(
            x0, rule=ap.AdaPGMRule(gamma=1 / lip), name="AdaPGM",
            **base, **o)),
    ]
    menu_path = run_menu(sink, times, menu, live=live,
                         objective=lambda x: f.value(x) + g(x))
    sink.emit_meta(wall_s=times, fast_path=menu_path, fast_methods=[])
    return optimum


def plot_convergence(path):
    from ..utils.logging import read_jsonl

    rows = read_jsonl(path)
    optimum = min(r["objective"] for r in rows if "objective" in r)
    groups = group_rows(rows)
    series = [
        (name, [r["grad_f_evals"] for r in rs], [r["objective"] - optimum for r in rs])
        for name, rs in groups.items()
    ]
    return plot_lines(path, series, "Nesterov's worst case",
                      "grad f evaluations", "F(x_k) - F*")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="results/nesterov_worst_case")
    p.add_argument("--maxit", type=int, default=10_000)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--L", type=float, default=100.0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="f64 on the accelerator (reference-regime parity)")
    p.add_argument("--resident", action="store_true",
                   help="whole-solve VMEM-resident kernels (dense worst-case"
                        " quadratic as the c=0 cubic model)")
    p.add_argument("--live", action="store_true",
                   help="early-exit solves with in-flight log-spaced echo")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    path = os.path.join(args.outdir, "nesterov_worst_case.jsonl")
    sink = Sink(path)
    opt = run_nesterov_worst_case(sink, k=args.k, n=args.n, lip=args.L,
                                  tol=args.tol, maxit=args.maxit,
                                  resident=args.resident, live=args.live)
    print(f"{path}: optimum={opt:.8f}")
    if not args.no_plot:
        plot_convergence(path)


if __name__ == "__main__":
    main()
