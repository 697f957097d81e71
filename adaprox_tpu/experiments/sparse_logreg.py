"""Sparse logistic regression experiment (experiments/sparse_logreg/runme.jl).

f = mean logistic loss with bias folded in, g = 0.01 * ||.||_1;
Lf = ||X1 X1'|| / (4 m) with X1 = [X 1] (runme.jl:58-59); ground truth via a
high-accuracy AdaPGM pre-run at tol/10, maxit*10 (runme.jl:64-73); datasets
mushrooms / a5a / phishing, maxit 2000, tol 1e-7 (backtracking/Nesterov get
maxit/2, runme.jl:94,105). Plot: F - F* vs (grad_f_evals + f_evals).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from types import SimpleNamespace

from .common import (Sink, group_rows, pad_tiles, pick_platform, plot_lines, run_menu,
                     route_menu_sweep, run_timed)


def run_logreg_l1_data(name_or_path, sink, lam=0.01, tol=1e-7, maxit=2000, dtype=None, live=False,
                       spectral_lf=False, resident=False):
    import jax
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LogisticLoss
    from adaprox_tpu.utils.datasets import load_or_synthesize
    from adaprox_tpu.utils.libsvm import load_libsvm_dataset

    if os.path.isfile(str(name_or_path)):
        x_np, y_np = load_libsvm_dataset(name_or_path, labels=(0.0, 1.0))
        source = "libsvm"
    else:
        x_np, y_np, source = load_or_synthesize(str(name_or_path), labels=(0.0, 1.0))
    m, n_feat = x_np.shape
    n = n_feat + 1

    x_mat = jnp.asarray(x_np, dtype) if dtype else jnp.asarray(x_np)
    y = jnp.asarray(y_np, x_mat.dtype)
    f = LogisticLoss(x=x_mat, y=y)
    g = ap.L1Norm(lam=jnp.asarray(lam, x_mat.dtype))

    # Lf = norm(X1*X1') / 4m (runme.jl:58-59) where Julia's matrix `norm` is
    # the FROBENIUS norm of the Gram — computed gram-free via the n x n
    # Gram: ||X1 X1'||_F = ||X1' X1||_F (both are sqrt(sum sigma_i^4)), so
    # one (n, m) @ (m, n) product instead of the m x m Gram. This is a loose
    # upper bound on the spectral Lipschitz constant, but it is what the
    # reference seeds every solver with — gamma_init parity requires it.
    # ``spectral_lf=True`` keeps the tighter ||X1||_2^2 / 4m variant.
    x1 = np.hstack([x_np, np.ones((m, 1))])
    if spectral_lf:
        lf = float(np.linalg.norm(x1, 2) ** 2 / (4 * m))
    else:
        lf = float(np.linalg.norm(x1.T @ x1) / (4 * m))
    gam = 1.0 / lf
    x0 = jnp.zeros(n, x_mat.dtype)
    times = {}

    def add(name, fn):
        sink.add(run_timed(times, name or "(ground truth)", fn))

    # whole-solve VMEM-resident path (VERDICT r2 item 3): the bias folds as
    # a ones-column of a zero-row/col-padded [X 1] with the exact
    # -log(2)-per-pad-row mean correction (ops.resident m_true semantics;
    # record-mode parity tested in tests/test_kernels.py)
    from adaprox_tpu.ops.resident import (
        resident_records, resident_supported)
    from adaprox_tpu.ops.resident_bt import (
        resident_agraal, resident_agraal_records, resident_bt_records)

    use_resident = False
    menu_path = "default"
    if resident:  # pad + ship [X 1] only when the fast path is requested
        x1_dev = jnp.asarray(x1, x_mat.dtype)
        x1_pad, y_pad = pad_tiles(x1_dev, y)
        use_resident = resident_supported(x1_pad)
        if not use_resident:
            print(f"  [resident] unsupported shape/size {tuple(x1_pad.shape)} "
                  f"({x1_pad.dtype}); falling back to the engine")
    if live and use_resident:
        print("  [live] resident kernels echo post-hoc; --live applies "
              "to the engine path only")
    interp = jax.default_backend() not in ("tpu", "axon")

    # high-accuracy ground-truth run, logged with method=None so plotting
    # uses it only through the min-objective (runme.jl:64-73)
    if use_resident:
        # THREE launches for all ten rows (cf. lasso.py): the rule menu —
        # incl. the tol/10 maxit*10 ground truth and the half-budget fixed
        # Nesterov via per-row caps — as one dynamic-rule sweep, the four
        # backtracking rows (half budget) as one sweep, and aGRAAL
        from adaprox_tpu.ops.resident import resident_rule_sweep, rule_rows
        from adaprox_tpu.ops.resident_bt import resident_bt_sweep

        from .common import sync_wall

        x0p = jnp.zeros(x1_pad.shape[1], x_mat.dtype)
        lkw = dict(prox_kind="l1", p1=float(lam), obj_kind="logreg",
                   m_true=float(m), interpret=interp)

        half_it = maxit // 2
        bt_rows = np.asarray([[gam, 1.0, 0.0], [gam, 1.5, 0.0],
                              [gam, 2.0, 0.0], [gam, 1.0, 1.0]])
        (xb, itb, _, _, _, bt_hists), bt_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_bt_sweep, x1_pad, y_pad, x0p, bt_rows, tol,
                half_it, **lkw))

        specs = [(gam, "adapgm", False, tol / 10, maxit * 10),
                 (gam, "fixed", False, tol, maxit),
                 (gam, "fixed", True, tol, half_it),
                 (gam, "mm", False, tol, maxit),
                 (gam, "adapgm", False, tol, maxit)]
        caps = [maxit * 10, maxit, half_it, maxit, maxit]
        (xr, itr, _, _, rule_hists), rule_wall = sync_wall(
            lambda: route_menu_sweep(
                resident_rule_sweep, x1_pad, y_pad, x0p, rule_rows(specs),
                tol, maxit * 10, **lkw))

        noise = jax.random.normal(jax.random.PRNGKey(0), (n,), x_mat.dtype)
        x0n = x0p.at[:n].add(noise)
        (xa, ita, nra, conva, hga, hra, hoa), ag_wall = sync_wall(
            lambda: resident_agraal(
                x1_pad, y_pad, x0p, x0n, gam, tol, maxit, record=True,
                **lkw))

        rule_names = [None, "PGM (1/Lf)", "Nesterov (fixed)", "AdaPGM (MM)",
                      "AdaPGM (Ours)"]

        def add_rule_row(j):
            name = rule_names[j]
            recs = resident_records(
                itr[j], *(h[j][:caps[j]] for h in rule_hists),
                maxit=caps[j], momentum=(name == "Nesterov (fixed)"))
            sink.add(SimpleNamespace(records=recs, name=name, x=xr[j]))

        add_rule_row(0)  # ground truth
        add_rule_row(1)
        bt_names = [f"PGM (backtracking)-(xi={xi})" for xi in (1.0, 1.5, 2.0)] \
            + ["Nesterov (backtracking)"]
        for j, name in enumerate(bt_names):
            sink.add(SimpleNamespace(records=resident_bt_records(
                itb[j], *(h[j] for h in bt_hists), maxit=half_it,
                nesterov=(j == 3)), name=name, x=xb[j]))
        for j in (2, 3, 4):
            add_rule_row(j)
        sink.add(SimpleNamespace(records=resident_agraal_records(
            ita, hga, hra, hoa, maxit=maxit), name="aGRAAL", x=xa))

        for name in bt_names:
            times[name] = round(bt_wall / 4, 4)
        for name in rule_names:
            times[name or "(ground truth)"] = round(rule_wall / 5, 4)
        times["aGRAAL"] = round(ag_wall, 4)
        sink.emit_meta(grid_total_s={"bt sweep": round(bt_wall, 4),
                                     "rule sweep": round(rule_wall, 4)})
    else:
        # ground-truth prerun (tol/10) always runs history mode: it feeds
        # the optimum pseudo-record the plots normalize against
        add(None, lambda: ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=gam), tol=tol / 10,
            maxit=maxit * 10, history=True, name=None))
        base = dict(f=f, g=g, tol=tol)
        menu = [
            ("PGM (1/Lf)", maxit, lambda **o: ap.fixed_proxgrad(
                x0, gamma=gam, name="PGM (1/Lf)", **base, **o)),
        ] + [
            (f"PGM (backtracking)-(xi={xi})", maxit // 2,
             lambda xi=xi, **o: ap.backtracking_proxgrad(
                 x0, gamma0=gam, xi=xi,
                 name=f"PGM (backtracking)-(xi={xi})", **base, **o))
            for xi in (1.0, 1.5, 2.0)
        ] + [
            ("Nesterov (backtracking)", maxit // 2,
             lambda **o: ap.backtracking_nesterov(
                 x0, gamma0=gam, name="Nesterov (backtracking)", **base,
                 **o)),
            ("Nesterov (fixed)", maxit // 2, lambda **o: ap.fixed_nesterov(
                x0, gamma=gam, name="Nesterov (fixed)", **base, **o)),
            ("AdaPGM (MM)", maxit, lambda **o: ap.adaptive_proxgrad(
                x0, rule=ap.MalitskyMishchenkoRule(gamma=gam),
                name="AdaPGM (MM)", **base, **o)),
            ("AdaPGM (Ours)", maxit, lambda **o: ap.adaptive_proxgrad(
                x0, rule=ap.AdaPGMRule(gamma=gam), name="AdaPGM (Ours)",
                **base, **o)),
            ("aGRAAL", maxit, lambda **o: ap.agraal(
                x0, gamma0=gam, name="aGRAAL", **base, **o)),
        ]
        menu_path = run_menu(sink, times, menu, live=live,
                             objective=lambda x: f.value(x) + g(x))
    sink.emit_meta(
        wall_s=times,
        fast_path=("resident" if use_resident else menu_path),
        fast_methods=(sorted(times) if use_resident else []))
    return source


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
    return plot_lines(path, series, f"Logistic regression ({os.path.basename(path)})",
                      "calls to A, A'", "F(x_k) - F*")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="results/sparse_logreg")
    p.add_argument("--maxit", type=int, default=2000)
    p.add_argument("--tol", type=float, default=1e-7)
    p.add_argument("--lam", type=float, default=0.01)
    p.add_argument("--datasets", default="mushrooms,a5a,phishing")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="f64 on the accelerator (reference-regime parity)")
    p.add_argument("--spectral-lf", action="store_true",
                   help="tighter ||X1||_2^2/4m instead of the reference's "
                        "Frobenius norm(X1*X1')/4m (runme.jl:58-59)")
    p.add_argument("--resident", action="store_true",
                   help="whole-solve VMEM-resident kernels for the menu "
                        "solvers (incl. the ground-truth prerun)")
    p.add_argument("--live", action="store_true",
                   help="early-exit solves with in-flight log-spaced echo")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    for ds in args.datasets.split(","):
        path = os.path.join(args.outdir, f"{os.path.basename(ds)}.jsonl")
        sink = Sink(path)
        src = run_logreg_l1_data(ds, sink, lam=args.lam, tol=args.tol, maxit=args.maxit, live=args.live,
                                 spectral_lf=args.spectral_lf, resident=args.resident)
        sink.emit_meta(data_source=src)
        print(f"{path}: data={src}")
        if not args.no_plot:
            plot_convergence(path)


if __name__ == "__main__":
    main()
