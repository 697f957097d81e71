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

from .common import Sink, group_rows, pad_tiles, pick_platform, plot_lines, run_timed


def run_logreg_l1_data(name_or_path, sink, lam=0.01, tol=1e-7, maxit=2000, dtype=None,
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
    kw = dict(f=f, g=g, tol=tol, maxit=maxit, history=True)
    half = dict(f=f, g=g, tol=tol, maxit=maxit // 2, history=True)
    times = {}

    def add(name, fn):
        sink.add(run_timed(times, name or "(ground truth)", fn))

    # whole-solve VMEM-resident path (VERDICT r2 item 3): the bias folds as
    # a ones-column of a zero-row/col-padded [X 1] with the exact
    # -log(2)-per-pad-row mean correction (ops.resident m_true semantics;
    # record-mode parity tested in tests/test_kernels.py)
    from adaprox_tpu.ops.resident import (
        resident_logreg_l1, resident_records, resident_supported)
    from adaprox_tpu.ops.resident_bt import (
        resident_agraal, resident_agraal_records, resident_backtracking,
        resident_bt_records)

    use_resident = False
    if resident:  # pad + ship [X 1] only when the fast path is requested
        x1_dev = jnp.asarray(x1, x_mat.dtype)
        x1_pad, y_pad = pad_tiles(x1_dev, y)
        use_resident = resident_supported(x1_pad)
        if not use_resident:
            print(f"  [resident] unsupported shape/size {tuple(x1_pad.shape)} "
                  f"({x1_pad.dtype}); falling back to the engine")
    interp = jax.default_backend() not in ("tpu", "axon")

    def add_resident(name, rule_kind, momentum=False, r_tol=tol, r_maxit=maxit):
        x0p = jnp.zeros(x1_pad.shape[1], x_mat.dtype)

        def solve():
            x, numit, nres, conv, hg, hr, ho = resident_logreg_l1(
                x1_pad, y_pad, x0p, gam, lam, r_tol, r_maxit, m_true=float(m),
                rule_kind=rule_kind, momentum=momentum, record=True,
                interpret=interp)
            recs = resident_records(numit, hg, hr, ho, maxit=r_maxit,
                                    momentum=momentum)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name or "(ground truth)", solve))

    def add_resident_bt(name, xi=1.0, nesterov=False):
        x0p = jnp.zeros(x1_pad.shape[1], x_mat.dtype)

        def solve():
            x, numit, nres, conv, lsf, hg, hr, ho, ht = \
                resident_backtracking(
                    x1_pad, y_pad, x0p, gam, tol, maxit // 2, xi=xi,
                    nesterov=nesterov, prox_kind="l1", p1=float(lam),
                    obj_kind="logreg", m_true=float(m), record=True,
                    interpret=interp)
            recs = resident_bt_records(numit, hg, hr, ho, ht,
                                       maxit=maxit // 2, nesterov=nesterov)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name, solve))

    def add_resident_agraal(name):
        # engine default companion: x0 + PRNGKey(0) noise over the UNPADDED
        # coordinates, zero-padded (padded coords then stay exactly 0, so
        # the trajectory matches the unpadded engine row)
        noise = jax.random.normal(jax.random.PRNGKey(0), (n,), x_mat.dtype)
        x1p = jnp.zeros(x1_pad.shape[1], x_mat.dtype)
        x0p = x1p.at[:n].add(noise)

        def solve():
            x, numit, nres, conv, hg, hr, ho = resident_agraal(
                x1_pad, y_pad, x1p, x0p, gam, tol, maxit, prox_kind="l1",
                p1=float(lam), obj_kind="logreg", m_true=float(m),
                record=True, interpret=interp)
            recs = resident_agraal_records(numit, hg, hr, ho, maxit=maxit)
            return SimpleNamespace(records=recs, name=name, x=x)

        sink.add(run_timed(times, name, solve))

    # high-accuracy ground-truth run, logged with method=None so plotting
    # uses it only through the min-objective (runme.jl:64-73)
    if use_resident:
        add_resident(None, "adapgm", r_tol=tol / 10, r_maxit=maxit * 10)
        add_resident("PGM (1/Lf)", "fixed")
        for xi in (1.0, 1.5, 2.0):
            add_resident_bt(f"PGM (backtracking)-(xi={xi})", xi=xi)
        add_resident_bt("Nesterov (backtracking)", nesterov=True)
        add_resident("Nesterov (fixed)", "fixed", momentum=True, r_maxit=maxit // 2)
        add_resident("AdaPGM (MM)", "mm")
        add_resident("AdaPGM (Ours)", "adapgm")
        add_resident_agraal("aGRAAL")
    else:
        add(None, lambda: ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=gam), tol=tol / 10,
            maxit=maxit * 10, history=True, name=None))
        add("PGM (1/Lf)", lambda: ap.fixed_proxgrad(x0, gamma=gam, name="PGM (1/Lf)", **kw))
        for xi in (1.0, 1.5, 2.0):
            add(f"PGM (backtracking)-(xi={xi})",
                lambda xi=xi: ap.backtracking_proxgrad(
                    x0, gamma0=gam, xi=xi, name=f"PGM (backtracking)-(xi={xi})", **half))
        add("Nesterov (backtracking)",
            lambda: ap.backtracking_nesterov(x0, gamma0=gam, name="Nesterov (backtracking)", **half))
        add("Nesterov (fixed)", lambda: ap.fixed_nesterov(
            x0, gamma=gam, name="Nesterov (fixed)", **half))
        add("AdaPGM (MM)", lambda: ap.adaptive_proxgrad(
            x0, rule=ap.MalitskyMishchenkoRule(gamma=gam), name="AdaPGM (MM)", **kw))
        add("AdaPGM (Ours)", lambda: ap.adaptive_proxgrad(
            x0, rule=ap.AdaPGMRule(gamma=gam), name="AdaPGM (Ours)", **kw))
        add("aGRAAL", lambda: ap.agraal(x0, gamma0=gam, name="aGRAAL", **kw))
    sink.emit_meta(
        wall_s=times,
        fast_path=("resident" if use_resident else "default"),
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
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    for ds in args.datasets.split(","):
        path = os.path.join(args.outdir, f"{os.path.basename(ds)}.jsonl")
        sink = Sink(path)
        src = run_logreg_l1_data(ds, sink, lam=args.lam, tol=args.tol, maxit=args.maxit,
                                 spectral_lf=args.spectral_lf, resident=args.resident)
        sink.emit_meta(data_source=src)
        print(f"{path}: data={src}")
        if not args.no_plot:
            plot_convergence(path)


if __name__ == "__main__":
    main()
