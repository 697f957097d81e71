"""Square-root lasso experiment (experiments/square_root_lasso/runme.jl).

Fully nonsmooth composite: f = 0, g = lambda*||.||_1,
h = Translate(NormL2, -y) i.e. ||A x - y||_2, A = [X 1] dense
(runme.jl:37-42). Condat-Vu + Malitsky-Pock(t) + AdaPDM+(t, eta=||A||) over
15 t-values (runme.jl:48); datasets cpusmall_scale / abalone /
housing_scale, lambda = 10, maxit 5000, tol 1e-5; cost metric =
A_evals + At_evals; logs [method, norm_res, A_evals, At_evals].
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .common import (Sink, group_rows, live_menu, pad_tiles, pick_platform,
                     plot_lines, run_timed)

T_VALUES = [0.01, 0.15, 0.02, 0.025, 0.05, 0.1, 0.2, 0.5, 1, 2, 5, 10, 20, 50, 100]
KEYS = ["method", "norm_res", "A_evals", "At_evals"]


def _load(name_or_path):
    from adaprox_tpu.utils.datasets import load_or_synthesize
    from adaprox_tpu.utils.libsvm import load_libsvm_dataset

    if os.path.isfile(str(name_or_path)):
        x_np, y_np = load_libsvm_dataset(name_or_path)
        return x_np, y_np, "libsvm"
    return load_or_synthesize(str(name_or_path))


def make_h(inner_cls, y):
    """h = Translate(inner, -y): ||Ax - y|| in the chosen norm."""
    import jax.numpy as jnp

    import adaprox_tpu as ap

    inner = inner_cls(lam=1.0)
    return ap.Translate(inner=inner, b=-jnp.asarray(y))


def run_composite(name_or_path, sink, inner_cls, lam=10.0, tol=1e-5, maxit=5000,
                  vmap_sweep=False, fused=False, resident=False, live=False):
    import jax
    import jax.numpy as jnp

    import adaprox_tpu as ap

    x_np, y_np, source = _load(name_or_path)
    m, n = x_np.shape

    f = ap.ZeroSmooth()
    g = ap.L1Norm(lam=float(lam))
    h = make_h(inner_cls, y_np)
    a_mat = jnp.asarray(np.hstack([x_np, np.ones((m, 1))]))
    a_op = ap.DenseOperator(a=a_mat)
    norm_a = float(np.linalg.norm(np.asarray(a_mat)))

    x0 = jnp.zeros(n + 1)
    y0 = jnp.zeros(m)
    times = {}

    # whole-solve resident path: A and A' VMEM-resident, the MP coupling
    # sweep as ONE kernel launch, Condat-Vu as another (padding to tile
    # alignment is exact for this f = 0 translate family — zero-padded
    # dual/primal coordinates stay exactly 0, tests/test_kernels.py)
    use_resident = False
    if resident:
        import functools
        from types import SimpleNamespace

        from adaprox_tpu.ops.resident import (
            _VMEM_BYTES, resident_adapdmp_records, resident_adapdmp_sweep,
            resident_condat_vu, resident_cv_records, resident_mp_records,
            resident_mpls_sweep)
        from adaprox_tpu.parallel.sweep import maybe_sharded_sweep

        a_dev = jnp.asarray(a_mat)
        a_pad, bv_pad = pad_tiles(a_dev, jnp.asarray(y_np, a_dev.dtype),
                                  m_mult=128, n_mult=128)
        # _VMEM_BYTES is the PER-LAYOUT budget (resident_supported checks
        # one layout; both fit in the kernel's ~110 MB scoped limit)
        if a_pad.size * a_pad.dtype.itemsize <= _VMEM_BYTES:
            use_resident = True
            h_kind = "l1" if inner_cls is ap.L1Norm else "l2"
            interp = jax.default_backend() not in ("tpu", "axon")

            def cv_solve():
                return resident_condat_vu(
                    a_pad, bv_pad, float(lam), 1.0 / norm_a, 0.99 / norm_a,
                    tol, maxit, record=True, h_kind=h_kind, interpret=interp)

            xcv, numit_cv, _, _, cv_hists = run_timed(
                times, "Condat-Vu", cv_solve)
            sink.add(SimpleNamespace(
                records=resident_cv_records(
                    numit_cv, 1.0 / norm_a, 0.99 / norm_a, cv_hists,
                    maxit=maxit),
                name="Condat-Vu"), primal_dual=True)

            # the t-sweeps shard their t axis over the mesh when >1 device
            # is present (parallel/sweep.py) — single-chip: direct launch
            def mp_solve():
                fn = functools.partial(
                    resident_mpls_sweep, lam=float(lam), sigma0=1.0,
                    tol=tol, maxit=maxit, record=True, h_kind=h_kind,
                    interpret=interp)
                return maybe_sharded_sweep(
                    fn, {"a": a_pad, "bv": bv_pad,
                         "ts": jnp.asarray(T_VALUES, a_dev.dtype)}, {"ts"})

            xs, numits, _, _, _, mp_hists = run_timed(
                times, "Malitsky-Pock t-sweep", mp_solve)
            for i, t in enumerate(T_VALUES):
                sink.add(SimpleNamespace(
                    records=resident_mp_records(
                        numits[i], tuple(hh[i] for hh in mp_hists),
                        maxit=maxit),
                    name=f"Malitsky-Pock (t={t})"), primal_dual=True)

            def pdmp_solve():
                fn = functools.partial(
                    resident_adapdmp_sweep, lam=float(lam), eta0=norm_a,
                    tol=tol, maxit=maxit, record=True, h_kind=h_kind,
                    interpret=interp)
                return maybe_sharded_sweep(
                    fn, {"a": a_pad, "bv": bv_pad,
                         "ts": jnp.asarray(T_VALUES, a_dev.dtype)}, {"ts"})

            _, numits_p, _, _, _, pdmp_hists = run_timed(
                times, "AdaPDM+ t-sweep", pdmp_solve)
            for i, t in enumerate(T_VALUES):
                sink.add(SimpleNamespace(
                    records=resident_adapdmp_records(
                        numits_p[i], tuple(hh[i] for hh in pdmp_hists),
                        maxit=maxit),
                    name=f"AdaPDM+ (t={t})"), primal_dual=True)
        else:
            print(f"  [resident] {tuple(a_pad.shape)} exceeds the VMEM "
                  "budget; falling back to the engine")

    if live and (use_resident or fused or vmap_sweep):
        # precedence: the batched fast paths win (consistent across
        # drivers) — live chunking is a per-solve mode
        print("  [live] --live applies to the sequential engine path; "
              "running the requested fast path without in-flight echo")
    if live and not use_resident and not fused and not vmap_sweep:
        # reference-style in-flight echo (PD schema): CV + both t-sweeps as
        # early-exit solves; gamma/sigma coupled via t where the carry
        # lacks one (MP carries sigma, AdaPDM+ carries gamma)
        def obj(x):
            return g(x) + h(a_op.matvec(x))

        live_menu(sink, times, [
            ("Condat-Vu", maxit, lambda **o: ap.condat_vu(
                x0, y0, f=f, g=g, h=h, A=a_op, Lf=0.0, norm_A=norm_a,
                tol=tol, name="Condat-Vu", **o)),
        ] + [
            (f"Malitsky-Pock (t={t})", maxit,
             lambda t=t, **o: ap.malitsky_pock(
                 x0, y0, f=f, g=g, h=h, A=a_op, sigma=1.0, t=t, tol=tol,
                 name=f"Malitsky-Pock (t={t})", **o),
             lambda row, res, t=t: {**row, "gamma": t * t * row["sigma"]})
            for t in T_VALUES
        ] + [
            (f"AdaPDM+ (t={t})", maxit,
             lambda t=t, **o: ap.adaptive_linesearch_primal_dual(
                 x0, y0, f=f, g=g, h=h, A=a_op, eta=norm_a, t=t, tol=tol,
                 name=f"AdaPDM+ (t={t})", **o),
             lambda row, res, t=t: {**row, "sigma": t * t * row["gamma"]})
            for t in T_VALUES
        ], objective=obj, primal_dual=True)
        sink.emit_meta(wall_s=times, fast_path="live", fast_methods=[])
        return source

    if use_resident:
        pass  # Condat-Vu row already written by the resident kernel
    elif fused:
        # one-pass fused PD kernel (VERDICT r2 items 3+8): the LIBSVM shape
        # auto-pads with the exact PadTail correction; A' is materialized
        # once so repeated calls skip the per-call transpose
        at_mat = a_mat.T
        sink.add(run_timed(times, "Condat-Vu", lambda: ap.fused_condat_vu(
            x0, y0, f=f, g=g, h=h, A=a_mat, at=at_mat, Lf=0.0, norm_A=norm_a,
            tol=tol, maxit=maxit, history=True, name="Condat-Vu",
        )), primal_dual=True)
    else:
        sink.add(run_timed(times, "Condat-Vu", lambda: ap.condat_vu(
            x0, y0, f=f, g=g, h=h, A=a_op, Lf=0.0, norm_A=norm_a,
            tol=tol, maxit=maxit, history=True, name="Condat-Vu",
        )), primal_dual=True)

    import time as _time

    def add_sweep(fam, solve_t):
        """Run the t grid either sequentially (reference structure,
        square_root_lasso/runme.jl:48,80-95) or as ONE vmapped kernel over
        the coupling t — nested linesearch while_loop and all."""
        t0 = _time.perf_counter()
        if vmap_sweep:
            batched = jax.vmap(solve_t)(jnp.asarray(T_VALUES))
            for i, t in enumerate(T_VALUES):
                one = jax.tree_util.tree_map(lambda arr: arr[i], batched)
                sink.add(one.with_name(f"{fam} (t={t})"), primal_dual=True)
        else:
            for t in T_VALUES:
                res = solve_t(float(t))
                sink.add(res.with_name(f"{fam} (t={t})"), primal_dual=True)
        times[f"{fam} t-sweep"] = round(_time.perf_counter() - t0, 4)

    def solve_mp(t):
        res = ap.malitsky_pock(
            x0, y0, f=f, g=g, h=h, A=a_op, sigma=1.0, t=t,
            tol=tol, maxit=maxit, history=True,
        )
        return res._replace(name=None, extra=None, diag=None)

    def solve_pdmp(t):
        res = ap.adaptive_linesearch_primal_dual(
            x0, y0, f=f, g=g, h=h, A=a_op, eta=norm_a, t=t,
            tol=tol, maxit=maxit, history=True,
        )
        return res._replace(name=None, extra=None, diag=None)

    if not use_resident:
        add_sweep("Malitsky-Pock", solve_mp)
        add_sweep("AdaPDM+", solve_pdmp)
    sink.emit_meta(
        wall_s=times,
        fast_path=("resident" if use_resident else
                   "fused" if fused else
                   "vmap" if vmap_sweep else "default"),
        fast_methods=(["Condat-Vu", "Malitsky-Pock t-sweep",
                       "AdaPDM+ t-sweep"]
                      if use_resident else
                      ["Condat-Vu"] if fused else
                      ["Malitsky-Pock t-sweep", "AdaPDM+ t-sweep"]
                      if vmap_sweep else []))
    return source


def run_composite_grid(datasets, outdir, inner_cls, lam=10.0, tol=1e-5,
                       maxit=5000):
    """The ENTIRE multi-dataset experiment as one (dataset x t) grid launch
    per solver family (ops.resident._f0_grid): datasets zero-padded to a
    common tile shape (exact for the f = 0 translate family), one compile
    for the common shape instead of one per dataset, one launch per family
    instead of one per (dataset, family). Condat-Vu stays one resident
    launch per dataset (a single solve each). Per-file ``wall_s`` carries
    the amortized share (total/D) plus the grid total in
    ``grid_total_s``."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.ops.resident import (
        _VMEM_BYTES, resident_adapdmp_grid, resident_adapdmp_records,
        resident_cv_grid, resident_cv_records, resident_mp_records,
        resident_mpls_grid)

    h_kind = "l1" if inner_cls is ap.L1Norm else "l2"
    interp = jax.default_backend() not in ("tpu", "axon")
    loaded = []
    m_max = n_max = 0
    for ds in datasets:
        x_np, y_np, source = _load(ds)
        m, n = x_np.shape
        a_np = np.hstack([x_np, np.ones((m, 1))])
        loaded.append((os.path.basename(str(ds)), a_np, y_np, source))
        m_max = max(m_max, -(-m // 128) * 128)
        n_max = max(n_max, -(-(n + 1) // 128) * 128)
    if m_max * n_max * jnp.asarray(0.0).dtype.itemsize > _VMEM_BYTES:
        raise ValueError(
            f"common padded shape ({m_max}, {n_max}) exceeds the resident "
            "VMEM budget; run per-dataset --resident instead")
    dcount = len(loaded)
    dt = jnp.asarray(0.0).dtype  # ambient float dtype (f64 under --cpu/--f64)
    a_stack = np.zeros((dcount, m_max, n_max))
    bv_stack = np.zeros((dcount, m_max))
    norm_as = []
    for i, (_, a_np, y_np, _) in enumerate(loaded):
        a_stack[i, :a_np.shape[0], :a_np.shape[1]] = a_np
        bv_stack[i, :y_np.shape[0]] = y_np
        norm_as.append(float(np.linalg.norm(a_np)))
    a_stack = jnp.asarray(a_stack, dt)
    bv_stack = jnp.asarray(bv_stack, dt)
    lams = jnp.full((dcount,), float(lam), dt)
    ts = jnp.asarray(T_VALUES, dt)

    from .common import sync_wall as timed

    # sweep-axis parallelism (parallel/sweep.py): the CV grid shards its
    # dataset axis, the (dataset x t) grids shard the t axis (out_axis=1 —
    # every output is (D, T, ...)); direct launches on a single device.
    import functools

    from adaprox_tpu.parallel.sweep import maybe_sharded_sweep

    cv_fn = functools.partial(resident_cv_grid, tol=tol, maxit=maxit,
                              h_kind=h_kind, interpret=interp)
    cv_arrays = dict(a_stack=a_stack, bv_stack=bv_stack, lams=lams,
                     gammas=jnp.asarray([1.0 / na for na in norm_as], dt),
                     sigmas=jnp.asarray([0.99 / na for na in norm_as], dt))
    cv_out, cv_wall = timed(lambda: maybe_sharded_sweep(
        cv_fn, cv_arrays, set(cv_arrays)))

    mp_fn = functools.partial(resident_mpls_grid, tol=tol, maxit=maxit,
                              record=True, h_kind=h_kind, interpret=interp)
    mp_out, mp_wall = timed(lambda: maybe_sharded_sweep(
        mp_fn, dict(a_stack=a_stack, bv_stack=bv_stack, lams=lams, ts=ts,
                    sigma0s=jnp.ones((dcount,), dt)), {"ts"}, out_axis=1))
    pd_fn = functools.partial(resident_adapdmp_grid, tol=tol, maxit=maxit,
                              record=True, h_kind=h_kind, interpret=interp)
    pd_out, pd_wall = timed(lambda: maybe_sharded_sweep(
        pd_fn, dict(a_stack=a_stack, bv_stack=bv_stack, lams=lams, ts=ts,
                    eta0s=jnp.asarray(norm_as, dt)), {"ts"}, out_axis=1))

    for i, (name, _, _, source) in enumerate(loaded):
        path = os.path.join(outdir, f"{name}.jsonl")
        sink = Sink(path, keys=KEYS)
        sink.add(SimpleNamespace(
            records=resident_cv_records(
                cv_out[1][i], 1.0 / norm_as[i], 0.99 / norm_as[i],
                tuple(h[i] for h in cv_out[4]), maxit=maxit),
            name="Condat-Vu"), primal_dual=True)
        _, numits, _, _, _, mp_hists = mp_out
        for j, t in enumerate(T_VALUES):
            sink.add(SimpleNamespace(
                records=resident_mp_records(
                    numits[i][j], tuple(hh[i][j] for hh in mp_hists),
                    maxit=maxit),
                name=f"Malitsky-Pock (t={t})"), primal_dual=True)
        _, numits_p, _, _, _, pd_hists = pd_out
        for j, t in enumerate(T_VALUES):
            sink.add(SimpleNamespace(
                records=resident_adapdmp_records(
                    numits_p[i][j], tuple(hh[i][j] for hh in pd_hists),
                    maxit=maxit),
                name=f"AdaPDM+ (t={t})"), primal_dual=True)
        sink.emit_meta(
            wall_s={"Condat-Vu": round(cv_wall / dcount, 4),
                    "Malitsky-Pock t-sweep": round(mp_wall / dcount, 4),
                    "AdaPDM+ t-sweep": round(pd_wall / dcount, 4)},
            fast_path="resident-grid",
            grid_total_s={"Condat-Vu": round(cv_wall, 4),
                          "Malitsky-Pock t-sweep": round(mp_wall, 4),
                          "AdaPDM+ t-sweep": round(pd_wall, 4)},
            fast_methods=["Condat-Vu", "Malitsky-Pock t-sweep",
                          "AdaPDM+ t-sweep"])
        sink.emit_meta(data_source=source)
        print(f"{path}: data={source} (grid-batched)")


def plot_residual(path, title_prefix="Square root lasso"):
    from ..utils.logging import find_best, read_jsonl

    rows = read_jsonl(path)
    groups = group_rows(rows)
    names_to_plot = []
    for fam in ["Condat-Vu", "Malitsky-Pock", "AdaPDM+"]:
        matching = [k for k in groups if k.startswith(fam)]
        if matching:
            names_to_plot.append(find_best(
                groups, matching, "norm_res", 1e-5,
                lambda row: row["A_evals"] + row["At_evals"],
            ))
    series = [
        (name, [r["A_evals"] + r["At_evals"] for r in groups[name]],
         [r["norm_res"] for r in groups[name]])
        for name in names_to_plot
    ]
    return plot_lines(path, series, f"{title_prefix} ({os.path.basename(path)})",
                      "#calls to A, A'", "||v||")


def main(argv=None, inner="l2", default_outdir="results/square_root_lasso"):
    import adaprox_tpu as ap

    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default=default_outdir)
    p.add_argument("--maxit", type=int, default=5000)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--lam", type=float, default=10.0)
    p.add_argument("--datasets", default="cpusmall_scale,abalone,housing_scale")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="f64 on the accelerator (reference-regime parity)")
    p.add_argument("--vmap-sweep", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="Condat-Vu on the one-pass fused PD kernel "
                        "(auto-pads LIBSVM shapes)")
    p.add_argument("--resident", action="store_true",
                   help="whole-solve VMEM-resident kernels: on-core "
                        "Condat-Vu and the Malitsky-Pock t-sweep as one "
                        "kernel launch each")
    p.add_argument("--resident-grid", action="store_true",
                   help="the ENTIRE multi-dataset grid as one (dataset x t)"
                        " kernel launch per solver family")
    p.add_argument("--live", action="store_true",
                   help="early-exit solves with in-flight log-spaced echo")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args(argv)
    pick_platform(args.cpu, x64=args.f64)

    inner_cls = ap.L2Norm if inner == "l2" else ap.L1Norm
    title = "Square root lasso" if inner == "l2" else "Least absolute deviation"
    if args.resident_grid:
        datasets = args.datasets.split(",")
        run_composite_grid(datasets, args.outdir, inner_cls, lam=args.lam,
                           tol=args.tol, maxit=args.maxit)
        if not args.no_plot:
            for ds in datasets:
                plot_residual(os.path.join(
                    args.outdir, f"{os.path.basename(ds)}.jsonl"), title)
        return
    for ds in args.datasets.split(","):
        path = os.path.join(args.outdir, f"{os.path.basename(ds)}.jsonl")
        sink = Sink(path, keys=KEYS)
        src = run_composite(ds, sink, inner_cls, lam=args.lam, tol=args.tol,
                            maxit=args.maxit, vmap_sweep=args.vmap_sweep,
                            fused=args.fused, resident=args.resident,
                            live=args.live)
        sink.emit_meta(data_source=src)
        print(f"{path}: data={src}")
        if not args.no_plot:
            plot_residual(path, title)


if __name__ == "__main__":
    main()
